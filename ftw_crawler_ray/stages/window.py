"""Event-time windowed aggregates over the ``events`` log.

Ray Data has no event-time window operator; a tumbling window is a
derived window-key column + grouped aggregate (ray_guide
"Streaming-shaped workloads"). Sums are rounded at a fixed precision
so results are exactly comparable across engines regardless of
float-add association order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .util import sized_read_parquet
from ray.data.aggregate import Count, Sum


def hourly_event_stats(sf_dir: str) -> ray.data.Dataset:
    events = sized_read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def add_hour(batch: pa.Table) -> pa.Table:
        hours = batch["ts"].to_numpy().astype("datetime64[h]").astype("datetime64[us]")
        return batch.append_column("hour", pa.array(hours, pa.timestamp("us")))

    agg = (
        events.map_batches(add_hour, batch_format="pyarrow", batch_size=None)
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value_raw"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        rounded = pc.round(batch["sum_value_raw"], ndigits=2)
        return batch.drop(["sum_value_raw"]).append_column("sum_value", rounded)

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def sliding_window_counts(sf_dir: str, size_minutes: int = 60,
                          step_minutes: int = 30) -> ray.data.Dataset:
    """Sliding event-time windows: each event lands in
    ``size/step`` overlapping windows; implemented as a vectorized
    explode (event → window_start keys) + grouped aggregate — the
    standard windowed-aggregate lowering when the engine has no
    native window operator."""
    events = sized_read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    size = np.timedelta64(size_minutes * 60, "s").astype("timedelta64[us]")
    step = np.timedelta64(step_minutes * 60, "s").astype("timedelta64[us]")
    n_windows = size_minutes // step_minutes

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy()
        # anchor window: floor(ts / step) * step
        base = (ts.astype("int64") // step.astype("int64")) * step.astype("int64")
        tables = []
        for i in range(n_windows):
            start = (base - i * step.astype("int64")).astype("datetime64[us]")
            keep = ts < (start + size)
            tables.append(
                pa.table(
                    {
                        "window_start": pa.array(start[keep], pa.timestamp("us")),
                        "event_type": batch["event_type"].filter(pa.array(keep)),
                        "value": batch["value"].filter(pa.array(keep)),
                    }
                )
            )
        return pa.concat_tables(tables)

    agg = (
        events.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value", alias_name="sum_value_raw"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        rounded = pc.round(batch["sum_value_raw"], ndigits=2)
        return batch.drop(["sum_value_raw"]).append_column("sum_value", rounded)

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def sessionize(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows per user: sort within user group by ts, break
    at > gap; emits (user_id, session_id, n_events, start, end).
    Partitioning assumption: one user's events fit one group (true for
    per-user event logs; a hot user would need salting + merge)."""
    events = sized_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(group["ts"].to_numpy())
        user = group["user_id"][0].as_py()
        breaks = np.where(np.diff(ts) > gap)[0]
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [len(ts) - 1]])
        return pa.table(
            {
                "user_id": pa.array([user] * len(starts), pa.int64()),
                "session_id": pa.array(range(len(starts)), pa.int64()),
                "n_events": pa.array((ends - starts + 1).tolist(), pa.int64()),
                "session_start": pa.array(ts[starts], pa.timestamp("us")),
                "session_end": pa.array(ts[ends], pa.timestamp("us")),
            }
        )

    return events.groupby("user_id").map_groups(sessions, batch_format="pyarrow")
