"""Event-time windowed aggregates over the ``events`` log.

Ray Data has no event-time window operator; a tumbling window is a
derived window-key column + grouped aggregate (ray_guide
"Streaming-shaped workloads"). Sums are rounded at a fixed precision
so results are exactly comparable across engines regardless of
float-add association order.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .util import part_space, partitioned_groups, sized_read_parquet


def _keyed_window_agg(exploded: ray.data.Dataset, time_col: str,
                      num_parts: int = 64) -> ray.data.Dataset:
    """(window_time, event_type, value) rows → per-key count + 2dp
    sum, lowered onto the fixed-partition numpy shape.

    NOT ``groupby([time, type]).aggregate(Count, Sum)``: Ray's
    aggregate pays Python time per DISTINCT key, and windowed keys =
    windows × types is unbounded on long event histories (measured
    155.8 s at 1.18M distinct keys / 5M rows; this shape: see
    BASELINE.md). Per batch: dictionary-encode event_type (per-batch
    distinct types are few), 64-bit-hash each dictionary value once,
    lexsort (time, type_hash) + reduceat pre-combine; then one fixed
    ``num_parts`` shuffle of (key, partial) rows and the same C-speed
    reduce per partition. The type STRING rides along only as the
    group representative.

    Sum contract: each value rounds to CENTS first
    (``floor(v*100 + 0.5)`` — the identical float op the SQL oracle
    runs), and the sum is integer-exact, so the result is independent
    of addition order. A float partial-sum-then-round contract is
    inherently flaky across engines: both sides associate adds
    differently and the 2dp rounding flips whenever a true sum sits
    within ulps of a .005 boundary (observed once at sf0.01 across
    6761 windows)."""
    mid = pa.schema(
        [("t", pa.int64()), ("tid", pa.int64()), ("event_type", pa.string()),
         ("n", pa.int64()), ("s", pa.int64()), ("__part", pa.int32())]
    )
    out_schema = pa.schema(
        [(time_col, pa.timestamp("us")), ("event_type", pa.string()),
         ("n_events", pa.int64()), ("sum_value", pa.float64())]
    )

    def _type_hashes(col: pa.ChunkedArray | pa.Array):
        """int64 hash per row via dictionary encode: one blake2b per
        DISTINCT type value, numpy take for the rows."""
        enc = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
               else col).dictionary_encode()
        vals = enc.dictionary.to_pylist()
        hmap = np.array(
            [int.from_bytes(
                hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(),
                "big") - (1 << 63)
             for v in vals], dtype=np.int64,
        )
        idx = enc.indices.to_numpy()
        return hmap[idx], vals, idx

    def _reduce(t, tid, n, s):
        order = np.lexsort((tid, t))
        t, tid, n, s = t[order], tid[order], n[order], s[order]
        starts = np.nonzero(
            np.r_[True, (np.diff(t) != 0) | (np.diff(tid) != 0)]
        )[0]
        return (order, starts, t[starts], tid[starts],
                np.add.reduceat(n, starts), np.add.reduceat(s, starts))

    def precombine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or time_col not in batch.column_names:
            return mid.empty_table()
        t = batch[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        tid, vals, idx = _type_hashes(batch["event_type"])
        v = np.floor(
            batch["value"].to_numpy().astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        order, starts, tk, tidk, nk, sk = _reduce(
            t, tid, np.ones(len(t), np.int64), v
        )
        rep = [vals[i] for i in idx[order[starts]]]
        part = (
            ((tk.astype(np.uint64) * np.uint64(2654435761))
             ^ tidk.astype(np.uint64))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        return pa.table(
            {"t": pa.array(tk, pa.int64()), "tid": pa.array(tidk, pa.int64()),
             "event_type": pa.array(rep, pa.string()),
             "n": pa.array(nk, pa.int64()), "s": pa.array(sk, pa.int64()),
             "__part": pa.array(part, pa.int32())},
            schema=mid,
        )

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "t" not in group.column_names:
            return out_schema.empty_table()
        t = group["t"].to_numpy()
        tid = group["tid"].to_numpy()
        n = group["n"].to_numpy()
        s = group["s"].to_numpy()
        order, starts, tk, _, nk, sk = _reduce(t, tid, n, s)
        rep = group["event_type"].take(pa.array(order[starts], pa.int64()))
        return pa.table(
            {time_col: pa.array(tk.astype("datetime64[us]"),
                                pa.timestamp("us")),
             "event_type": rep.combine_chunks().cast(pa.string()),
             "n_events": pa.array(nk, pa.int64()),
             # integer cents / 100: exact, order-independent
             "sum_value": pa.array(sk.astype(np.float64) / 100.0,
                                   pa.float64())},
            schema=out_schema,
        )

    return partitioned_groups(
        exploded.map_batches(precombine, batch_format="pyarrow",
                             batch_size=None),
        finalize, mid_schema=mid, num_parts=num_parts,
    )


def hourly_event_stats(sf_dir: str) -> ray.data.Dataset:
    """Tumbling hourly windows: derived window-key column + the
    fixed-partition keyed aggregate (see :func:`_keyed_window_agg`)."""
    events = sized_read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def add_hour(batch: pa.Table) -> pa.Table:
        hours = batch["ts"].to_numpy().astype("datetime64[h]").astype("datetime64[us]")
        return pa.table(
            {"hour": pa.array(hours, pa.timestamp("us")),
             "event_type": batch["event_type"],
             "value": batch["value"]}
        )

    return _keyed_window_agg(
        events.map_batches(add_hour, batch_format="pyarrow",
                           batch_size=None),
        "hour",
    )


def sliding_window_counts(sf_dir: str, size_minutes: int = 60,
                          step_minutes: int = 30) -> ray.data.Dataset:
    """Sliding event-time windows: each event lands in ``size/step``
    overlapping windows; a vectorized explode (event → window_start
    keys) + the fixed-partition keyed aggregate — the standard
    windowed-aggregate lowering when the engine has no native window
    operator."""
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

    return _keyed_window_agg(
        events.map_batches(explode, batch_format="pyarrow",
                           batch_size=None),
        "window_start",
    )


def sessionize(sf_dir: str, gap_minutes: int = 30,
               num_parts: int = 64) -> ray.data.Dataset:
    """Session windows per user: break each user's ts-ordered events
    at > gap; emits (user_id, session_id, n_events, start, end).

    Lowered onto the fixed-partition shape (util.partitioned_groups),
    NOT ``groupby(user_id).map_groups``: distinct keys = distinct
    users, and Ray pays Python dispatch per group — corpus-scale user
    counts would cost minutes for work one lexsort does in
    milliseconds (the CLAUDE.md anti-pattern). Here the shuffle key is
    ``hash(user_id) % part_space(num_parts)`` (one user never splits
    across partitions), and each partition finds EVERY user's session
    breaks with one ``np.lexsort((ts, user))`` + one vectorized
    diff/cumsum pass. Wall time is linear in rows, not in users.
    Partitioning assumption: one user's events fit one partition
    (true for per-user event logs; partitions hold ~n_users/num_parts
    users each, so only a single user exceeding a worker's memory
    would need salting + merge)."""
    events = sized_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    gap_us = np.int64(gap_minutes * 60) * np.int64(1_000_000)

    mid_schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.int64()), ("__part", pa.int32())]
    )
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("session_id", pa.int64()),
         ("n_events", pa.int64()),
         ("session_start", pa.timestamp("us")),
         ("session_end", pa.timestamp("us"))]
    )

    from .util import part_space, partitioned_groups

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return mid_schema.empty_table()
        user = t["user_id"].to_numpy().astype(np.int64)
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        part = (
            (user.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        return pa.table(
            {"user_id": pa.array(user, pa.int64()),
             "ts": pa.array(ts, pa.int64()),
             "__part": pa.array(part, pa.int32())},
            schema=mid_schema,
        )

    def sessions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return out_schema.empty_table()
        user = group["user_id"].to_numpy().astype(np.int64)
        ts = group["ts"].to_numpy().astype(np.int64)
        order = np.lexsort((ts, user))
        user, ts = user[order], ts[order]
        new_user = np.r_[True, np.diff(user) != 0]
        brk = new_user | np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:] - 1, len(ts) - 1]
        seg_user = user[starts]
        seg_idx = np.arange(len(starts), dtype=np.int64)
        first_seg = np.maximum.accumulate(
            np.where(np.r_[True, np.diff(seg_user) != 0], seg_idx, 0)
        )
        return pa.table(
            {"user_id": pa.array(seg_user, pa.int64()),
             "session_id": pa.array(seg_idx - first_seg, pa.int64()),
             "n_events": pa.array(ends - starts + 1, pa.int64()),
             "session_start": pa.array(
                 ts[starts].astype("datetime64[us]"), pa.timestamp("us")),
             "session_end": pa.array(
                 ts[ends].astype("datetime64[us]"), pa.timestamp("us"))},
            schema=out_schema,
        )

    return partitioned_groups(
        events.map_batches(tag, batch_format="pyarrow", batch_size=None),
        sessions, mid_schema=mid_schema, num_parts=num_parts,
    )
