"""Mergeable sketches — the pre-aggregate pattern for distinct-count
at scale (ray_guide "Aggregation at scale": one serialized sketch per
batch, merged in a tiny second stage; nothing shuffles raw rows).

HyperLogLog (Flajolet et al. 2007, public algorithm): 2^p byte
registers, standard bias-corrected estimator with linear counting
for the low range. Deterministic — and the item hash is an md5
64-bit prefix specifically so a SQL oracle can recompute the
registers bit-for-bit (DuckDB: ``CAST('0x' || substr(md5(x), 1, 16)
AS UBIGINT)``; see the ``approx_users`` oracle in __ray_entry__.py)
— so repeated runs agree exactly and the estimate is value-checkable,
not just bounds-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .util import sized_read_parquet


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 4:
            self.alpha = 0.673
        elif p == 5:
            self.alpha = 0.697
        elif p == 6:
            self.alpha = 0.709
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add(self, item: str) -> None:
        # md5 prefix, not blake2b: SQL-reproducible (module docstring)
        h = int.from_bytes(
            hashlib.md5(item.encode("utf-8")).digest()[:8], "big"
        )
        idx = h >> (64 - self.p)
        rest = h & ((1 << (64 - self.p)) - 1)
        rank = (64 - self.p) - rest.bit_length() + 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, items) -> None:
        for item in items:
            self.add(item)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = self.alpha * self.m * self.m / inv.sum()
        if raw <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return self.m * np.log(self.m / zeros)
        return raw

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        obj = cls(p=data[0])
        obj.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return obj


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Distinct-count estimate: one HLL per batch (map side), merged
    on the driver — bytes moved = n_batches × 2^p, not n_rows."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_many(str(v) for v in batch[column].to_pylist())
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(
        sketch_batch, batch_format="pyarrow", batch_size=None
    ).take_all():
        merged.merge(HyperLogLog.from_bytes(row["sketch"]))
    return merged.estimate()


def approx_distinct_users_per_type(sf_dir: str, p: int = 12) -> ray.data.Dataset:
    """Grouped sketch aggregate: distinct users per event_type —
    partial HLLs per (batch, type), merged per type in a small
    groupby (the mergeable-sketch combiner pattern)."""
    events = sized_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        sketches: dict[str, HyperLogLog] = {}
        for et, uid in zip(
            batch["event_type"].to_pylist(), batch["user_id"].to_pylist()
        ):
            sketches.setdefault(et, HyperLogLog(p)).add(str(uid))
        return pa.table(
            {
                "event_type": pa.array(list(sketches), pa.string()),
                "sketch": pa.array(
                    [s.to_bytes() for s in sketches.values()], pa.binary()
                ),
            }
        )

    def merge_group(group: pa.Table) -> pa.Table:
        merged = HyperLogLog(p)
        for blob in group["sketch"].to_pylist():
            merged.merge(HyperLogLog.from_bytes(blob))
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "approx_users": pa.array(
                    [int(round(merged.estimate()))], pa.int64()
                ),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .map_groups(merge_group, batch_format="pyarrow")
    )
