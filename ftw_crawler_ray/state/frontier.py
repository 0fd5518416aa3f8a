"""FrontierShard — the stateful heart of the crawl engine
(north_rule: sharded URL frontier with URL-seen filter, politeness
token buckets, robots cache, priority ordering, Parquet checkpoints).

One shard owns every host with ``host_hash(host) % num_shards ==
shard_id`` (SURVEY.md §7.3), so all state for a host lives in exactly
one place — no cross-shard coordination. The shard is driven by the
crawl pipeline through ``groupby('shard').map_groups(...)``: the
shuffle routes each discovered URL to its owning shard, the shard
schedules its group, checkpoints, and emits the fetch plan. Shard
count bounds group size: at 10^10 urls use O(4k) shards so one
group ≈ 2.4M rows ≈ one worker's memory.

Checkpoint = one Parquet row per shard (seen-filter bytes,
politeness JSON, robots JSON, high-water seq, counters), written
atomically (tmp + rename). Resuming loads the row and the filter
round-trips byte-exactly (tests/test_state.py), so a killed run
continues to the identical final URL-seen set.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.urlnorm import canonical_url, host_of
from .filters import CuckooFilter, ExactSeenSet
from .heap import FrontierHeap
from .politeness import PolitenessState
from .robots import RobotsCache

CHECKPOINT_SCHEMA = pa.schema(
    [
        ("shard_id", pa.int32()),
        ("seen_mode", pa.string()),
        ("seen_bytes", pa.large_binary()),
        ("politeness_bytes", pa.binary()),
        ("robots_bytes", pa.binary()),
        ("high_seq", pa.int64()),
        ("n_seen", pa.int64()),
        ("n_scheduled", pa.int64()),
    ]
)


def read_seen_set(checkpoint_dir: str) -> set[str]:
    """Union of all shards' exact URL-seen sets (seen_mode='exact'
    checkpoints only) — the cross-run equality invariant
    (BASELINE.json north_rule: 'final URL-seen set must match')."""
    import glob

    seen: set[str] = set()
    for path in glob.glob(os.path.join(checkpoint_dir, "shard-*.parquet")):
        row = pq.read_table(path).to_pylist()[0]
        if row["seen_mode"] != "exact":
            raise ValueError("read_seen_set requires exact-mode checkpoints")
        seen |= set(ExactSeenSet.from_bytes(row["seen_bytes"])._set)
    return seen


class FrontierShard:
    def __init__(self, shard_id: int, checkpoint_dir: str | None = None,
                 seen_mode: str = "exact", capacity: int = 1 << 20,
                 default_sleeptime: float = 0.1,
                 robots_map: dict[str, str] | None = None):
        self.shard_id = shard_id
        self.checkpoint_dir = checkpoint_dir
        self.seen_mode = seen_mode
        if seen_mode == "cuckoo":
            self.seen = CuckooFilter(capacity)
        else:
            self.seen = ExactSeenSet()
        self.politeness = PolitenessState(default_sleeptime)
        self.robots = RobotsCache()
        for host, txt in (robots_map or {}).items():
            self.robots.put(host, txt)
        self.high_seq = -1
        self.n_seen = 0
        self.n_scheduled = 0

    # -- checkpointing -------------------------------------------------------
    def _ckpt_path(self) -> str:
        return os.path.join(self.checkpoint_dir, f"shard-{self.shard_id:05d}.parquet")

    def load_checkpoint(self) -> bool:
        if not self.checkpoint_dir:
            return False
        path = self._ckpt_path()
        if not os.path.exists(path):
            return False
        row = pq.read_table(path).to_pylist()[0]
        self.seen_mode = row["seen_mode"]
        if self.seen_mode == "cuckoo":
            self.seen = CuckooFilter.from_bytes(row["seen_bytes"])
        else:
            self.seen = ExactSeenSet.from_bytes(row["seen_bytes"])
        self.politeness = PolitenessState.from_bytes(row["politeness_bytes"])
        self.robots = RobotsCache.from_bytes(row["robots_bytes"])
        self.high_seq = row["high_seq"]
        self.n_seen = row["n_seen"]
        self.n_scheduled = row["n_scheduled"]
        return True

    def checkpoint(self) -> None:
        if not self.checkpoint_dir:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        table = pa.table(
            {
                "shard_id": pa.array([self.shard_id], pa.int32()),
                "seen_mode": pa.array([self.seen_mode], pa.string()),
                "seen_bytes": pa.array([self.seen.to_bytes()], pa.large_binary()),
                "politeness_bytes": pa.array(
                    [self.politeness.to_bytes()], pa.binary()
                ),
                "robots_bytes": pa.array([self.robots.to_bytes()], pa.binary()),
                "high_seq": pa.array([self.high_seq], pa.int64()),
                "n_seen": pa.array([self.n_seen], pa.int64()),
                "n_scheduled": pa.array([self.n_scheduled], pa.int64()),
            },
            schema=CHECKPOINT_SCHEMA,
        )
        tmp = self._ckpt_path() + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self._ckpt_path())

    # -- scheduling ----------------------------------------------------------
    def schedule(self, group: pa.Table, n_429_for=None) -> pa.Table:
        """Admit a batch of frontier rows (url, lastmod, priority,
        seq): dedup against URL-seen, gate on robots, order per host
        by (priority DESC, lastmod DESC, seq), assign politeness
        offsets. Emits every input row with a ``status`` ∈
        {scheduled, dup, robots_blocked} plus per-host fetch_order
        and planned_offset for scheduled rows.
        """
        urls = group["url"].to_pylist()
        lastmods = (
            group["lastmod"].to_pylist()
            if "lastmod" in group.column_names
            else [None] * len(urls)
        )
        priorities = (
            group["priority"].to_pylist()
            if "priority" in group.column_names
            else [None] * len(urls)
        )
        seqs = (
            group["seq"].to_pylist()
            if "seq" in group.column_names
            else list(range(len(urls)))
        )
        # host per row: the frontier carries the canonical host as
        # site_id — avoids a urlsplit per url in the hot loop
        hosts = (
            group["site_id"].to_pylist()
            if "site_id" in group.column_names
            else [host_of(u) for u in urls]
        )

        status = [""] * len(urls)
        heaps: dict[str, FrontierHeap] = {}
        for i, url in enumerate(urls):
            if not self.seen.add_if_unseen(canonical_url(url)):
                status[i] = "dup"
                continue
            self.n_seen += 1
            if not self.robots.allowed(url):
                status[i] = "robots_blocked"
                continue
            status[i] = "scheduled"
            host = hosts[i]
            lm = lastmods[i]
            if isinstance(lm, str):
                lm = datetime.fromisoformat(lm)
            heaps.setdefault(host, FrontierHeap()).push(
                priorities[i], lm, seqs[i], i
            )
            if seqs[i] > self.high_seq:
                self.high_seq = seqs[i]

        fetch_order = np.full(len(urls), -1, dtype=np.int64)
        planned_offset = np.full(len(urls), np.nan, dtype=np.float64)
        for host, heap in heaps.items():
            budget = self.politeness.budget(host)
            for rank, i in enumerate(heap.drain()):
                fetch_order[i] = rank
                n429 = n_429_for(urls[i]) if n_429_for else 0
                planned_offset[i] = budget.schedule_fetch(n429)
                self.n_scheduled += 1

        out = group.append_column(
            "status", pa.array(status, pa.string())
        ).append_column(
            "fetch_order", pa.array(fetch_order, pa.int64())
        ).append_column(
            "planned_offset", pa.array(planned_offset, pa.float64())
        )
        return out
