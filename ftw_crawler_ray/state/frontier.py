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
import pyarrow.compute as pc
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


# One shard's group must fit a worker: target ~2.5M urls per shard
# (the O(4k)-shards-at-10^10-urls rule, codified).
URLS_PER_SHARD = 2_500_000


def auto_num_shards(n_urls: int, urls_per_shard: int = URLS_PER_SHARD,
                    lo: int = 8, hi: int = 65_536) -> int:
    """Data-sized shard count: ceil(n / urls_per_shard), clamped.
    At 10^10 urls this yields 4,000 shards ≈ 2.5M rows ≈ one worker's
    memory per scheduling group; small runs stay at ``lo`` so every
    core still gets a group."""
    import math

    return max(lo, min(hi, math.ceil(max(1, n_urls) / urls_per_shard)))


def commit_checkpoints(checkpoint_dir: str, run_id: str,
                       stale_after: float = 3600.0) -> int:
    """Promote this run's staged shard checkpoints onto the committed
    paths; returns the number committed. Called AFTER the plan Parquet
    is durably written, so a Ray retry of a scheduling task (which
    re-reads only the committed state and re-writes its staged file
    idempotently) can never mark this run's own URLs as dups.

    Other runs' staged files are swept only when older than
    ``stale_after`` seconds (crashed-run leftovers) — a CONCURRENT
    run against a shared checkpoint_dir keeps its staged files and
    commits them itself; sweeping them immediately would silently
    lose its seen-URL records."""
    import glob
    import time

    n = 0
    now = time.time()
    suffix = f".staged-{run_id}.parquet"
    for path in glob.glob(os.path.join(checkpoint_dir, "shard-*.staged-*.parquet")):
        if path.endswith(suffix):
            committed = path[: -len(suffix)] + ".parquet"
            os.replace(path, committed)
            n += 1
        else:
            try:
                if now - os.path.getmtime(path) > stale_after:
                    os.remove(path)
            except OSError:
                pass  # the other run committed it meanwhile
    return n


class FrontierShard:
    def __init__(self, shard_id: int, checkpoint_dir: str | None = None,
                 seen_mode: str = "exact", capacity: int = 1 << 20,
                 default_sleeptime: float = 0.1,
                 sleeptime_by_host: dict[str, float] | None = None,
                 robots_map: dict[str, str] | None = None,
                 run_id: str | None = None):
        self.shard_id = shard_id
        self.checkpoint_dir = checkpoint_dir
        self.run_id = run_id
        self.seen_mode = seen_mode
        if seen_mode == "cuckoo":
            self.seen = CuckooFilter(capacity)
        else:
            self.seen = ExactSeenSet()
        self._sleeptime_by_host = sleeptime_by_host or {}
        self.politeness = PolitenessState(
            default_sleeptime, overrides=self._sleeptime_by_host
        )
        self.robots = RobotsCache()
        for host, txt in (robots_map or {}).items():
            self.robots.put(host, txt)
        self.high_seq = -1
        self.n_seen = 0
        self.n_scheduled = 0

    # -- checkpointing -------------------------------------------------------
    def _ckpt_path(self) -> str:
        return os.path.join(self.checkpoint_dir, f"shard-{self.shard_id:05d}.parquet")

    def _staged_path(self) -> str:
        return os.path.join(
            self.checkpoint_dir,
            f"shard-{self.shard_id:05d}.staged-{self.run_id}.parquet",
        )

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
        # per-host configured sleeptimes are config, not checkpointed
        # state — reattach for hosts the checkpoint hasn't seen yet
        self.politeness.overrides = self._sleeptime_by_host
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
        # With a run_id, write to a staged path: load_checkpoint()
        # reads only the committed path, so a retried scheduling task
        # recomputes from the same prior state (idempotent) instead of
        # seeing its own first attempt's seen-set and deduping the
        # whole group away. commit_checkpoints() promotes staged →
        # committed once the plan is durable.
        dest = self._staged_path() if self.run_id else self._ckpt_path()
        tmp = dest + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, dest)

    # -- vectorized scheduling ----------------------------------------------
    def schedule_vectorized(self, group: pa.Table, n_429_for=None) -> pa.Table:
        """Numpy rendering of :meth:`schedule` — identical semantics
        (A/B-tested + oracle-checked), no per-row Python in the hot
        path except set-membership against the persisted URL-seen
        filter (a C-level hash lookup):

        - dedup: first in-batch occurrence of canonical url AND not
          already in the persisted filter
        - robots: one decision per distinct host (paths share rules
          here; per-url robots falls back to :meth:`schedule`)
        - ordering: per-host lexsort on (-priority, lastmod-missing,
          -lastmod, seq)
        - politeness: closed-form virtual clock. With ≤1 retry per
          fetch sleeptime never doubles (doubling needs the retry to
          429 again), so s is the host's constant sleeptime and
          t_i = t0 + Σ_{j<i} s·(1 + [429_j]) + s·[429_i] — matches
          HostBudget's loop.
        """
        n = group.num_rows
        if n == 0:
            return self.schedule(group, n_429_for)
        urls = group["url"].to_pylist()
        canon = pc.utf8_lower(group["url"].combine_chunks())
        # in-batch first occurrence
        enc = pc.dictionary_encode(canon)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        first_idx = np.full(int(codes.max()) + 1, -1, dtype=np.int64)
        rev = np.arange(n - 1, -1, -1)
        first_idx[codes[rev]] = rev  # last write wins → first occurrence
        is_first = first_idx[codes] == np.arange(n)
        # persisted-filter membership (C hash lookups)
        canon_list = canon.to_pylist()
        seen_before = np.fromiter(
            (u in self.seen for u in canon_list), dtype=bool, count=n
        )
        fresh = is_first & ~seen_before
        for i in np.nonzero(fresh)[0]:
            self.seen.add_if_unseen(canon_list[i])
        self.n_seen += int(fresh.sum())

        host_enc = pc.dictionary_encode(
            group["site_id"].combine_chunks()
            if "site_id" in group.column_names
            else pa.array([host_of(u) for u in urls])
        )
        host_codes = host_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        host_names = host_enc.dictionary.to_pylist()
        # robots: hosts without cached rules are allowed wholesale; a
        # per-url check runs only for rows of rule-carrying hosts
        rule_host = np.array([h in self.robots._raw for h in host_names])
        allowed = np.ones(n, dtype=bool)
        for i in np.nonzero(rule_host[host_codes])[0]:
            allowed[i] = self.robots.allowed(urls[i])

        status = np.where(
            ~fresh, "dup", np.where(allowed, "scheduled", "robots_blocked")
        )
        sched_mask = fresh & allowed

        seqs = group["seq"].to_numpy() if "seq" in group.column_names else np.arange(n)
        if sched_mask.any():
            self.high_seq = max(self.high_seq, int(seqs[sched_mask].max()))

        # ordering key arrays
        prio = np.array(
            [0.5 if p is None else float(p) for p in (
                group["priority"].to_pylist()
                if "priority" in group.column_names else [None] * n)],
            dtype=np.float64,
        )
        lastmods = (
            group["lastmod"].to_pylist()
            if "lastmod" in group.column_names else [None] * n
        )
        lm_us = np.array(
            [v if v is not None else "NaT" for v in lastmods],
            dtype="datetime64[us]",
        ).astype("int64")
        lm_missing = np.array([v is None for v in lastmods])
        lm_us = np.where(lm_missing, np.int64(0), lm_us)

        fetch_order = np.full(n, -1, dtype=np.int64)
        planned_offset = np.full(n, np.nan, dtype=np.float64)
        is429 = (
            np.fromiter((n_429_for(u) for u in urls), dtype=np.int64, count=n)
            if n_429_for
            else np.zeros(n, dtype=np.int64)
        )
        if (is429 > 1).any():
            # the closed-form politeness below is exact for ≤1 retry
            # per fetch; multi-retry batches use the sequential path
            return self.schedule(group, n_429_for)

        idx = np.nonzero(sched_mask)[0]
        if len(idx):
            # global lexsort by (host, -priority, missing, -lastmod, seq)
            order = idx[
                np.lexsort(
                    (
                        seqs[idx],
                        -lm_us[idx],
                        lm_missing[idx],
                        -prio[idx],
                        host_codes[idx],
                    )
                )
            ]
            oh = host_codes[order]
            # rank within each host segment
            seg_start = np.r_[0, np.nonzero(np.diff(oh))[0] + 1]
            seg_len = np.diff(np.r_[seg_start, len(oh)])
            seg_of = np.repeat(np.arange(len(seg_start)), seg_len)
            ranks = np.arange(len(oh)) - seg_start[seg_of]
            fetch_order[order] = ranks
            # politeness closed form per host segment, resuming each
            # host's persisted (sleeptime, next_time)
            flags = is429[order].astype(np.float64)
            offsets = np.empty(len(order), dtype=np.float64)
            for s_i, length in zip(seg_start, seg_len):
                e_i = s_i + int(length)
                budget = self.politeness.budget(host_names[int(oh[s_i])])
                f = flags[s_i:e_i]
                base, t0 = budget.sleeptime, budget.next_time
                # single-retry fetches never double sleeptime (the
                # reference doubles only when the retry 429s again)
                contrib = base * (1 + f)
                t = t0 + np.r_[0.0, np.cumsum(contrib)[:-1]] + base * f
                offsets[s_i:e_i] = t
                # persist end state exactly as the sequential loop
                # would: sleeptime unchanged, clock advanced
                budget.next_time = t0 + float(contrib.sum())
            planned_offset[order] = offsets
            self.n_scheduled += len(order)

        return group.append_column(
            "status", pa.array(status.tolist(), pa.string())
        ).append_column(
            "fetch_order", pa.array(fetch_order, pa.int64())
        ).append_column(
            "planned_offset", pa.array(planned_offset, pa.float64())
        )

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
