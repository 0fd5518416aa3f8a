"""Frontier-state tests: filters, politeness parity, robots, heap
ordering, shard checkpoint round-trip."""

from datetime import datetime

import pyarrow as pa
import pytest

from ftw_crawler_ray.state.filters import BloomFilter, CuckooFilter, ExactSeenSet
from ftw_crawler_ray.state.frontier import FrontierShard
from ftw_crawler_ray.state.heap import FrontierHeap, priority_key
from ftw_crawler_ray.state.politeness import PolitenessState
from ftw_crawler_ray.state.robots import RobotsCache


class TestCuckooFilter:
    def test_membership(self):
        f = CuckooFilter(10_000)
        urls = [f"http://h{i}.example.org/p/{i}" for i in range(5_000)]
        # a small false-positive rate on first insert is inherent
        # (≈0.2% at 12-bit fingerprints) — the exact mode exists for
        # set-equality-proof crawls
        false_seen = sum(0 if f.add_if_unseen(u) else 1 for u in urls)
        assert false_seen / len(urls) < 0.01
        for u in urls:
            assert u in f               # never a false negative
            assert not f.add_if_unseen(u)

    def test_no_false_negatives_after_roundtrip(self):
        f = CuckooFilter(10_000)
        urls = [f"http://x.org/{i}" for i in range(3_000)]
        for u in urls:
            f.add(u)
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert g.count == f.count
        for u in urls:
            assert u in g

    def test_roundtrip_byte_exact(self):
        f = CuckooFilter(1_000)
        for i in range(500):
            f.add(f"k{i}")
        data = f.to_bytes()
        assert CuckooFilter.from_bytes(data).to_bytes() == data

    def test_false_positive_rate_bounded(self):
        f = CuckooFilter(20_000)
        for i in range(10_000):
            f.add(f"in-{i}")
        fp = sum(1 for i in range(10_000) if f"out-{i}" in f)
        assert fp / 10_000 < 0.01  # 12-bit fingerprints → ~0.1% expected


class TestBloomFilter:
    def test_membership_and_roundtrip(self):
        f = BloomFilter(5_000, fp_rate=0.001)
        for i in range(2_000):
            f.add(f"u{i}")
        g = BloomFilter.from_bytes(f.to_bytes())
        assert all(f"u{i}" in g for i in range(2_000))
        fp = sum(1 for i in range(5_000) if f"v{i}" in g)
        assert fp / 5_000 < 0.01


class TestPoliteness:
    def test_sequential_spacing(self):
        st = PolitenessState(default_sleeptime=0.1)
        b = st.budget("h.org")
        t = [b.schedule_fetch() for _ in range(3)]
        assert t == [0.0, pytest.approx(0.1), pytest.approx(0.2)]

    def test_429_doubles_and_persists(self):
        # reference fetcher.py:60-66: sleep at current sleeptime per
        # 429; double ONLY when the retry 429s again; never reset
        st = PolitenessState(default_sleeptime=0.1)
        b = st.budget("h.org")
        assert b.schedule_fetch() == 0.0            # t=0, next=0.1
        t2 = b.schedule_fetch(n_429=1)              # sleeps 0.1 → starts 0.2
        assert t2 == pytest.approx(0.2)
        assert b.sleeptime == pytest.approx(0.1)    # single 429: no double
        t3 = b.schedule_fetch()
        assert t3 == pytest.approx(0.3)             # 0.2 + sleeptime

        # two consecutive 429s: sleeps 0.1 then (doubled) 0.2,
        # sleeptime ends at 0.2 = base*2^(k-1) and persists
        st2 = PolitenessState(default_sleeptime=0.1)
        b2 = st2.budget("h.org")
        t = b2.schedule_fetch(n_429=2)
        assert t == pytest.approx(0.3)              # 0 + 0.1 + 0.2
        assert b2.sleeptime == pytest.approx(0.2)
        assert b2.schedule_fetch() == pytest.approx(0.5)

    def test_roundtrip(self):
        st = PolitenessState(0.1)
        st.budget("a.org").schedule_fetch(n_429=2)
        data = st.to_bytes()
        st2 = PolitenessState.from_bytes(data)
        assert st2.to_bytes() == data
        assert st2.budget("a.org").sleeptime == st.budget("a.org").sleeptime


class TestRobots:
    def test_no_rules_allows(self):
        rc = RobotsCache()
        assert rc.allowed("http://unknown.org/anything")

    def test_disallow(self):
        rc = RobotsCache()
        rc.put("h.org", "User-agent: *\nDisallow: /private/")
        assert not rc.allowed("http://h.org/private/x")
        assert rc.allowed("http://h.org/public/x")

    def test_roundtrip(self):
        rc = RobotsCache()
        rc.put("h.org", "User-agent: *\nDisallow: /")
        rc2 = RobotsCache.from_bytes(rc.to_bytes())
        assert not rc2.allowed("http://h.org/x")


class TestHeap:
    def test_order_priority_then_lastmod_then_seq(self):
        h = FrontierHeap()
        h.push("0.5", datetime(2020, 1, 1), 1, "a")
        h.push("1.0", datetime(2019, 1, 1), 2, "b")   # higher priority wins
        h.push("0.5", datetime(2021, 1, 1), 3, "c")   # newer lastmod wins
        h.push("0.5", None, 0, "d")                   # missing lastmod last
        assert list(h.drain()) == ["b", "c", "a", "d"]

    def test_seq_tiebreak(self):
        assert priority_key("0.5", None, 1) < priority_key("0.5", None, 2)


class TestFrontierShardCheckpoint:
    def _group(self, urls, seqs=None):
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lastmod": pa.array([None] * n, pa.string()),
                "priority": pa.array([None] * n, pa.string()),
                "seq": pa.array(seqs or list(range(n)), pa.int64()),
                "shard": pa.array([0] * n, pa.int32()),
            }
        )

    def test_schedule_dedup_and_status(self, tmp_path):
        shard = FrontierShard(0, checkpoint_dir=str(tmp_path))
        out = shard.schedule(
            self._group(
                ["http://a.org/x", "http://a.org/X", "http://b.org/y"]
            )
        )
        assert out["status"].to_pylist() == ["scheduled", "dup", "scheduled"]
        shard.checkpoint()

        resumed = FrontierShard(0, checkpoint_dir=str(tmp_path))
        assert resumed.load_checkpoint()
        out2 = resumed.schedule(
            self._group(["http://a.org/x", "http://c.org/z"], seqs=[10, 11])
        )
        assert out2["status"].to_pylist() == ["dup", "scheduled"]
        assert resumed.n_seen == 3

    def test_politeness_survives_checkpoint(self, tmp_path):
        shard = FrontierShard(1, checkpoint_dir=str(tmp_path))
        shard.schedule(
            self._group(["http://a.org/1", "http://a.org/2"]),
            n_429_for=lambda u: 2 if u.endswith("/1") else 0,
        )
        sleeptime = shard.politeness.budget("a.org").sleeptime
        assert sleeptime == pytest.approx(0.2)  # doubled by the 2nd 429
        shard.checkpoint()
        resumed = FrontierShard(1, checkpoint_dir=str(tmp_path))
        resumed.load_checkpoint()
        assert resumed.politeness.budget("a.org").sleeptime == pytest.approx(0.2)

    def test_robots_blocked(self, tmp_path):
        shard = FrontierShard(
            2, checkpoint_dir=str(tmp_path),
            robots_map={"a.org": "User-agent: *\nDisallow: /"},
        )
        out = shard.schedule(self._group(["http://a.org/x", "http://b.org/y"]))
        assert out["status"].to_pylist() == ["robots_blocked", "scheduled"]

    def test_staged_checkpoint_retry_safe(self, tmp_path):
        """A Ray retry of a scheduling task must recompute from the
        committed state, not its own first attempt's checkpoint —
        run_id staging + commit_checkpoints gives exactly that."""
        from ftw_crawler_ray.state.frontier import commit_checkpoints

        group = self._group(["http://a.org/1", "http://a.org/2"])
        a = FrontierShard(0, checkpoint_dir=str(tmp_path), run_id="r1")
        assert not a.load_checkpoint()
        out1 = a.schedule(group)
        a.checkpoint()

        # simulated task retry: same run, fresh worker — sees no
        # committed checkpoint, reproduces the identical plan
        b = FrontierShard(0, checkpoint_dir=str(tmp_path), run_id="r1")
        assert not b.load_checkpoint()
        out2 = b.schedule(group)
        b.checkpoint()
        assert out1["status"].to_pylist() == out2["status"].to_pylist() == [
            "scheduled", "scheduled"]

        # plan durable → promote. A FRESH staged file from another
        # run (concurrent crawl against the shared checkpoint_dir)
        # must survive this run's commit...
        FrontierShard(1, checkpoint_dir=str(tmp_path), run_id="r2").checkpoint()
        assert commit_checkpoints(str(tmp_path), "r1") == 1
        import glob as g
        assert len(g.glob(str(tmp_path / "*.staged-r2*"))) == 1
        # ...and commit itself later
        assert commit_checkpoints(str(tmp_path), "r2") == 1
        # a stale staged file from a CRASHED run is swept once it
        # ages past the grace period
        FrontierShard(2, checkpoint_dir=str(tmp_path), run_id="dead").checkpoint()
        assert commit_checkpoints(str(tmp_path), "r1", stale_after=-1.0) == 0
        assert not g.glob(str(tmp_path / "*.staged-*"))

        c = FrontierShard(0, checkpoint_dir=str(tmp_path))
        assert c.load_checkpoint()
        assert set(c.schedule(group)["status"].to_pylist()) == {"dup"}

    def test_cuckoo_mode_checkpoint(self, tmp_path):
        shard = FrontierShard(3, checkpoint_dir=str(tmp_path), seen_mode="cuckoo")
        shard.schedule(self._group(["http://a.org/1"]))
        shard.checkpoint()
        resumed = FrontierShard(3, checkpoint_dir=str(tmp_path))
        resumed.load_checkpoint()
        assert resumed.seen_mode == "cuckoo"
        assert "http://a.org/1" in resumed.seen


class TestAutoShards:
    def test_rule_of_4k_at_1e10(self):
        from ftw_crawler_ray.state.frontier import auto_num_shards

        assert auto_num_shards(10**10) == 4000
        assert auto_num_shards(500) == 8          # floor for small runs
        assert auto_num_shards(10**13) == 65_536  # clamped
        assert auto_num_shards(3 * 10**6) == 8
        assert auto_num_shards(10**8) == 40

    def test_chunked_schedule_matches_whole_group(self):
        """Chunked scheduling through the same shard state must equal
        one whole-group call when host rows don't straddle chunks
        (and stays consistent on dedup/seen across chunks)."""
        import pyarrow as pa

        from ftw_crawler_ray.sources.pages import frontier_batch
        import pyarrow.parquet as pq

        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        fr = frontier_batch(t)
        # sort by host so chunk boundary falls between hosts
        order = pa.compute.sort_indices(fr, sort_keys=[("site_id", "ascending")])
        fr = fr.take(order)
        # find a boundary between two hosts
        sids = fr["site_id"].to_pylist()
        cut = next(i for i in range(1, len(sids)) if sids[i] != sids[i - 1])

        a = FrontierShard(0)
        whole = a.schedule_vectorized(fr)
        b = FrontierShard(0)
        chunked = pa.concat_tables(
            [b.schedule_vectorized(fr.slice(0, cut)),
             b.schedule_vectorized(fr.slice(cut))]
        )
        assert whole["status"].to_pylist() == chunked["status"].to_pylist()
        assert whole["fetch_order"].to_pylist() == chunked["fetch_order"].to_pylist()
        assert b.n_seen == a.n_seen and b.n_scheduled == a.n_scheduled


class TestVectorizedScheduleEquivalence:
    def test_matches_sequential_path(self):
        """schedule_vectorized is a numpy rendering of schedule —
        statuses, per-host order, politeness offsets and all state
        counters must agree (it also documents the closed-form
        politeness recurrence the SQL oracle uses)."""
        import pyarrow.parquet as pq

        from ftw_crawler_ray.pipelines.crawl import (
            SANDBOX_ROBOTS,
            sandbox_n_429,
        )
        from ftw_crawler_ray.sources.pages import frontier_batch

        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        fr = frontier_batch(t)
        group = pa.concat_tables([fr, fr.slice(0, 5)])  # dup rows too

        a = FrontierShard(0, robots_map=SANDBOX_ROBOTS)
        b = FrontierShard(0, robots_map=SANDBOX_ROBOTS)
        out_a = a.schedule(group, n_429_for=sandbox_n_429)
        out_b = b.schedule_vectorized(group, n_429_for=sandbox_n_429)
        assert out_a["status"].to_pylist() == out_b["status"].to_pylist()
        assert (
            out_a["fetch_order"].to_pylist() == out_b["fetch_order"].to_pylist()
        )
        import math

        for x, y in zip(
            out_a["planned_offset"].to_pylist(),
            out_b["planned_offset"].to_pylist(),
        ):
            x_missing = x is None or math.isnan(x)
            y_missing = y is None or math.isnan(y)
            assert x_missing == y_missing
            if not x_missing:
                assert abs(x - y) < 1e-9
        assert (a.n_seen, a.n_scheduled, a.high_seq) == (
            b.n_seen, b.n_scheduled, b.high_seq
        )


class TestIndexStateVectorized:
    def test_matches_row_formulation(self):
        """index_state_batch (mask/concat vectorized) must produce the
        same ROWS as the historical per-doc interleaved loop — order
        may differ (every consumer is order-independent), values and
        multiplicities may not."""
        import hashlib
        from uuid import UUID

        import numpy as np
        import pyarrow.parquet as pq

        from ftw_crawler_ray.sources.pages import (
            TS0, index_state_batch, _ids_hosts,
        )

        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        got = index_state_batch(t)

        _, _, host = _ids_hosts(t)
        np_id = t["doc_id"].combine_chunks().to_numpy()
        warc = TS0 + (np_id * 60_000_000).astype("timedelta64[us]")
        day = np.timedelta64(1, "D")
        hosts = host.to_pylist()
        expected = []
        for i, d in enumerate(np_id):
            d = int(d)
            if d % 6 == 0:
                expected.append((f"http://{hosts[i]}/docs/page-{d}",
                                 warc[i] + day, hosts[i]))
            elif d % 6 == 3:
                expected.append((f"http://{hosts[i]}/docs/page-{d}",
                                 warc[i] - day, hosts[i]))
            if d % 11 == 0:
                expected.append((f"http://{hosts[i]}/docs/gone-{d}",
                                 warc[i], hosts[i]))
            if d % 19 == 0:
                expected.append((f"http://other.example.net/docs/page-{d}",
                                 warc[i], "other.example.net"))
        exp_rows = sorted(
            (u, str(lm), s,
             str(UUID(bytes=hashlib.md5(u.encode()).digest())))
            for u, lm, s in expected
        )
        got_rows = sorted(
            (r["url"], str(np.datetime64(r["last_modified"], "us")),
             r["crawler_site_id"], r["uid"])
            for r in got.to_pylist()
        )
        assert got_rows == exp_rows
