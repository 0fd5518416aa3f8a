"""End-to-end crawl pipeline tests: full run counts, checkpointed
resume → identical URL-seen set (the north_rule invariant)."""

import pytest

from ftw_crawler_ray.state.frontier import read_seen_set

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def crawl_summary(ray_session, tmp_path_factory):
    from ftw_crawler_ray.pipelines.crawl import crawl

    out = tmp_path_factory.mktemp("crawl_full")
    summary = crawl(SF, out_dir=str(out), num_shards=4,
                    checkpoint_dir=str(out / "ckpt"))
    return summary


class TestCrawlEndToEnd:
    def test_plan_counts(self, crawl_summary):
        # 500 docs − 84 unmodified (doc_id%6==0) = 416 candidates;
        # hosts h3/h13/h23/h33 robots-block /docs/ → 41 urls blocked
        assert crawl_summary["plan_counts"]["scheduled"] == 375
        assert crawl_summary["plan_counts"]["robots_blocked"] == 41
        # J2 rode the same shuffle: 46 vanished urls under site hosts
        assert crawl_summary["plan_counts"]["purge"] == 46
        assert crawl_summary["n_purged"] == 46
        assert "dup" not in crawl_summary["plan_counts"]

    def test_fetch_counts(self, crawl_summary):
        # deterministic fault injection: doc_id%101==0 → 404,
        # %103==0 → redirect, among the 375 scheduled
        fc = crawl_summary["fetch_counts"]
        assert fc["fetched"] == 375 - fc.get("fetch_error", 0) - fc.get(
            "redirect", 0
        ) - fc.get("missing", 0)
        assert fc.get("missing", 0) == 0

    def test_output_partitioned_by_shard(self, crawl_summary):
        import os

        docs_dir = os.path.join(crawl_summary["out_dir"], "docs")
        parts = [d for d in os.listdir(docs_dir) if d.startswith("shard=")]
        assert len(parts) == 4

    def test_extracted_fields_present(self, crawl_summary, ray_session):
        import pyarrow.dataset as pads

        docs = pads.dataset(
            f"{crawl_summary['out_dir']}/docs", partitioning="hive"
        ).to_table(columns=["url", "UID", "Title", "SearchableText",
                            "fetch_status"])
        ok = docs.filter(
            __import__("pyarrow").compute.equal(docs["fetch_status"], "fetched")
        )
        assert ok.num_rows == crawl_summary["fetch_counts"]["fetched"]
        assert all(v is not None for v in ok["UID"].to_pylist())


class TestResume:
    def test_seen_set_identical_after_resume(self, ray_session, tmp_path):
        """Kill-and-resume invariant: crawl half the frontier, then
        resume over the full frontier — final URL-seen set equals a
        single full run's set."""
        import ray.data

        from ftw_crawler_ray.pipelines.crawl import crawl

        # full run (reference set)
        full = tmp_path / "full"
        crawl(SF, out_dir=str(full), num_shards=4,
              checkpoint_dir=str(full / "ckpt"))
        full_seen = read_seen_set(str(full / "ckpt"))

        # interrupted run: only even doc_ids first ("killed" mid-crawl),
        # then resumed over the complete frontier with the same ckpts
        part = tmp_path / "part"

        import ftw_crawler_ray.pipelines.crawl as crawl_mod

        orig = crawl_mod.frontier_batch

        def half_frontier_batch(batch):
            import pyarrow as pa

            t = orig(batch)
            return t.filter(pa.array(t["seq"].to_numpy() % 2 == 0))

        crawl_mod.frontier_batch = half_frontier_batch
        try:
            crawl(SF, out_dir=str(part), num_shards=4,
                  checkpoint_dir=str(part / "ckpt"))
        finally:
            crawl_mod.frontier_batch = orig
        half_seen = read_seen_set(str(part / "ckpt"))
        assert half_seen < full_seen  # strictly partial

        crawl(SF, out_dir=str(part / "resume"), num_shards=4,
              checkpoint_dir=str(part / "ckpt"))
        resumed_seen = read_seen_set(str(part / "ckpt"))
        assert resumed_seen == full_seen

    def test_rerun_same_out_overwrites(self, ray_session, tmp_path):
        """Re-running with the same --out (no checkpoints) must
        replace the previous run's outputs, not append to them —
        plan/docs counts stay identical, not doubled."""
        from ftw_crawler_ray.pipelines.crawl import crawl

        out = tmp_path / "same"
        s1 = crawl(SF, out_dir=str(out), num_shards=2)
        s2 = crawl(SF, out_dir=str(out), num_shards=2)
        assert s2["plan_counts"] == s1["plan_counts"]
        assert s2["fetch_counts"] == s1["fetch_counts"]
        assert s2["plan_counts"]["scheduled"] == 375

    def test_rerun_is_all_dup(self, ray_session, tmp_path):
        from ftw_crawler_ray.pipelines.crawl import crawl

        out = tmp_path / "a"
        crawl(SF, out_dir=str(out), num_shards=2, checkpoint_dir=str(out / "c"))
        s2 = crawl(SF, out_dir=str(tmp_path / "b"), num_shards=2,
                   checkpoint_dir=str(out / "c"))
        assert s2["plan_counts"] == {"dup": 416, "purge": 46}
        assert s2["fetch_counts"] == {}


class TestSingleUrlMode:
    def test_purge_scoped_to_target_site(self, ray_session, tmp_path):
        """reference main.py:76-77: single-url mode skips entire
        non-matching SITES before crawl_site, so purge tombstones are
        written only for the site owning the target url."""
        import pyarrow.dataset as pads

        from ftw_crawler_ray.pipelines.crawl import crawl

        out = tmp_path / "single"
        target = "http://h1.example.org/docs/page-1"
        s = crawl(SF, out_dir=str(out), num_shards=4, single_url=target)
        plan = pads.dataset(str(out / "plan")).to_table(
            columns=["url", "site_id", "status"]
        ).to_pylist()
        non_purge = [r for r in plan if r["status"] != "purge"]
        assert [r["url"] for r in non_purge] == [target]
        purge_sites = {r["site_id"] for r in plan if r["status"] == "purge"}
        assert purge_sites <= {"h1.example.org"}
        assert s["fetch_counts"].get("fetched", 0) == 1


class TestAutoShardCrawl:
    def test_num_shards_none_sizes_from_input(self, ray_session, tmp_path):
        """num_shards=None derives the shard count from input size
        (floor 8 at corpus scale) and the crawl still balances."""
        import os

        from ftw_crawler_ray.pipelines.crawl import crawl

        out = tmp_path / "auto"
        s = crawl(SF, out_dir=str(out), num_shards=None)
        assert s["plan_counts"]["scheduled"] == 375
        parts = [d for d in os.listdir(out / "docs") if d.startswith("shard=")]
        assert len(parts) == 8  # auto_num_shards floor


class TestCuckooSeenMode:
    def test_cuckoo_crawl_matches_exact_counts(self, ray_session, tmp_path):
        """seen_mode='cuckoo' (approximate URL-seen at ~0.2% fp)
        produces the same plan at corpus scale — the compact-filter
        path through the FULL pipeline, not just the unit tests."""
        from ftw_crawler_ray.pipelines.crawl import crawl

        exact = crawl(SF, out_dir=str(tmp_path / "e"), num_shards=2)
        cuckoo = crawl(SF, out_dir=str(tmp_path / "c"), num_shards=2,
                       seen_mode="cuckoo",
                       checkpoint_dir=str(tmp_path / "c" / "ckpt"))
        assert cuckoo["plan_counts"] == exact["plan_counts"]
        assert cuckoo["fetch_counts"] == exact["fetch_counts"]
        # rerun over the checkpoints: the cuckoo filter still dedups
        again = crawl(SF, out_dir=str(tmp_path / "c2"), num_shards=2,
                      seen_mode="cuckoo",
                      checkpoint_dir=str(tmp_path / "c" / "ckpt"))
        assert again["plan_counts"].get("scheduled", 0) == 0


class TestForceMode:
    def test_force_skips_is_modified_only(self, ray_session):
        """reference -f/--force (fetcher.py:49-51): unmodified docs
        are crawled anyway; dedup and robots still apply."""
        import pyarrow.compute as pc

        from ftw_crawler_ray.pipelines.crawl import scheduled_frontier

        normal = scheduled_frontier(SF, num_shards=4).to_pandas()
        forced = scheduled_frontier(SF, num_shards=4, force=True).to_pandas()
        n_sched = (normal["status"] == "scheduled").sum()
        f_sched = (forced["status"] == "scheduled").sum()
        assert n_sched == 375
        assert len(forced) == 500           # nothing filtered pre-schedule
        assert f_sched > n_sched            # unmodified docs now included
        assert (forced["status"] == "robots_blocked").sum() >= 41
        assert set(forced["status"]) <= {"scheduled", "robots_blocked", "dup"}


class TestSolrLiveSink:
    def test_crawl_posts_updates_and_deletes(self, ray_session, tmp_path):
        """--solr: extracted docs stream through SolrIndexer actors
        (one update POST per block, commit=true) and tombstones
        through SolrPurger deletes — against a loopback server."""
        import json as _json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from ftw_crawler_ray.pipelines.crawl import crawl

        received = []

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                received.append((self.path, self.rfile.read(n)))
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        solr = f"http://127.0.0.1:{httpd.server_address[1]}/solr/core"
        try:
            s = crawl(SF, out_dir=str(tmp_path / "out"), num_shards=2,
                      solr_url=solr)
        finally:
            httpd.shutdown()
        assert s["n_solr_indexed"] == s["fetch_counts"]["fetched"]
        assert all(p == "/solr/core/update?commit=true" for p, _ in received)
        docs = [d for _, body in received
                for d in (_json.loads(body) if body[:1] == b"[" else [])]
        assert len(docs) == s["n_solr_indexed"]
        assert all("UID" in d for d in docs)
        deletes = [_json.loads(body) for _, body in received
                   if body[:1] == b"{"]
        assert len(deletes) == s["n_purged"] > 0
        assert all("delete" in d for d in deletes)


class TestInShardPurgeEquivalence:
    def test_plan_tombstones_match_antijoin(self, ray_session, tmp_path):
        """J2 via the shard shuffle must equal the standalone
        left-anti-join (stages/purge.py) — same (uid, url) set."""
        import pyarrow.dataset as pads

        from ftw_crawler_ray.pipelines.crawl import crawl
        from ftw_crawler_ray.stages.purge import purge_candidates

        out = tmp_path / "c"
        crawl(SF, out_dir=str(out), num_shards=4)
        plan_tombs = {
            (r["uid"], r["url"])
            for r in pads.dataset(str(out / "purged")).to_table().to_pylist()
        }
        join_tombs = {
            (r["uid"], r["url"]) for r in purge_candidates(SF).take_all()
        }
        assert plan_tombs == join_tombs
        assert len(plan_tombs) == 46


def _politeness_by_shard(checkpoint_dir):
    """shard_id → canonical politeness JSON from committed ckpts."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = {}
    for path in glob.glob(os.path.join(checkpoint_dir, "shard-*.parquet")):
        row = pq.read_table(path).to_pylist()[0]
        out[row["shard_id"]] = row["politeness_bytes"]
    return out


class TestKillAndResume:
    """SURVEY §7.4.6 fault claims: a mid-run worker kill or a lost
    shard-checkpoint commit must converge to the uninterrupted run's
    URL-seen set AND politeness budgets (the T2 restore claim)."""

    def test_fetch_actor_sigkill_mid_run(self, ray_session, tmp_path):
        """SIGKILL one fetch actor's worker process mid-batch: Ray
        restarts the actor and retries the bundle (stateless fetch),
        so the run completes with output identical to a clean run."""
        import os
        import signal

        import ftw_crawler_ray.pipelines.crawl as crawl_mod
        from ftw_crawler_ray.pipelines.crawl import crawl

        ref = tmp_path / "ref"
        ref_summary = crawl(SF, out_dir=str(ref), num_shards=4,
                            checkpoint_dir=str(ref / "ckpt"))
        ref_seen = read_seen_set(str(ref / "ckpt"))

        marker = str(tmp_path / "killed_once")
        orig = crawl_mod.FetchActor

        class KillingFetchActor(orig):
            def __call__(self, batch):
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL)
                    os.close(fd)
                    os.kill(os.getpid(), signal.SIGKILL)  # die mid-batch
                except FileExistsError:
                    pass
                return super().__call__(batch)

        kill = tmp_path / "kill"
        crawl_mod.FetchActor = KillingFetchActor
        try:
            summary = crawl(SF, out_dir=str(kill), num_shards=4,
                            checkpoint_dir=str(kill / "ckpt"))
        finally:
            crawl_mod.FetchActor = orig

        assert os.path.exists(marker)  # the kill actually fired
        assert summary["fetch_counts"] == ref_summary["fetch_counts"]
        assert summary["plan_counts"] == ref_summary["plan_counts"]
        assert read_seen_set(str(kill / "ckpt")) == ref_seen
        assert (_politeness_by_shard(str(kill / "ckpt"))
                == _politeness_by_shard(str(ref / "ckpt")))

    def test_lost_shard_checkpoint_commit_rerun_converges(self, ray_session,
                                                          tmp_path):
        """Crash between commit_checkpoints renames: one shard's
        committed checkpoint vanishes. The re-run re-schedules exactly
        that shard's URLs (they are no longer 'seen') and converges to
        the uninterrupted run's seen set and politeness budgets."""
        import glob
        import os

        from ftw_crawler_ray.pipelines.crawl import crawl

        ref = tmp_path / "ref"
        crawl(SF, out_dir=str(ref), num_shards=4,
              checkpoint_dir=str(ref / "ckpt"))
        ref_seen = read_seen_set(str(ref / "ckpt"))
        ref_pol = _politeness_by_shard(str(ref / "ckpt"))

        faulty = tmp_path / "faulty"
        crawl(SF, out_dir=str(faulty), num_shards=4,
              checkpoint_dir=str(faulty / "ckpt"))
        # drop one shard's commit (simulated partial-commit crash)
        victim = sorted(
            glob.glob(str(faulty / "ckpt" / "shard-*.parquet")))[1]
        os.remove(victim)
        assert read_seen_set(str(faulty / "ckpt")) < ref_seen

        s2 = crawl(SF, out_dir=str(faulty / "rerun"), num_shards=4,
                   checkpoint_dir=str(faulty / "ckpt"))
        # the lost shard's urls were really re-fetched, the rest dup'd
        assert s2["fetch_counts"].get("fetched", 0) > 0
        assert s2["plan_counts"]["dup"] > 0
        assert read_seen_set(str(faulty / "ckpt")) == ref_seen
        assert _politeness_by_shard(str(faulty / "ckpt")) == ref_pol
