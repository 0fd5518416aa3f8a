"""Ray-session integration tests for stages not covered by the
driver gate: sitemap seed expansion, Solr payload writer, multimodal
actor pools, similarity pipeline shapes."""

import gzip
import json
import os

import pytest

SF = "/root/testdata/sf0.001"

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


class TestSitemapSeedExpansion:
    def test_frontier_from_sites(self, ray_session):
        from ftw_crawler_ray.config import Site
        from ftw_crawler_ray.sources.sitemap import frontier_from_sites

        corpus = {
            "http://a.org/sitemap.xml": (
                "text/xml",
                f'<urlset {NS}><url><loc>http://a.org/1</loc>'
                f"<priority>1.0</priority></url>"
                f"<url><loc>http://a.org/2</loc></url></urlset>".encode(),
            ),
            "http://b.org/sitemap_index.xml.gz": (
                "application/x-gzip",
                gzip.compress(
                    f'<sitemapindex {NS}><sitemap>'
                    f"<loc>http://b.org/sm1.xml</loc></sitemap>"
                    f"</sitemapindex>".encode()
                ),
            ),
            "http://b.org/sm1.xml": (
                "text/xml",
                f'<urlset {NS}><url><loc>http://b.org/x</loc>'
                f"</url></urlset>".encode(),
            ),
        }

        def fetch(url):
            if url in corpus:
                ct, body = corpus[url]
                return (200, ct, body)
            return (404, "text/html", b"nope")

        sites = [Site("http://a.org/"), Site("http://b.org/")]
        ds = frontier_from_sites(sites, fetch)
        rows = sorted(ds.take_all(), key=lambda r: r["url"])
        assert [r["url"] for r in rows] == [
            "http://a.org/1", "http://a.org/2", "http://b.org/x"
        ]
        assert rows[0]["priority"] == "1.0"
        assert rows[2]["site_seq"] == 1


class TestSolrPayloadWriter:
    def test_write_payloads(self, ray_session, tmp_path):
        from ftw_crawler_ray.pipelines.extract import extract_pipeline
        from ftw_crawler_ray.sinks import write_solr_payloads

        ds = extract_pipeline(SF).limit(50)
        n = write_solr_payloads(ds, str(tmp_path))
        assert n == 50
        files = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
        assert files
        docs = json.load(open(tmp_path / files[0]))
        assert "UID" in docs[0]
        # null optional fields dropped, datetimes ISO-encoded
        assert all("Description" not in d or d["Description"] is not None
                   for d in docs)
        assert docs[0]["modified"].endswith("Z")


class TestMultimodalPipelines:
    def test_image_features_pipeline(self, ray_session):
        from ftw_crawler_ray.stages.multimodal import image_features

        df = image_features(SF).to_pandas()
        assert len(df) == 500
        fimg = df[df["format"] == "fimg"]
        real = df[df["format"] != "fimg"]
        assert len(fimg) == 200 and len(real) == 300  # doc_id % 5 mix
        assert (fimg["n_pixels"] == fimg["width"] * fimg["height"]).all()
        assert real["n_pixels"].isna().all()  # header-only: no pixel stats
        assert (df["width"] >= 16).all() and (df["width"] < 64).all()

    def test_frame_sampling_pipeline(self, ray_session):
        from ftw_crawler_ray.stages.multimodal import sampled_frames

        df = sampled_frames(SF, every=4).to_pandas()
        assert set(df["frame_idx"].unique()) == {0, 4}


class TestSimilarityPipelines:
    def test_ann_self_is_rank0(self, ray_session):
        from ftw_crawler_ray.stages.similarity import ann_topk

        df = ann_topk(SF, query_ids=[3], k=5).to_pandas()
        assert len(df) == 5
        top = df[df["rank"] == 0].iloc[0]
        assert top["vec_id"] == 3  # self-similarity 1.0 wins
        assert top["sim"] == pytest.approx(1.0)

    def test_lsh_buckets_shape(self, ray_session):
        from ftw_crawler_ray.stages.similarity import lsh_buckets

        df = lsh_buckets(SF).to_pandas()
        assert len(df) == 500
        assert df["bucket"].between(0, 2**16 - 1).all()

    def test_ivf_topk_recall_and_exhaustive_equality(self, ray_session):
        """IVF probe path: exhaustive probe equals the exact scan
        exactly; approximate probe (8/16 cells) holds the pinned
        recall on the (near-uniform) synthetic vectors."""
        from ftw_crawler_ray.stages.similarity import ann_topk, ivf_topk

        qs = [0, 1, 2, 3, 4]
        exact = ann_topk(SF, qs, k=10).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        full = ivf_topk(SF, qs, k=10, n_probe=16).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        assert exact.equals(full[exact.columns])

        approx = ivf_topk(SF, qs, k=10, n_probe=8).to_pandas()
        es = set(zip(exact.query_id, exact.vec_id))
        as_ = set(zip(approx.query_id, approx.vec_id))
        assert len(es & as_) / len(es) >= 0.8

    def test_ivf_topk_multi_file_cells_partition_filter(self, ray_session,
                                                        tmp_path):
        """The probe-pruned read goes through read_parquet +
        PathPartitionFilter (object-store portable, no local glob) and
        must handle cells made of SEVERAL parquet files."""
        import glob
        import os

        from ftw_crawler_ray.stages.similarity import (
            ann_topk,
            build_ivf_index,
            ivf_topk,
        )

        index_dir = str(tmp_path / "ivf")
        build_ivf_index(SF, index_dir)
        # split every cell's single file in two → multi-file cells
        import pyarrow.parquet as pq

        for f in glob.glob(f"{index_dir}/cell=*/*.parquet"):
            t = pq.read_table(f)
            half = max(1, t.num_rows // 2)
            pq.write_table(t.slice(0, half), f)
            pq.write_table(t.slice(half), f.replace(".parquet", "-b.parquet"))
        assert any(
            len(glob.glob(f"{d}/*.parquet")) >= 2
            for d in glob.glob(f"{index_dir}/cell=*")
        )

        qs = [0, 1, 2]
        exact = ann_topk(SF, qs, k=10).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        full = ivf_topk(SF, qs, k=10, n_probe=16,
                        index_dir=index_dir).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        assert exact.equals(full[exact.columns])

    def test_lsh_near_dups_matches_brute_force(self, ray_session):
        """Bucketed LSH + exact verify vs the all-pairs twin: at the
        driver-pinned parameters recall is 1.0 on this corpus and
        precision is exact by construction — identical pair sets."""
        from ftw_crawler_ray.stages.similarity import (
            lsh_near_dups,
            near_dup_pairs,
        )

        brute = near_dup_pairs(SF, threshold=0.4).to_pandas()
        lsh = lsh_near_dups(
            SF, threshold=0.4, n_bands=64, planes_per_band=4
        ).to_pandas()
        bs = set(zip(brute.vec_a, brute.vec_b))
        ls = set(zip(lsh.vec_a, lsh.vec_b))
        assert bs and ls == bs
        assert (lsh["sim"] >= 0.4).all()


class TestCorpusDiagnostics:
    def test_repeated_ngrams_counts_distinct_docs(self, ray_session):
        from ftw_crawler_ray.stages.textstats import repeated_ngrams

        df = repeated_ngrams(SF, k=5, min_docs=2).to_pandas()
        assert len(df) > 0
        assert (df["n_docs"] >= 2).all()
        # every reported gram is a real 5-word sequence
        assert df["gram"].str.split().str.len().eq(5).all()

    def test_decontaminate_flags_needle_overlap_only(self, ray_session):
        from ftw_crawler_ray.stages.textstats import decontaminate

        df = decontaminate(SF, k=5, modulus=97).to_pandas()
        assert (df["doc_id"] % 97 != 0).all()  # needles never flagged
        assert (df["n_hits"] >= 1).all()


class TestBroadcastJoin:
    def test_broadcast_equals_shuffle_join(self, ray_session):
        """J1 broadcast variant (lookup built in a worker task) must
        equal the hash-shuffle join row for row."""
        import pandas as pd

        from ftw_crawler_ray.stages.incremental import join_index_state

        a = join_index_state(SF, broadcast=False).to_pandas().sort_values(
            "url", ignore_index=True
        )
        b = join_index_state(SF, broadcast=True).to_pandas().sort_values(
            "url", ignore_index=True
        )
        pd.testing.assert_frame_equal(a, b[a.columns])


class TestDedupPipelines:
    def test_connected_components_matches_union_find(self, ray_session):
        """Distributed min-label propagation vs a local union-find on
        a graph with a chain (forces >1 propagation round), a
        triangle, and a singleton edge."""
        import ray.data

        from ftw_crawler_ray.stages.dedup import connected_components

        edges = [(1, 2), (2, 3), (3, 4), (4, 5),      # chain 1-5
                 (10, 11), (11, 12), (10, 12),        # triangle
                 (20, 21)]
        pairs = ray.data.from_items(
            [{"doc_a": a, "doc_b": b} for a, b in edges]
        )
        got = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(pairs).take_all()
        )
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        ref = sorted((d, find(d)) for d in parent)
        assert got == ref
        assert dict(got)[5] == 1  # chain end reached the min label

    def test_connected_components_long_chain_pointer_doubling(
            self, ray_session):
        """A 40-hop chain converges well under 40 rounds (pointer
        doubling → O(log diameter) rounds); and exhausting max_iter
        raises instead of silently returning wrong cluster ids."""
        import pytest as _pytest
        import ray.data

        from ftw_crawler_ray.stages.dedup import connected_components

        edges = [(i, i + 1) for i in range(1, 41)]       # path 1..41
        pairs = ray.data.from_items(
            [{"doc_a": a, "doc_b": b} for a, b in edges]
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs, max_iter=12).take_all()
        }
        assert got == {i: 1 for i in range(1, 42)}

        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iter=2).take_all()

    def test_minhash_verified_precision(self, ray_session):
        from ftw_crawler_ray.stages.dedup import minhash_verified_pairs

        df = minhash_verified_pairs(SF, threshold=0.8).to_pandas()
        assert len(df) > 0
        assert (df["jaccard"] >= 0.8).all()
        assert (df["doc_a"] < df["doc_b"]).all()

    def test_simhash_near_dups_within_radius(self, ray_session):
        from ftw_crawler_ray.stages.dedup import (
            hamming64,
            simhash_near_dups,
            simhash_table,
        )

        table = simhash_table(SF).to_pandas()
        by_id = dict(zip(table.doc_id, table.simhash))
        df = simhash_near_dups(SF, radius=3).to_pandas()
        assert len(df) > 0
        for _, r in df.iterrows():
            assert hamming64(int(by_id[r.doc_a]), int(by_id[r.doc_b])) == r.hamming
            assert r.hamming <= 3


class TestFetchVariants:
    def test_join_and_pool_agree(self, ray_session):
        """fetch_stage (hash join, API parity) and fetch_pool (actor
        pool, production path) must fetch the same url set with the
        same statuses."""
        import pandas as pd

        from ftw_crawler_ray.pipelines.crawl import (
            fetch_pool,
            fetch_stage,
            scheduled_frontier,
        )

        sched = scheduled_frontier(SF, num_shards=4)
        a = fetch_stage(sched, SF).to_pandas()
        sched2 = scheduled_frontier(SF, num_shards=4)
        b = fetch_pool(sched2, SF).to_pandas()
        a = a.sort_values("url", ignore_index=True)
        b = b.sort_values("url", ignore_index=True)
        assert list(a["url"]) == list(b["url"])
        assert list(a["fetch_status"]) == list(b["fetch_status"])
        assert list(a["html"]) == list(b["html"])

    def test_missing_url_quarantined(self, ray_session):
        import pyarrow as pa

        from ftw_crawler_ray.pipelines.crawl import FetchActor

        actor = FetchActor(SF)
        batch = pa.table(
            {
                "url": ["http://h1.example.org/docs/page-1",
                        "http://nowhere.example.org/docs/page-99999999"],
                "lastmod": [None, None],
                "shard": pa.array([0, 0], pa.int32()),
                "seq": pa.array([1, 2], pa.int64()),
                "fetch_order": pa.array([0, 1], pa.int64()),
            }
        )
        out = actor(batch)
        by_url = {r["url"]: r for r in out.to_pylist()}
        assert by_url["http://h1.example.org/docs/page-1"]["fetch_status"] == "fetched"
        missing = by_url["http://nowhere.example.org/docs/page-99999999"]
        assert missing["fetch_status"] == "missing"
        assert missing["html"] is None

    def test_vectorized_fetch_matches_row_helpers(self):
        """The searchsorted/modular-arithmetic fetch path must agree
        with the scalar helpers (_doc_id_of / fetch_status_of) for
        every status, across replicas, and on malformed urls."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ftw_crawler_ray.pipelines.crawl import (
            FetchActor, _doc_id_of, fetch_status_of,
        )
        from ftw_crawler_ray.sources.pages import REPLICA_OFFSET

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
        base = t["doc_id"].to_pylist()
        texts = dict(zip(base, t["text"].to_pylist()))
        err = next((b for b in base if b % 101 == 0), base[0])
        red = next((b for b in base if b % 103 == 0 and b % 101), base[1])
        ids = [base[0], base[1] + REPLICA_OFFSET,
               base[2] + 7 * REPLICA_OFFSET, err, red,
               err + 3 * REPLICA_OFFSET, 999_999_999]
        urls = [f"http://h{i % 41}.example.org/docs/page-{i}"
                for i in ids] + [
            "http://h0.example.org/not-a-doc",
            # int64-overflow digit run: quarantined 'missing', never
            # an ArrowInvalid task crash
            "http://h0.example.org/docs/page-"
            "99999999999999999999999999",
        ]
        n = len(urls)
        batch = pa.table({
            "url": pa.array(urls),
            "lastmod": pa.array([None] * n, pa.string()),
            "shard": pa.array([0] * n, pa.int64()),
            "seq": pa.array(list(range(n)), pa.int64()),
            "fetch_order": pa.array(list(range(n)), pa.int64()),
        })
        out = FetchActor(SF)(batch)
        assert out.num_rows == n
        for u, st in zip(out["url"].to_pylist(),
                         out["fetch_status"].to_pylist()):
            d = _doc_id_of(u)
            body = texts.get(d % REPLICA_OFFSET) if d >= 0 else None
            expected = "missing" if body is None else fetch_status_of(d)
            assert st == expected, (u, st, expected)
        # present rows precede missing rows inside a batch (the
        # contract the concat in FetchActor.__call__ preserves)
        sts = out["fetch_status"].to_pylist()
        first_missing = sts.index("missing")
        assert all(s == "missing" for s in sts[first_missing:])


class TestCuckooCrawl:
    def test_crawl_with_cuckoo_seen_mode(self, ray_session, tmp_path):
        from ftw_crawler_ray.pipelines.crawl import crawl

        s = crawl(SF, out_dir=str(tmp_path), num_shards=2,
                  checkpoint_dir=str(tmp_path / "ckpt"), seen_mode="cuckoo")
        assert s["plan_counts"]["scheduled"] >= 370  # tiny FP rate allowed
        s2 = crawl(SF, out_dir=str(tmp_path / "again"), num_shards=2,
                   checkpoint_dir=str(tmp_path / "ckpt"), seen_mode="cuckoo")
        assert s2["plan_counts"] == {"dup": 416, "purge": 46}


class TestPurgeToDelete:
    def test_tombstones_drive_solr_deletes(self, ray_session, tmp_path):
        """J2 output → SolrConnector.delete per tombstone (reference
        purging.py:27-29, batched per block here)."""
        import json as _json

        import pyarrow.dataset as pads

        from ftw_crawler_ray.sinks import SolrConnector
        from ftw_crawler_ray.stages.purge import purge_candidates

        purge_candidates(SF).write_parquet(str(tmp_path / "purged"))
        sent = []
        conn = SolrConnector("http://solr:8983/solr",
                             transport=lambda m, u, p: sent.append(p))
        uids = pads.dataset(str(tmp_path / "purged")).to_table(
            columns=["uid"]
        )["uid"].to_pylist()
        for uid in uids:
            conn.delete(uid)
        assert len(sent) == 46
        assert _json.loads(sent[0])["delete"]["id"] == uids[0]


class TestTrainingRecipe:
    def test_training_mix_predicates(self, ray_session):
        """The composite recipe's rows satisfy every ingredient
        predicate, and it's a strict subset of the plain mix."""
        from ftw_crawler_ray.pipelines.recipe import training_mix
        from ftw_crawler_ray.stages.textstats import source_mix

        df = training_mix(SF).to_pandas()
        assert len(df) > 0
        assert (df["n_tokens"].between(40, 2000)).all()
        assert set(df["lang_pred"]) <= {"en", "de", "fr"}
        assert (df["doc_id"] % 97 != 0).all()
        mixed = set(source_mix(SF).to_pandas()["doc_id"])
        assert set(df["doc_id"]) <= mixed


class TestDedupComposition:
    def test_exact_first_collapses_cliques(self, ray_session, tmp_path):
        """dedup_clusters on a corpus with 3-way exact-dup cliques:
        every clique clusters to its min doc_id, near-dups of the
        KEEPERS still link across cliques, and the result covers all
        members."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ftw_crawler_ray.stages.dedup import dedup_clusters

        src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
        reps = []
        for rep in range(3):
            t = src.set_column(
                src.column_names.index("doc_id"), "doc_id",
                pa.compute.add(src["doc_id"], rep * 1_000_003),
            )
            reps.append(t)
        pq.write_table(pa.concat_tables(reps),
                       str(tmp_path / "documents.parquet"))

        rows = dedup_clusters(str(tmp_path)).take_all()
        by_doc = {r["doc_id"]: r["cluster_id"] for r in rows}
        # every doc is in some cluster (3-way exact dups everywhere)
        assert len(by_doc) == 3 * src.num_rows
        # each replica clusters with its base doc
        for base in (0, 1, 2, 10):
            assert by_doc[base + 1_000_003] == by_doc[base]
            assert by_doc[base + 2 * 1_000_003] == by_doc[base]
        # cluster label is the component minimum
        assert all(c <= d for d, c in by_doc.items())


class TestBoilerplateRemoval:
    @staticmethod
    def _write_corpus(tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        boiler = "subscribe to our newsletter for weekly updates now"
        texts = [f"unique document body number {i} " + boiler
                 for i in range(6)] + ["a fully unique document body here"]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(7), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            str(tmp_path / "documents.parquet"),
        )

    @pytest.mark.parametrize("budget", [4_000_000, 0],
                             ids=["broadcast", "semijoin"])
    def test_strip_removes_shared_passages_only(self, ray_session, tmp_path,
                                                budget):
        from ftw_crawler_ray.stages.textstats import strip_repeated_ngrams

        self._write_corpus(tmp_path)
        df = strip_repeated_ngrams(
            str(tmp_path), k=5, min_docs=5, broadcast_budget=budget
        ).to_pandas()
        by = df.set_index("doc_id")
        # the shared passage vanished from every sharing doc
        for i in range(6):
            assert "newsletter" not in by.loc[i, "clean_text"]
            assert f"number {i}" in by.loc[i, "clean_text"]
            assert by.loc[i, "n_removed"] >= 8
        # the unique doc is untouched
        assert by.loc[6, "clean_text"] == "a fully unique document body here"
        assert by.loc[6, "n_removed"] == 0

    def test_broadcast_and_semijoin_paths_identical(self, ray_session,
                                                    tmp_path):
        """budget=0 forces the hash-partition semi-join (the web-scale
        path, no driver take_all of the hot set); it must emit rows
        identical to the broadcast fast path."""
        import pandas as pd

        from ftw_crawler_ray.stages.textstats import strip_repeated_ngrams

        self._write_corpus(tmp_path)
        a = (strip_repeated_ngrams(str(tmp_path), k=5, min_docs=5)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (strip_repeated_ngrams(str(tmp_path), k=5, min_docs=5,
                                   broadcast_budget=0)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert a["n_removed"].sum() > 0  # the corpus really has boilerplate


class TestAttachColumn:
    """Direct unit coverage of the fixed-partition lookup join —
    inner vs left semantics, list payloads, unmatched keys."""

    @staticmethod
    def _join(how):
        import pyarrow as pa
        import ray.data

        from ftw_crawler_ray.stages.util import attach_column

        items = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, 2, 3, 4], pa.int64()),
             "name": pa.array(["a", "b", "c", "d"], pa.string())}
        ))
        lookup = ray.data.from_arrow(pa.table(
            {"k": pa.array([2, 4, 9], pa.int64()),
             "vals": pa.array([[20, 21], [40], [90]],
                              pa.list_(pa.int32()))}
        ))
        rows = attach_column(
            items, lookup, item_key="k", lookup_key="k",
            payload_col="vals", out_col="vals",
            item_schema=pa.schema([("k", pa.int64()),
                                   ("name", pa.string())]),
            payload_type=pa.list_(pa.int32()), num_parts=4, how=how,
        ).take_all()  # take_all: Ray's to_pandas TensorArray cast
        # rejects list columns mixing nulls and arrays
        return sorted(rows, key=lambda r: r["k"])

    def test_inner_drops_unmatched(self, ray_session):
        out = self._join("inner")
        assert [r["k"] for r in out] == [2, 4]
        assert [list(r["vals"]) for r in out] == [[20, 21], [40]]

    def test_left_keeps_unmatched_with_null_payload(self, ray_session):
        out = self._join("left")
        assert [r["k"] for r in out] == [1, 2, 3, 4]
        assert [r["name"] for r in out] == ["a", "b", "c", "d"]
        vals = [None if r["vals"] is None else list(r["vals"]) for r in out]
        assert vals == [None, [20, 21], None, [40]]


class TestTopkPerSource:
    """topk_per_source_ds: the per-batch local top-k + fixed-partition
    merge lowering must match a pandas reference exactly (order by
    n_chars DESC, doc_id ASC; rank 0-based) even when one source owns
    ~all rows and rows are spread over many blocks."""

    def test_matches_pandas_reference_under_skew(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from ftw_crawler_ray.stages.textstats import topk_per_source_ds

        n = 20_000
        ids = np.arange(n, dtype=np.int64)
        src = np.where(
            ids % 10 != 9, "hot",
            np.char.add("src", (ids % 7).astype(str)),
        )
        # ties on purpose: n_chars has only 50 distinct values
        n_chars = (ids * 2654435761) % 50
        t = pa.table(
            {"doc_id": pa.array(ids), "source": pa.array(src),
             "n_chars": pa.array(n_chars.astype(np.int64))}
        )
        docs = ray.data.from_arrow(t).repartition(32)
        got = (
            topk_per_source_ds(docs, k=3, num_parts=8)
            .to_pandas()
            .sort_values(["source", "rank"])
            .reset_index(drop=True)
        )
        df = t.to_pandas()
        df = df.sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
        )
        df["rank"] = df.groupby("source").cumcount()
        want = df[df["rank"] < 3].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["doc_id", "source", "n_chars", "rank"]],
            want[["doc_id", "source", "n_chars", "rank"]],
        )


class TestDedupScratchReuse:
    def test_dedup_clusters_same_scratch_dir_twice(self, ray_session,
                                                   tmp_path):
        """Reusing ONE scratch_dir across invocations must not re-read
        stale staged files from the earlier run (each call stages into
        a fresh unique subdirectory)."""
        from ftw_crawler_ray.stages.dedup import dedup_clusters

        sd = str(tmp_path / "run_scratch")

        def run():
            rows = dedup_clusters(SF, scratch_dir=sd).take_all()
            return sorted((r["doc_id"], r["cluster_id"]) for r in rows)

        first = run()
        second = run()
        assert first == second
        assert len(first) > 0
