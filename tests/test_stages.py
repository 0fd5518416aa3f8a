"""Tests for sinks, similarity search, multimodal plumbing, dedup
kernels and text stats."""

import json
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pytest

from ftw_crawler_ray.sinks import (
    ExtendedJSONEncoder,
    SolrConnector,
    batch_to_solr_docs,
    solr_escape,
)
from ftw_crawler_ray.stages.dedup import (
    hamming64,
    jaccard,
    minhash_signature,
    shingles,
    simhash64,
    _perm_params,
)
from ftw_crawler_ray.stages.multimodal import (
    FakeImageCodec,
    FrameSampler,
    ImageFeatures,
    ImageResizer,
    RealImageCodec,
    fake_image_bytes,
    fake_video_bytes,
)


class TestSolrSink:
    def test_escape(self):
        # reference solr.py:16-24 / test_solr.py:129-136
        assert solr_escape("a+b") == "a\\+b"
        assert solr_escape('x:"y"') == 'x\\:\\"y\\"'

    def test_json_datetime_encoding(self):
        # reference utils.py:88-95 / test_utils.py:119-131
        payload = json.dumps(
            {"modified": datetime(2014, 12, 31, 15, 45, 30)},
            cls=ExtendedJSONEncoder,
        )
        assert payload == '{"modified": "2014-12-31T15:45:30.000000Z"}'

    def test_null_fields_dropped(self):
        # key-omission semantics, reference extractors.py:137-140
        batch = pa.table(
            {"UID": ["u1"], "Description": pa.array([None], pa.string()),
             "Title": ["T"], "shard": pa.array([1], pa.int32())}
        )
        docs = batch_to_solr_docs(batch)
        assert docs == [{"UID": "u1", "Title": "T"}]

    def test_connector_requests(self):
        # reference test_solr.py:49-89 request shapes
        sent = []
        conn = SolrConnector(
            "http://localhost:8983/solr",
            transport=lambda m, u, p: sent.append((m, u, p)),
        )
        conn.index({"UID": "u1"})
        conn.delete("u1")
        assert sent[0][1] == "http://localhost:8983/solr/update?commit=true"
        assert json.loads(sent[0][2]) == [{"UID": "u1"}]
        assert json.loads(sent[1][2]) == {"delete": {"id": "u1"}}
        assert (
            conn.search_url("path_parent:foo", fl=["UID", "Title"])
            == "http://localhost:8983/solr/select?q=path_parent:foo&wt=json&fl=UID,Title"
        )


class TestDedupKernels:
    def test_shingles_deterministic(self):
        a = shingles("the quick brown fox jumps over the lazy dog", 3)
        b = shingles("the quick brown fox jumps over the lazy dog", 3)
        assert (a == b).all()

    def test_minhash_similarity_correlates_with_jaccard(self):
        a_params = _perm_params(128)
        t1 = "the quick brown fox jumps over the lazy dog " * 5
        t2 = "the quick brown fox leaps over the lazy dog " * 5
        t3 = "completely different text about databases and queries " * 5
        s1 = minhash_signature(shingles(t1, 3), *a_params)
        s2 = minhash_signature(shingles(t2, 3), *a_params)
        s3 = minhash_signature(shingles(t3, 3), *a_params)
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        assert sim12 > sim13
        assert abs(sim12 - jaccard(t1, t2, 3)) < 0.2

    def test_simhash_near_vs_far(self):
        h1 = simhash64("the quick brown fox jumps over the lazy dog")
        h2 = simhash64("the quick brown fox jumps over the lazy cat")
        h3 = simhash64("select sum from table group by key order limit")
        assert hamming64(h1, h2) < hamming64(h1, h3)
        assert hamming64(h1, h1) == 0


class TestMultimodal:
    def test_fake_image_roundtrip(self):
        payload = fake_image_bytes(7)
        w, h, pixels = FakeImageCodec().decode(payload)
        assert len(pixels) == w * h

    def test_real_codec_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            RealImageCodec().decode(b"anything")

    def test_image_features_batch(self):
        batch = pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "modality": ["image", "image"],
                "payload": pa.array(
                    [fake_image_bytes(1), fake_image_bytes(2)], pa.binary()
                ),
            }
        )
        out = ImageFeatures()(batch)
        rows = out.to_pylist()
        assert rows[0]["n_pixels"] == rows[0]["width"] * rows[0]["height"]
        assert sum(rows[0]["histogram"]) == rows[0]["n_pixels"]
        assert "payload" not in out.column_names  # projected away

    @staticmethod
    def _png_bytes(w, h):
        import struct
        import zlib

        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
        chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        return b"\x89PNG\r\n\x1a\n" + chunk

    @staticmethod
    def _jpeg_bytes(w, h):
        import struct

        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", h, w) + b"\x01\x11\x00")
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    @staticmethod
    def _gif_bytes(w, h):
        import struct

        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 5

    def test_header_parse_real_containers(self):
        from ftw_crawler_ray.stages.multimodal import parse_image_header

        assert parse_image_header(self._png_bytes(320, 240)) == ("png", 320, 240)
        assert parse_image_header(self._jpeg_bytes(640, 480)) == ("jpeg", 640, 480)
        assert parse_image_header(self._gif_bytes(17, 23)) == ("gif", 17, 23)
        assert parse_image_header(b"not an image at all") is None
        assert parse_image_header(fake_image_bytes(1)) is None

    def test_image_features_true_dimensions_for_real_formats(self):
        """The feature stage reads TRUE dimensions out of real
        PNG/JPEG/GIF containers (pure-Python header parse) while FIMG
        payloads keep full fake-pixel stats — same actor signature.
        Header-only rows get NULL pixel stats (no pixel decode without
        an image library; container-byte stats would lie), and a
        corrupt payload nulls its own row instead of failing the
        batch."""
        payloads = [self._png_bytes(320, 240), self._jpeg_bytes(640, 480),
                    self._gif_bytes(17, 23), fake_image_bytes(3),
                    b"corrupt not-an-image"]
        batch = pa.table(
            {
                "media_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "modality": ["image"] * 5,
                "payload": pa.array(payloads, pa.binary()),
            }
        )
        rows = ImageFeatures()(batch).to_pylist()
        assert (rows[0]["width"], rows[0]["height"]) == (320, 240)
        assert (rows[1]["width"], rows[1]["height"]) == (640, 480)
        assert (rows[2]["width"], rows[2]["height"]) == (17, 23)
        assert [r["format"] for r in rows] == [
            "png", "jpeg", "gif", "fimg", None]
        # header-only rows: pixel stats are honestly null
        assert rows[0]["n_pixels"] is None and rows[0]["histogram"] is None
        # fake format unchanged: pixel stats
        assert rows[3]["n_pixels"] == rows[3]["width"] * rows[3]["height"]
        # corrupt payload: nulled row, digest still emitted
        assert rows[4]["width"] is None and rows[4]["digest"]

    def test_jpeg_walker_fill_bytes_and_eoi(self):
        """Spec-legal 0xFF fill bytes before a marker must be skipped
        (not parsed as a length-bearing segment) and EOI/SOS terminate
        the walk instead of reading bogus lengths past them."""
        import struct as st

        from ftw_crawler_ray.stages.multimodal import (
            parse_image_header,
            synth_jpeg_bytes,
        )

        # synth fixture embeds a fill byte before SOF0 by construction
        assert parse_image_header(synth_jpeg_bytes(33, 44)) == ("jpeg", 33, 44)
        # double-fill before SOF0
        sof0 = (b"\xff\xc0" + st.pack(">H", 11) + b"\x08"
                + st.pack(">HH", 7, 9) + b"\x01\x11\x00")
        assert parse_image_header(
            b"\xff\xd8\xff\xff" + sof0) == ("jpeg", 9, 7)
        # EOI before any SOF: None, no bogus segment walk past it
        assert parse_image_header(b"\xff\xd8\xff\xd9\xff\xc0junk") is None
        # truncated frame header: None, not struct.error
        assert parse_image_header(b"\xff\xd8" + sof0[:6]) is None

    def test_synth_image_corpus_mix(self):
        """synth_image_bytes: ids 0/1/2 (mod 5) → real containers
        whose headers parse to the closed-form media_dims; 3/4 → FIMG."""
        from ftw_crawler_ray.stages.multimodal import (
            media_dims,
            parse_image_header,
            synth_image_bytes,
        )

        for i, fmt in [(10, "png"), (11, "jpeg"), (12, "gif")]:
            w, h = media_dims(i)
            assert parse_image_header(synth_image_bytes(i)) == (fmt, w, h)
        assert synth_image_bytes(13)[:4] == b"FIMG"
        assert synth_image_bytes(14)[:4] == b"FIMG"

    def test_resizer_shrinks(self):
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([fake_image_bytes(1)], pa.binary()),
            }
        )
        out = ImageResizer(max_side=8)(batch)
        w, h, _ = FakeImageCodec().decode(out["payload"][0].as_py())
        assert max(w, h) <= 16  # halved at least once for 16-64px inputs

    def test_frame_sampler(self):
        batch = pa.table(
            {
                "media_id": pa.array([5], pa.int64()),
                "payload": pa.array([fake_video_bytes(5, n_frames=8)], pa.binary()),
            }
        )
        out = FrameSampler(every=2)(batch)
        assert out["frame_idx"].to_pylist() == [0, 2, 4, 6]
        assert all(len(f) == 256 for f in out["frame"].to_pylist())


class TestSimilarityKernels:
    def test_normalize_and_topk_order(self):
        from ftw_crawler_ray.stages.similarity import _normalize

        m = np.array([[3.0, 4.0], [0.0, 0.0]])
        n = _normalize(m)
        assert np.allclose(np.linalg.norm(n[0]), 1.0)
        assert (n[1] == 0).all()  # zero vector stays zero, no NaN


class TestSketches:
    def test_hll_accuracy_and_merge(self):
        from ftw_crawler_ray.stages.sketches import HyperLogLog

        a, b = HyperLogLog(12), HyperLogLog(12)
        for i in range(6000):
            a.add(f"user-{i}")
        for i in range(4000, 10000):
            b.add(f"user-{i}")
        a.merge(b)
        est = a.estimate()
        assert abs(est - 10000) / 10000 < 0.05  # ~1.6% stderr at p=12

    def test_hll_roundtrip(self):
        from ftw_crawler_ray.stages.sketches import HyperLogLog

        h = HyperLogLog(10)
        for i in range(100):
            h.add(str(i))
        h2 = HyperLogLog.from_bytes(h.to_bytes())
        assert h2.estimate() == h.estimate()


class TestPackSequences:
    def test_matches_reference_packer(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from ftw_crawler_ray.stages.textstats import pack_sequences
        from ftw_crawler_ray.stages.util import part_space

        sf = "/root/testdata/sf0.001"
        window = 64
        got = pack_sequences(sf, window=window).to_pandas()

        t = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        ids = t["doc_id"].to_numpy()
        toks = {int(d): len(x.split())
                for d, x in zip(ids, t["text"].to_pylist())}
        space = part_space(16)
        parts: dict[int, list[int]] = {}
        for d in sorted(int(i) for i in ids):
            p = int((np.uint64(d) * np.uint64(2654435761))
                    % np.uint64(space))
            parts.setdefault(p, []).append(d)
        expected = {}
        for p, docs in parts.items():
            cur_seq, cur_fill = 0, 0
            for d in docs:
                n = toks[d]
                if cur_fill and cur_fill + n > window:
                    cur_seq += 1
                    cur_fill = 0
                expected[d] = (p, (p << 32) + cur_seq, cur_fill, n)
                cur_fill += n

        assert len(got) == len(ids)
        for row in got.itertuples():
            exp = expected[int(row.doc_id)]
            assert (int(row.part), int(row.seq_id),
                    int(row.seq_offset), int(row.n_tokens)) == exp

        # invariants: a sequence fits the window unless it is a
        # single over-long doc; offsets are the running sums
        agg = got.groupby("seq_id").agg(
            total=("n_tokens", "sum"), count=("n_tokens", "count"))
        over = agg[agg["total"] > window]
        assert (over["count"] == 1).all()


class TestCorpusPrep:
    def test_composition_invariants(self, ray_session, tmp_path):
        """quality gate → dedup → pack as one plan: every output doc
        passes the gate, no near/exact-dup non-representative
        survives, and the packer fit invariant holds."""
        import pyarrow.parquet as pq

        from ftw_crawler_ray.pipelines.recipe import corpus_prep
        from ftw_crawler_ray.stages.dedup import dedup_clusters

        sf = "/root/testdata/sf0.001"
        got = corpus_prep(sf, scratch_dir=str(tmp_path)).to_pandas()

        docs = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        words = docs.set_index("doc_id")["text"].str.split()
        gate = words.map(
            lambda w: len(w) >= 25
            and len(set(w)) * 1000 // len(w) >= 400 if w else False
        )
        passing = set(gate[gate].index)

        assert not got["doc_id"].duplicated().any()
        assert set(got["doc_id"]).issubset(passing)

        # dup members (cluster_id != doc_id) among gate survivors are
        # exactly the docs the gate passed but the output dropped
        clusters = dedup_clusters(
            sf,
            docs=__import__("ray").data.from_pandas(
                docs[docs.doc_id.isin(passing)]
            ),
            scratch_dir=str(tmp_path / "clu"),
        ).to_pandas()
        dropped = set(
            clusters.loc[clusters.doc_id != clusters.cluster_id, "doc_id"]
        )
        assert set(got["doc_id"]) == passing - dropped

        # fit invariant: each sequence ≤ window unless a single
        # oversized doc
        agg = got.groupby("seq_id").agg(
            total=("n_tokens", "sum"), count=("n_tokens", "count"))
        over = agg[agg["total"] > 512]
        assert (over["count"] == 1).all()


class TestGlobalShuffle:
    def test_permutation_and_determinism(self, ray_session):
        """Output is a permutation of the input ids; per-shard pos is
        dense 0..n-1 ordered by the hash; repeated runs identical."""
        import pyarrow.parquet as pq

        from ftw_crawler_ray.pipelines.recipe import global_shuffle

        sf = "/root/testdata/sf0.001"
        got = global_shuffle(sf).to_pandas()
        all_ids = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id"]
        ).to_pandas()["doc_id"]

        assert sorted(got["doc_id"]) == sorted(all_ids)
        for shard, g in got.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))
            h = (g["doc_id"].astype("uint64") * 2654435761) % 4294967296
            assert (h % 16 == shard).all()
            ordered = g.sort_values("pos")
            ho = (ordered["doc_id"].astype("uint64") * 2654435761) \
                % 4294967296
            assert ho.is_monotonic_increasing or (
                sorted(ho) == list(ho)  # ties broken by doc_id
            )

        again = global_shuffle(sf).to_pandas()
        assert got.sort_values(["shard", "pos"]).reset_index(drop=True) \
            .equals(again.sort_values(["shard", "pos"])
                    .reset_index(drop=True))


class TestLangId:
    def test_vectorized_matches_per_row_classify(self):
        """The Arrow-kernel batch path and the per-row reference
        ``classify`` must agree exactly — same dual-path invariant as
        the extraction engine — including empties, whitespace-only
        text, case folding, and tie-breaking by profile order."""
        from ftw_crawler_ray.stages.textstats import LangId

        li = LangId()
        texts = [
            "", "   ", "the quick fox and the dog",
            "der hund und die katze ist da",
            "le chat est une bête", "THE UND LE",  # 3-way tie → first
            "zz qq ww", "the und", "und the",      # 2-way ties
            "  the   fox  ",                        # edge whitespace
        ]
        batch = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
        vec = li(batch)["lang_pred"].to_pylist()
        ref = [li.classify(t) for t in texts]
        assert vec == ref
        assert ref[0] == "unknown" and ref[2] == "en" and ref[3] == "de"
