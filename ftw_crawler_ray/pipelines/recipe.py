"""Training-data recipe — the composition showpiece: one streaming
filter chain turning a raw document table into a training mix.

    documents ──► quality bounds (token count)
              ──► language id (stopword argmax)
              ──► benchmark decontamination (needle-gram overlap)
              ──► weighted deterministic source mix
              ──► (doc_id, source, lang_pred, n_tokens)

Every step is doc-wise, so the WHOLE recipe is one ``map_batches``
actor chain with a single broadcast (the needle gram-hash set) and
ZERO shuffles — the shape a 100 TB filter pass must have. Each
ingredient is independently oracle-checked elsewhere
(quality_scores, lang_id, decontaminate, source_mix); the composite
has its own SQL oracle assembled from the same formulas.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..stages.util import sized_read_parquet

from ..stages.textstats import LangId, _needle_gram_hashes


def training_mix(
    sf_dir: str,
    min_tokens: int = 40,
    max_tokens: int = 2000,
    keep_langs: tuple = ("en", "de", "fr"),
    contamination_modulus: int = 97,
    shingle_k: int = 5,
) -> ray.data.Dataset:
    needles_ref = _needle_gram_hashes.remote(
        f"{sf_dir}/documents.parquet", shingle_k, contamination_modulus
    )
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    langs = frozenset(keep_langs)

    class RecipeFilter:
        def __init__(self):
            from ..stages.dedup import MinHasher

            self.langid = LangId()
            self.needles = None
            self.cache: dict[str, int] = {}
            self._cache_limit = MinHasher._CACHE_LIMIT

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages.dedup import shingles

            if self.needles is None:
                self.needles = ray.get(needles_ref)
            if len(self.cache) > self._cache_limit:
                self.cache.clear()
            ids, srcs, preds, toks = [], [], [], []
            for doc_id, text, source in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
                batch["source"].to_pylist(),
            ):
                if doc_id % contamination_modulus == 0:
                    continue  # the benchmark itself never trains
                n_tokens = len(text.split())
                if not (min_tokens <= n_tokens <= max_tokens):
                    continue
                lang = self.langid.classify(text)
                if lang not in langs:
                    continue
                if set(shingles(text, shingle_k, self.cache).tolist()) \
                        & self.needles:
                    continue  # contaminated
                weight = (int(source[3:]) * 7 + 10) % 100
                if (doc_id * 2654435761) % 4294967296 % 100 >= weight:
                    continue  # deterministic mix
                ids.append(doc_id)
                srcs.append(source)
                preds.append(lang)
                toks.append(n_tokens)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "source": pa.array(srcs, pa.string()),
                    "lang_pred": pa.array(preds, pa.string()),
                    "n_tokens": pa.array(toks, pa.int64()),
                }
            )

    return docs.map_batches(
        RecipeFilter, batch_format="pyarrow", batch_size=None,
        concurrency=(1, 4),
    )


def corpus_prep(
    sf_dir: str,
    min_tokens: int = 25,
    min_distinct_x1000: int = 400,
    threshold: float = 0.8,
    window: int = 512,
    scratch_dir: "str | None" = None,
) -> ray.data.Dataset:
    """END-TO-END pretraining corpus prep — the full composition a
    100 TB pipeline actually runs:

        documents ──► quality gate (token count + distinct-token
                      ratio; the quality_scores integer formulas)
                  ──► dedup_clusters over the SURVIVORS (exact-first
                      + MinHash-verified near-dups; keep each
                      cluster's representative = min doc_id)
                  ──► pack_sequences (greedy fixed-token-window
                      packing of what remains)

    Scale shape: the quality gate is a stateless zero-shuffle
    map; it re-executes per downstream consumer instead of
    materializing (cheap recompute beats a corpus-sized pin). Text
    flows ONLY into the dedup stage; the drop-list anti-join and the
    packer move (doc_id, n_tokens) int rows, so the wide shuffles
    after dedup are token-count-sized, not corpus-sized. The
    anti-join is stages/util.attach_column ``how="left"`` with a
    null-flag filter (the hash-join shape, not Dataset.join — see
    CLAUDE.md).

    Execution timing: the dedup stage Parquet-stages its groups and
    keeper texts EAGERLY at call time (multi-consumer staging without
    an object-store pin — dedup_clusters docstring), so this function
    blocks for the dedup prefix; the returned packed dataset itself
    is lazy.

    Output: (doc_id, part, seq_id, seq_offset, n_tokens) — one row
    per kept document, the training-batcher assignment. SQL oracle:
    the ``corpus_prep`` entry in __ray_entry__.py chains the same
    quality / cluster / pack formulas."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.dedup import dedup_clusters
    from ..stages.textstats import pack_sequences
    from ..stages.util import attach_column

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _quality_mask(batch: pa.Table):
        """ONE shared kernel for both quality consumers: each text is
        split exactly once, emitting (keep, n_tokens) — no token-list
        materialization, no second tokenization pass."""
        n = batch.num_rows
        keep = np.empty(n, dtype=bool)
        n_tok = np.empty(n, dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            w = t.split()
            n_tok[i] = len(w)
            keep[i] = bool(w) and len(w) >= min_tokens and (
                len(set(w)) * 1000 // len(w) >= min_distinct_x1000
            )
        return keep, n_tok

    def qfilter_text(batch: pa.Table) -> pa.Table:
        keep, _ = _quality_mask(batch)
        return batch.filter(pa.array(keep))

    def qfilter_tokens(batch: pa.Table) -> pa.Table:
        keep, n_tok = _quality_mask(batch)
        return pa.table(
            {"doc_id": batch["doc_id"].filter(pa.array(keep)),
             "n_tokens": pa.array(n_tok[keep], pa.int64())}
        )

    filtered_text = docs.map_batches(
        qfilter_text, batch_format="pyarrow", batch_size=None
    )
    filtered_tokens = docs.map_batches(
        qfilter_tokens, batch_format="pyarrow", batch_size=None
    )

    clusters = dedup_clusters(
        sf_dir, threshold, scratch_dir=scratch_dir, docs=filtered_text
    )

    def drop_list(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("dup", pa.int8())]
        ).empty_table()
        if batch.num_rows == 0 or "cluster_id" not in batch.column_names:
            return empty
        dups = batch.filter(
            pc.not_equal(batch["doc_id"], batch["cluster_id"])
        )
        return pa.table(
            {"doc_id": dups["doc_id"],
             "dup": pa.array(np.ones(dups.num_rows, np.int8), pa.int8())}
        )

    drops = clusters.map_batches(
        drop_list, batch_format="pyarrow", batch_size=None
    )

    flagged = attach_column(
        filtered_tokens, drops,
        item_key="doc_id", lookup_key="doc_id",
        payload_col="dup", out_col="dup",
        item_schema=pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64())]
        ),
        payload_type=pa.int8(),
        how="left",
    )
    survivors = flagged.map_batches(
        lambda t: t.filter(pc.is_null(t["dup"])).drop(["dup"])
        if t.num_rows and "dup" in t.column_names
        else pa.schema([("doc_id", pa.int64()),
                        ("n_tokens", pa.int64())]).empty_table(),
        batch_format="pyarrow", batch_size=None,
    )

    return pack_sequences(sf_dir, window, docs=survivors)


def global_shuffle(sf_dir: str, n_shards: int = 16) -> ray.data.Dataset:
    """Deterministic global shuffle — the write-side scatter a
    training pipeline runs before sharding the corpus to disk.

    ``ray.data.Dataset.random_shuffle`` is the wrong tool at 100 TB:
    it is a full materializing all-to-all with non-reproducible
    output (resume = reshuffle the world). This op instead assigns
    every doc a HASH position: ``h = doc_id·2654435761 mod 2³²``
    (the Knuth scatter used across this repo), ``shard = h mod
    n_shards``, ``pos`` = rank of (h, doc_id) within the shard. One
    fixed-partition int-row shuffle, independent of payload size;
    deterministic, so a failed write can re-derive any shard alone
    and the shard ↔ content mapping is stable across runs. Payload
    columns re-attach by doc_id at write time (util.attach_column)
    instead of riding the scatter.

    Output: (doc_id, shard, pos). SQL oracle: the same hash +
    ``row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)``."""
    import numpy as np

    from ..stages.util import partitioned_groups

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    mid = pa.schema(
        [("doc_id", pa.int64()), ("h", pa.int64()), ("__part", pa.int32())]
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("shard", pa.int32()), ("pos", pa.int64())]
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return mid.empty_table()
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(4294967296)
        part = (h % np.uint64(n_shards)).astype(np.int32)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "h": pa.array(h.astype(np.int64), pa.int64()),
             "__part": pa.array(part, pa.int32())},
            schema=mid,
        )

    def order(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return out_schema.empty_table()
        ids = group["doc_id"].to_numpy().astype(np.int64)
        h = group["h"].to_numpy().astype(np.int64)
        shard = np.int32(group["__part"][0].as_py())
        o = np.lexsort((ids, h))
        return pa.table(
            {"doc_id": pa.array(ids[o], pa.int64()),
             "shard": pa.array(
                 np.full(len(ids), shard, np.int32), pa.int32()),
             "pos": pa.array(np.arange(len(ids), dtype=np.int64),
                             pa.int64())},
            schema=out_schema,
        )

    return partitioned_groups(
        docs.map_batches(tag, batch_format="pyarrow", batch_size=None),
        order, mid_schema=mid, num_parts=n_shards,
    )


def split_dataset(sf_dir: str, val_pct: int = 5,
                  test_pct: int = 5) -> ray.data.Dataset:
    """Deterministic train/val/test assignment, stratified by source.
    The split hash is ``((doc_id+1)·2654435761 mod 2³²) mod 100`` —
    the repo's Knuth scatter, salted with +1 so the split decision is
    decorrelated from the source-mix sampling decision (training_mix
    uses the unsalted identical formula; without the salt, every
    mix-sampled doc would also land in the same split band).
    Stratification is free: the hash is uniform within every source,
    so each stratum splits at the same rates with no shuffle — the
    whole op is one stateless zero-shuffle map, the 100 TB shape.
    Output: (doc_id, source, split ∈ {'train','val','test'}).

    SQL oracle: the same salted hash + CASE ladder."""
    import numpy as np

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    lo_test = 100 - test_pct
    lo_val = lo_test - val_pct

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        b = (
            ((ids + 1).astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(4294967296) % np.uint64(100)
        ).astype(np.int64)
        split = np.where(
            b >= lo_test, "test", np.where(b >= lo_val, "val", "train")
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "source": batch["source"],
             "split": pa.array(split.tolist(), pa.string())}
        )

    return docs.map_batches(assign, batch_format="pyarrow",
                            batch_size=None)
