"""Text analysis stages over ``documents``: token counting, quality
scoring, language-ID, document fingerprinting (training-data-pipeline
operators; SURVEY-level capability extensions)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

from .util import part_space, partitioned_groups, stateful, sized_read_parquet

_WORD = re.compile(r"\w+", re.UNICODE)

# tiny per-language stopword profiles for the n-gram/stopword
# heuristic language id (public-knowledge lists)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pas"},
}


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token count per document — vectorized-ish batch
    kernel (C-level str.split per row)."""
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def count(batch: pa.Table) -> pa.Table:
        n = [len(t.split()) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())}
        )

    return docs.map_batches(count, batch_format="pyarrow", batch_size=None)


# BPE-ish pretokenizer: letter runs | single digits | punctuation runs
# (GPT-2-style shape, restricted to a regex dialect identical in
# Python re and DuckDB RE2 so the oracle can reproduce counts)
_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+")


def token_counts_bpe(sf_dir: str) -> ray.data.Dataset:
    """Subword-style token counting (compiled regex per process;
    the pattern is module-level so actor/task setup is free)."""
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def count(batch: pa.Table) -> pa.Table:
        n = [len(_BPE_ISH.findall(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(n, pa.int64())}
        )

    return docs.map_batches(count, batch_format="pyarrow", batch_size=None)


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Quality-signal integers per doc: char/token counts, mean token
    length (×1000, integer — exact cross-engine comparison), distinct
    token ratio (×1000)."""
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def score(batch: pa.Table) -> pa.Table:
        n_chars, n_tokens, mean_len_x1000, distinct_x1000 = [], [], [], []
        for t in batch["text"].to_pylist():
            toks = t.split()
            n_chars.append(len(t))
            n_tokens.append(len(toks))
            if toks:
                mean_len_x1000.append(
                    int(sum(len(w) for w in toks) * 1000) // len(toks)
                )
                distinct_x1000.append(len(set(toks)) * 1000 // len(toks))
            else:
                mean_len_x1000.append(0)
                distinct_x1000.append(0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "mean_token_len_x1000": pa.array(mean_len_x1000, pa.int64()),
                "distinct_ratio_x1000": pa.array(distinct_x1000, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


class LangId:
    """Stopword-profile language id. The batch path is fully
    vectorized (Arrow lower/split/is_in kernels + one bincount per
    language — no per-row Python word loop); ``classify`` stays as
    the per-row reference/plugin surface and the two are
    equivalence-tested. Stopword value-set arrays are built once per
    worker (``stateful`` wrapping keeps __init__-once semantics)."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}
        self.langs = np.array(list(self.profiles), dtype=object)
        self._stop_arrays = [
            pa.array(sorted(v), pa.string()) for v in self.profiles.values()
        ]

    def classify(self, text: str) -> str:
        words = text.lower().split()
        if not words:
            return "unknown"
        best_lang, best = "unknown", 0
        for lang, stops in self.profiles.items():
            hits = sum(1 for w in words if w in stops)
            if hits > best:
                best_lang, best = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(batch["text"].combine_chunks())
        )
        # flat token array + row ownership (run lengths off the list
        # offsets); stray empty tokens from edge whitespace can't hit
        # a stopword set, so they never affect the counts
        offs = toks.offsets.to_numpy()
        row_of = np.repeat(np.arange(n), np.diff(offs))
        counts = np.zeros((n, len(self._stop_arrays)), dtype=np.int64)
        for j, stops in enumerate(self._stop_arrays):
            hit = pc.is_in(toks.values, value_set=stops).to_numpy(
                zero_copy_only=False
            )
            counts[:, j] = np.bincount(row_of[hit], minlength=n)
        # argmax = first max index = the classify() iteration order
        best = counts.argmax(axis=1) if n else np.zeros(0, np.int64)
        preds = np.where(counts.max(axis=1) > 0 if n else [],
                         self.langs[best], "unknown")
        return batch.append_column(
            "lang_pred", pa.array(preds.astype(object), pa.string())
        )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(
        stateful(LangId), batch_format="pyarrow", batch_size=None
    ).select_columns(["doc_id", "lang", "lang_pred"])


def _topk_select(sources: np.ndarray, n_chars: np.ndarray,
                 ids: np.ndarray, k: int):
    """Indices of the top-k rows per source segment plus each kept
    row's 0-based rank. Order within a source: n_chars DESC, doc_id
    ASC (ties). ``sources`` is any comparable numpy array (dictionary
    codes or strings)."""
    order = np.lexsort((ids, -n_chars, sources))
    s = sources[order]
    n = len(s)
    new_seg = np.r_[True, s[1:] != s[:-1]]
    starts = np.nonzero(new_seg)[0]
    seg = np.cumsum(new_seg) - 1
    pos = np.arange(n) - starts[seg]
    keep = pos < k
    return order[keep], pos[keep]


def topk_docs_per_source(sf_dir: str, k: int = 3,
                         num_parts: int = 64) -> ray.data.Dataset:
    """Top-k longest documents per source.

    NOT ``groupby("source").map_groups``: that hands ALL rows of a
    source to one task — unbounded at scale (one dominant source =
    one task holding billions of rows). Instead: per-batch LOCAL
    top-k (≤ k rows per source survive each batch) → fixed
    ``num_parts`` shuffle keyed on hash(source) → the same top-k per
    partition. The merge input is ≤ k × n_batches rows per source, so
    no task ever sees a whole source (the ``util.grouped_agg``
    pattern; cf. stages/window.py ``_keyed_window_agg``)."""
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return topk_per_source_ds(docs, k=k, num_parts=num_parts)


def topk_per_source_ds(docs: ray.data.Dataset, k: int = 3,
                       num_parts: int = 64) -> ray.data.Dataset:
    """Dataset-level top-k per source (see :func:`topk_docs_per_source`).

    ``docs`` must carry (doc_id int, source string, n_chars int)."""
    mid_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("n_chars", pa.int64()), ("__part", pa.int32())]
    )
    final_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("n_chars", pa.int64()), ("rank", pa.int64())]
    )
    n_ids = part_space(num_parts)

    def _src_parts(src_dict: pa.DictionaryArray) -> np.ndarray:
        # hash the FEW distinct source strings, broadcast via codes
        # (md5-prefix: stable across processes, unlike hash())
        dict_parts = np.array(
            [
                int.from_bytes(
                    hashlib.md5(s.encode("utf-8")).digest()[:8], "big"
                ) % n_ids
                for s in src_dict.dictionary.to_pylist()
            ],
            dtype=np.int64,
        )
        return dict_parts[src_dict.indices.to_numpy()]

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return mid_schema.empty_table()
        src_dict = t["source"].combine_chunks().dictionary_encode()
        codes = src_dict.indices.to_numpy()
        sel, _ = _topk_select(
            codes,
            t["n_chars"].to_numpy().astype(np.int64),
            t["doc_id"].to_numpy().astype(np.int64),
            k,
        )
        parts = _src_parts(src_dict)[sel]
        kept = t.take(pa.array(sel, pa.int64()))
        return pa.table(
            {
                "doc_id": kept["doc_id"].combine_chunks().cast(pa.int64()),
                "source": kept["source"].combine_chunks().cast(pa.string()),
                "n_chars": kept["n_chars"].combine_chunks().cast(pa.int64()),
                "__part": pa.array(parts.astype(np.int32), pa.int32()),
            },
            schema=mid_schema,
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "source" not in group.column_names:
            return final_schema.empty_table()
        src_dict = group["source"].combine_chunks().dictionary_encode()
        sel, rank = _topk_select(
            src_dict.indices.to_numpy(),
            group["n_chars"].to_numpy().astype(np.int64),
            group["doc_id"].to_numpy().astype(np.int64),
            k,
        )
        kept = group.take(pa.array(sel, pa.int64()))
        return pa.table(
            {
                "doc_id": kept["doc_id"].combine_chunks().cast(pa.int64()),
                "source": kept["source"].combine_chunks().cast(pa.string()),
                "n_chars": kept["n_chars"].combine_chunks().cast(pa.int64()),
                "rank": pa.array(rank.astype(np.int64), pa.int64()),
            },
            schema=final_schema,
        )

    return partitioned_groups(
        docs.map_batches(local_topk, batch_format="pyarrow", batch_size=None),
        merge_topk, mid_schema=mid_schema, num_parts=num_parts,
    )


def source_mix(sf_dir: str, weights: dict[str, int] | None = None) -> ray.data.Dataset:
    """Weighted deterministic source mixing (training-data recipe
    op): keep a doc iff hash(doc_id) % 100 < weight[source]. The
    Knuth multiplicative hash makes the sample reproducible across
    engines/runs — no RNG state, no global pass."""
    # default recipe: weight(srcN) = (7N + 10) % 100 — derivable in
    # SQL from the source name, so the mix is oracle-checkable
    def weight_of(source: str) -> int:
        if weights is not None:
            return weights.get(source, 0)
        return (int(source[3:]) * 7 + 10) % 100

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def mix(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy().astype(np.int64)
        bucket = (ids * 2654435761) % 4294967296 % 100
        w = np.array(
            [weight_of(s) for s in batch["source"].to_pylist()],
            dtype=np.int64,
        )
        return batch.filter(pa.array(bucket < w))

    return docs.map_batches(mix, batch_format="pyarrow", batch_size=None)


def _gram_hashes_md5(text: str, k: int, cache: dict) -> np.ndarray:
    """One md5-prefix uint64 per word k-gram STRING (position order).
    Empty/whitespace-only text → the single sentinel hash 0. Unlike
    dedup.shingles' rolling combine this hashes the gram string
    directly — md5 so a SQL oracle recomputes it bit-for-bit; the
    per-actor cache is keyed by gram string (grams repeat heavily in
    web text, same memo win as the word-hash cache)."""
    words = text.split()
    if not words:
        return np.array([0], dtype=np.uint64)
    kk = min(k, len(words))
    out = np.empty(len(words) - kk + 1, dtype=np.uint64)
    for i in range(len(out)):
        g = " ".join(words[i:i + kk])
        h = cache.get(g)
        if h is None:
            h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8],
                               "big")
            cache[g] = h
        out[i] = h
    return out


class Fingerprinter:
    """Winnowing-style document fingerprint: min hash per
    ``window``-sized block of word 3-gram hashes, digested to one
    64-bit id per doc (cheap near-dup pre-filter / lineage id).
    Actor-pool stage with a per-actor gram-hash memo. Every hash in
    the chain is an md5 64-bit prefix over strings (gram hashes via
    :func:`_gram_hashes_md5`; final digest = md5 over the block
    minima rendered as lowercase 16-hex-digit words), so a SQL
    oracle recomputes the fingerprint bit-for-bit (the
    ``fingerprints`` oracle in __ray_entry__.py)."""

    def __init__(self, window: int = 8):
        self.window = window
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import MinHasher

        if len(self.cache) > MinHasher._CACHE_LIMIT:
            self.cache.clear()
        out = np.empty(batch.num_rows, dtype=np.uint64)
        for i, t in enumerate(batch["text"].to_pylist()):
            hashes = _gram_hashes_md5(t, 3, self.cache)
            n = len(hashes)
            pad = (-n) % self.window
            if pad:
                hashes = np.concatenate(
                    [hashes, np.full(pad, np.iinfo(np.uint64).max, np.uint64)]
                )
            mins = hashes.reshape(-1, self.window).min(axis=1)
            hexcat = "".join(f"{m:016x}" for m in mins.tolist())
            out[i] = np.uint64(
                int.from_bytes(
                    hashlib.md5(hexcat.encode("ascii")).digest()[:8], "big"
                )
            )
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array(out, pa.uint64())}
        )


def fingerprints(sf_dir: str, window: int = 8) -> ray.data.Dataset:
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        stateful(Fingerprinter, window=window),
        batch_format="pyarrow", batch_size=None,
    )


class GramEmitter:
    """Per-worker stage (util.stateful): one (hash, gram, 1, part) row
    per DISTINCT word k-gram per doc; the word-hash memo persists
    across batches on the same worker."""

    def __init__(self, k: int = 5, num_parts: int = 64):
        self.k = k
        self.num_parts = num_parts
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import MinHasher, shingles

        if len(self.cache) > MinHasher._CACHE_LIMIT:
            self.cache.clear()
        hs, grams = [], []
        for t in batch["text"].to_pylist():
            words = t.split()
            if not words:
                continue
            kk = min(self.k, len(words))
            hashes = shingles(t, self.k, self.cache)
            seen: set[int] = set()
            for i, h in enumerate(hashes.tolist()):
                if h in seen:
                    continue  # distinct per doc
                seen.add(h)
                hs.append(h - (1 << 63))  # uint64 → int64 shift
                grams.append(" ".join(words[i:i + kk]))
        h_arr = np.array(hs, dtype=np.int64)
        part = (
            (h_arr.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(self.num_parts))
        ).astype(np.int32)
        return pa.table(
            {"h": pa.array(h_arr, pa.int64()),
             "gram": pa.array(grams, pa.string()),
             "n": pa.array(np.ones(len(hs), np.int64), pa.int64()),
             "__part": pa.array(part, pa.int32())},
        )


class HashEmitter:
    """Per-worker stage (util.stateful): one (hash, 1, part) row per
    DISTINCT word k-gram per doc — the hash-only projection of
    :class:`GramEmitter` for the hot-gram broadcast set."""

    def __init__(self, k: int = 5, num_parts: int = 64):
        self.k = k
        self.num_parts = num_parts
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import MinHasher, shingles

        if len(self.cache) > MinHasher._CACHE_LIMIT:
            self.cache.clear()
        hs: list[int] = []
        for t in batch["text"].to_pylist():
            hs.extend(
                h - (1 << 63)
                for h in set(shingles(t, self.k, self.cache).tolist())
            )
        h_arr = np.array(hs, dtype=np.int64)
        part = (
            (h_arr.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(self.num_parts))
        ).astype(np.int32)
        return pa.table(
            {"h": pa.array(h_arr, pa.int64()),
             "n": pa.array(np.ones(len(hs), np.int64), pa.int64()),
             "__part": pa.array(part, pa.int32())},
        )


def repeated_ngrams(sf_dir: str, k: int = 5,
                    min_docs: int = 2, num_parts: int = 64) -> ray.data.Dataset:
    """Boilerplate / template detector: word k-grams appearing in at
    least ``min_docs`` DISTINCT documents, with their document
    counts. The cross-doc count runs on 64-bit gram hashes through a
    fixed-partition numpy reduce (util.grouped_agg shape) — gram
    STRINGS ride along only as the representative to report, so the
    shuffle stays narrow. Output: (gram, n_docs)."""
    from .dedup import MinHasher, shingles

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    mid = pa.schema([("h", pa.int64()), ("gram", pa.string()),
                     ("n", pa.int64()), ("__part", pa.int32())])
    out_schema = pa.schema([("gram", pa.string()), ("n_docs", pa.int64())])

    def count_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h" not in group.column_names:
            return out_schema.empty_table()
        h = group["h"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(h, kind="stable")
        h, n = h[order], n[order]
        starts = np.nonzero(np.r_[True, np.diff(h) != 0])[0]
        counts = np.add.reduceat(n, starts)
        keep = counts >= min_docs
        # representative gram string per kept hash
        grams = group["gram"].take(pa.array(order[starts[keep]]))
        return pa.table(
            {"gram": grams, "n_docs": pa.array(counts[keep], pa.int64())},
            schema=out_schema,
        )

    return partitioned_groups(
        docs.map_batches(stateful(GramEmitter, k=k, num_parts=num_parts),
                         batch_format="pyarrow", batch_size=None),
        count_part, mid_schema=mid, num_parts=num_parts,
    )


@ray.remote
def _needle_gram_hashes(path: str, k: int, modulus: int):
    """Worker task: the benchmark ('needle') docs' distinct gram
    hashes — doc_id % modulus == 0 is the deterministic, SQL-
    replicable needle set."""
    import pyarrow.parquet as pq

    from .dedup import shingles

    t = pq.read_table(path, columns=["doc_id", "text"])
    cache: dict[str, int] = {}
    needles: set[int] = set()
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if doc_id % modulus == 0:
            needles.update(shingles(text, k, cache).tolist())
    return needles


def decontaminate(sf_dir: str, k: int = 5,
                  modulus: int = 97) -> ray.data.Dataset:
    """Benchmark decontamination: flag corpus documents sharing any
    word k-gram with the needle set (docs with doc_id % modulus == 0
    stand in for an eval benchmark). The needle gram-hash set is
    built once in a worker task and broadcast via the object store
    (benchmarks are small by nature); each batch intersects its docs'
    distinct gram hashes against it — no shuffle at all. Output:
    (doc_id, n_hits) for contaminated non-needle docs."""
    from .dedup import MinHasher, shingles

    needles_ref = _needle_gram_hashes.remote(
        f"{sf_dir}/documents.parquet", k, modulus
    )
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    class Matcher:
        def __init__(self):
            self.needles = None
            self.cache: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.needles is None:
                import ray as _ray

                self.needles = _ray.get(needles_ref)
            if len(self.cache) > MinHasher._CACHE_LIMIT:
                self.cache.clear()
            ids, hits = [], []
            for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                    batch["text"].to_pylist()):
                if doc_id % modulus == 0:
                    continue  # the benchmark itself
                n = len(set(shingles(text, k, self.cache).tolist())
                        & self.needles)
                if n:
                    ids.append(doc_id)
                    hits.append(n)
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()),
                 "n_hits": pa.array(hits, pa.int64())}
            )

    return docs.map_batches(Matcher, batch_format="pyarrow",
                            batch_size=None, concurrency=(1, 4))


def hot_gram_hashes(sf_dir: str, k: int = 5, min_docs: int = 5,
                    num_parts: int = 64) -> ray.data.Dataset:
    """DISTRIBUTED hot-gram derivation: the hash-only projection of
    ``repeated_ngrams`` — per-doc distinct gram hashes (streamed,
    actor-pool cached word hashes) → fixed-partition numpy count →
    hashes with ≥ min_docs distinct docs. No single task ever sees
    the whole corpus; the shuffle carries (int64, count) pairs only.
    Output: (h: int64 = gram_hash − 2⁶³)."""
    from .dedup import MinHasher, shingles

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    mid = pa.schema([("h", pa.int64()), ("n", pa.int64()),
                     ("__part", pa.int32())])
    out_schema = pa.schema([("h", pa.int64())])

    def count_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h" not in group.column_names:
            return out_schema.empty_table()
        h = group["h"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(h, kind="stable")
        h, n = h[order], n[order]
        starts = np.nonzero(np.r_[True, np.diff(h) != 0])[0]
        counts = np.add.reduceat(n, starts)
        keep = counts >= min_docs
        return pa.table(
            {"h": pa.array(h[starts[keep]], pa.int64())}, schema=out_schema
        )

    return partitioned_groups(
        docs.map_batches(stateful(HashEmitter, k=k, num_parts=num_parts),
                         batch_format="pyarrow", batch_size=None),
        count_part, mid_schema=mid, num_parts=num_parts,
    )


def strip_repeated_ngrams(sf_dir: str, k: int = 5, min_docs: int = 5,
                          broadcast_budget: int = 4_000_000,
                          num_parts: int = 64,
                          scratch_dir: "str | None" = None) -> ray.data.Dataset:
    """Boilerplate REMOVAL (the companion of repeated_ngrams):
    drop every word covered by a k-gram that appears in ≥ min_docs
    documents. The hot-gram set is derived DISTRIBUTED
    (``hot_gram_hashes``: streamed gram emit + fixed-partition
    count) and then applied one of two ways, chosen by its actual
    size. The hot table is STAGED to Parquet once (util.stage_dir
    lifecycle/topology rules) and both the count and the chosen path
    stream from the staged files — the over-budget route, whose whole
    point is never holding the hot set in one place, no longer pays
    an object-store pin just to learn the count, and the derivation
    never re-executes per consumer:

    - ``≤ broadcast_budget`` hashes (default 4M ≈ 32 MB): broadcast
      the set once via the object store; each doc's coverage mask is
      a vectorized span-or over its shingle positions, no further
      shuffle. This is the boilerplate-shaped fast path.
    - above the budget (web-scale corpora, where grams in ≥ min_docs
      docs scale with corpus vocabulary, not with boilerplate):
      hash-partition SEMI-JOIN — per-doc (gram_hash, doc_id, pos)
      rows co-partition with the hot table on ``hash(h)``, matched
      positions regroup per doc into a span list, and one left
      lookup-join (util.attach_column) carries the list back onto
      the text. The driver never sees the hot set; the wide shuffle
      moves int rows only, and document text moves exactly once.

    Both paths emit identical rows (equivalence-tested). Output:
    (doc_id, clean_text, n_removed)."""
    from .dedup import MinHasher, shingles
    from .util import attach_column, stage_dir

    hot_dir = stage_dir(scratch_dir, "hot_grams")
    hot_gram_hashes(sf_dir, k, min_docs, num_parts).write_parquet(hot_dir)
    hot_ds = sized_read_parquet(hot_dir, columns=["h"])
    n_hot = hot_ds.count()  # metadata count over staged files — no pin
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _strip_rows(doc_ids, texts, positions_iter, cache):
        """Shared final kernel: apply hot spans (as position arrays)
        to each doc. ``positions_iter`` yields an int array of
        covered shingle start positions per doc (or None)."""
        ids, cleaned, removed = [], [], []
        for doc_id, text, pos in zip(doc_ids, texts, positions_iter):
            words = text.split()
            kk = min(k, max(1, len(words)))
            mask = np.zeros(len(words), dtype=bool)
            if pos is not None and len(pos) and len(words):
                # span-or via a difference array: +1 at starts, -1
                # past ends, cumsum > 0 — O(words), no Python loop
                d = np.zeros(len(words) + 1, dtype=np.int64)
                np.add.at(d, np.minimum(pos, len(words) - 1), 1)
                np.add.at(d, np.minimum(pos + kk, len(words)), -1)
                mask = np.cumsum(d[:-1]) > 0
            kept = [w for w, m in zip(words, mask) if not m]
            ids.append(doc_id)
            cleaned.append(" ".join(kept))
            removed.append(int(mask.sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(cleaned, pa.string()),
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    if n_hot <= broadcast_budget:
        # the ONE deliberate driver materialization: ≤ budget bare
        # int64 hashes (default 4M ≈ 32 MB), put once, read per actor
        hot = {
            row["h"] + (1 << 63)                  # back to raw uint64 ints
            for row in hot_ds.take_all()
        }
        hot_ref = ray.put(frozenset(hot))

        class Stripper:
            def __init__(self):
                self.hot = None
                self.cache: dict[str, int] = {}

            def __call__(self, batch: pa.Table) -> pa.Table:
                if self.hot is None:
                    import ray as _ray

                    self.hot = _ray.get(hot_ref)
                if len(self.cache) > MinHasher._CACHE_LIMIT:
                    self.cache.clear()

                def positions():
                    for text in batch["text"].to_pylist():
                        hs = shingles(text, k, self.cache)
                        yield np.nonzero(
                            np.fromiter(
                                (h in self.hot for h in hs.tolist()),
                                dtype=bool, count=len(hs),
                            )
                        )[0]

                return _strip_rows(batch["doc_id"].to_pylist(),
                                   batch["text"].to_pylist(),
                                   positions(), self.cache)

        return docs.map_batches(Stripper, batch_format="pyarrow",
                                batch_size=None, concurrency=(1, 4))

    # --- over-budget: hash-partition semi-join path ---
    mid = pa.schema([("h", pa.int64()), ("doc_id", pa.int64()),
                     ("pos", pa.int32()), ("is_hot", pa.int8()),
                     ("__part", pa.int32())])
    matched_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int32())])

    class PosEmitter:
        """One (gram_hash, doc_id, pos) row per shingle POSITION (not
        distinct — the strip needs every covered span)."""

        def __init__(self):
            self.cache: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(self.cache) > MinHasher._CACHE_LIMIT:
                self.cache.clear()
            hs_all, ids_all, pos_all = [], [], []
            for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                    batch["text"].to_pylist()):
                hs = shingles(text, k, self.cache)
                # raw uint64 → (raw − 2⁶³) as int64, matching
                # hot_gram_hashes' shifted key space: flip the top
                # bit, reinterpret (two's-complement identity)
                hs_all.append((hs ^ np.uint64(1 << 63)).view(np.int64))
                ids_all.append(np.full(len(hs), doc_id, np.int64))
                pos_all.append(np.arange(len(hs), dtype=np.int32))
            if not hs_all:
                return mid.empty_table()
            h = np.concatenate(hs_all)
            part = (
                (h.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(part_space(num_parts))
            ).astype(np.int32)
            return pa.table(
                {"h": pa.array(h, pa.int64()),
                 "doc_id": pa.array(np.concatenate(ids_all), pa.int64()),
                 "pos": pa.array(np.concatenate(pos_all), pa.int32()),
                 "is_hot": pa.array(
                     np.zeros(len(h), np.int8), pa.int8()),
                 "__part": pa.array(part, pa.int32())},
                schema=mid,
            )

    def tag_hot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "h" not in t.column_names:
            return mid.empty_table()
        h = t["h"].to_numpy().astype(np.int64)
        part = (
            (h.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        n = len(h)
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "doc_id": pa.array(np.full(n, -1, np.int64), pa.int64()),
             "pos": pa.array(np.full(n, -1, np.int32), pa.int32()),
             "is_hot": pa.array(np.ones(n, np.int8), pa.int8()),
             "__part": pa.array(part, pa.int32())},
            schema=mid,
        )

    def match_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h" not in group.column_names:
            return matched_schema.empty_table()
        is_hot = group["is_hot"].to_numpy().astype(bool)
        hot_h = np.unique(group["h"].to_numpy()[is_hot])
        if len(hot_h) == 0 or is_hot.all():
            return matched_schema.empty_table()
        gh = group["h"].to_numpy()[~is_hot]
        idx = np.searchsorted(hot_h, gh)
        idx_c = np.minimum(idx, len(hot_h) - 1)
        hit = hot_h[idx_c] == gh
        return pa.table(
            {"doc_id": pa.array(
                group["doc_id"].to_numpy()[~is_hot][hit], pa.int64()),
             "pos": pa.array(
                 group["pos"].to_numpy()[~is_hot][hit], pa.int32())},
            schema=matched_schema,
        )

    grams = docs.map_batches(stateful(PosEmitter),
                             batch_format="pyarrow", batch_size=None)
    matched = partitioned_groups(
        grams.union(hot_ds.map_batches(
            tag_hot, batch_format="pyarrow", batch_size=None)),
        match_part, mid_schema=mid, num_parts=num_parts,
    )

    # regroup matched positions per doc into one list row
    mid2 = pa.schema([("doc_id", pa.int64()), ("pos", pa.int32()),
                      ("__part", pa.int32())])
    pos_list = pa.list_(pa.int32())
    grouped_schema = pa.schema([("doc_id", pa.int64()),
                                ("positions", pos_list)])

    def tag_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return mid2.empty_table()
        d = t["doc_id"].to_numpy().astype(np.int64)
        part = (
            (d.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        return pa.table(
            {"doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
             "pos": t["pos"].combine_chunks().cast(pa.int32()),
             "__part": pa.array(part, pa.int32())},
            schema=mid2,
        )

    def group_doc(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return grouped_schema.empty_table()
        d = group["doc_id"].to_numpy()
        p = group["pos"].to_numpy()
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        starts = np.nonzero(np.r_[True, np.diff(d) != 0])[0]
        offsets = np.r_[starts, len(d)].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(p, pa.int32())
        )
        return pa.table(
            {"doc_id": pa.array(d[starts], pa.int64()),
             "positions": lists.cast(pos_list)},
            schema=grouped_schema,
        )

    doc_positions = partitioned_groups(
        matched.map_batches(tag_doc, batch_format="pyarrow",
                            batch_size=None),
        group_doc, mid_schema=mid2, num_parts=num_parts,
    )

    item_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    with_pos = attach_column(
        docs, doc_positions,
        item_key="doc_id", lookup_key="doc_id",
        payload_col="positions", out_col="positions",
        item_schema=item_schema, payload_type=pos_list,
        num_parts=num_parts, how="left",
    )

    def strip_batch(batch: pa.Table) -> pa.Table:
        def positions():
            for v in batch["positions"].to_pylist():
                yield None if v is None else np.asarray(v, np.int64)

        return _strip_rows(batch["doc_id"].to_pylist(),
                           batch["text"].to_pylist(), positions(), None)

    return with_pos.map_batches(strip_batch, batch_format="pyarrow",
                                batch_size=None)


def pack_sequences(sf_dir: str, window: int = 512,
                   num_parts: int = 16,
                   docs: "ray.data.Dataset | None" = None) -> ray.data.Dataset:
    """Greedy sequence packing — the canonical pretraining batcher:
    assign documents to fixed-token-budget training sequences,
    first-fit in deterministic order.

    Scale shape: documents hash-partition (Knuth multiplicative on
    doc_id) into independent PACKER partitions; each partition packs
    its own docs greedily in doc_id order, so the only sequential
    scan is per-partition (the packing algorithm itself) and
    partitions parallelize. seq ids are globally unique
    (``part << 32 | local_seq``) without any coordination. A doc
    longer than ``window`` gets a sequence of its own (callers
    truncate downstream); token counts are the whitespace tokenizer
    of :func:`token_counts`.

    Output: (doc_id, part, seq_id, seq_offset, n_tokens) — one row
    per document. SQL-checked: the greedy running fill is a
    recursive CTE threading doc_id order per packer partition (the
    ``pack_sequences`` oracle in __ray_entry__.py); invariants are
    additionally pinned by tests/test_stages.py::TestPackSequences
    against a pure-Python reference packer.

    ``docs`` overrides the default whole-table read with a caller
    dataset carrying either (doc_id, text) or pre-tokenized
    (doc_id, n_tokens) rows (pipelines/recipe.corpus_prep passes the
    latter so document text never rides the packer shuffle)."""
    if docs is None:
        docs = sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    mid = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("__part", pa.int32())]
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("part", pa.int32()),
         ("seq_id", pa.int64()), ("seq_offset", pa.int64()),
         ("n_tokens", pa.int64())]
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return mid.empty_table()
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        if "n_tokens" in batch.column_names:
            n = batch["n_tokens"].to_numpy().astype(np.int64)
        else:
            n = np.array(
                [len(t.split()) if t is not None else 0
                 for t in batch["text"].to_pylist()], np.int64
            )
        part = (
            (ids.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_tokens": pa.array(n, pa.int64()),
             "__part": pa.array(part, pa.int32())},
            schema=mid,
        )

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return out_schema.empty_table()
        ids = group["doc_id"].to_numpy().astype(np.int64)
        n = group["n_tokens"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        part_val = int(group["__part"][0].as_py())
        seq = np.empty(len(ids), np.int64)
        off = np.empty(len(ids), np.int64)
        cur_seq, cur_fill = 0, 0
        # the greedy reset scan IS the packing algorithm — sequential
        # by definition, bounded to one partition's docs
        for i, tok in enumerate(n.tolist()):
            if cur_fill and cur_fill + tok > window:
                cur_seq += 1
                cur_fill = 0
            seq[i] = cur_seq
            off[i] = cur_fill
            cur_fill += tok
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "part": pa.array(
                 np.full(len(ids), part_val, np.int32), pa.int32()),
             "seq_id": pa.array(
                 (np.int64(part_val) << np.int64(32)) + seq, pa.int64()),
             "seq_offset": pa.array(off, pa.int64()),
             "n_tokens": pa.array(n, pa.int64())},
            schema=out_schema,
        )

    return partitioned_groups(
        docs.map_batches(tag, batch_format="pyarrow", batch_size=None),
        pack, mid_schema=mid, num_parts=num_parts,
    )
