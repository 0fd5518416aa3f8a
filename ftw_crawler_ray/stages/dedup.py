"""Deduplication family over the ``documents`` table.

Beyond-the-reference operators for a training-data pipeline (the
reference's only dedup is implicit single-enumeration + lastmod,
SURVEY.md §2.6 A2):

- exact:     content md5 → hash-partition groupby → first per group
- minhash:   shingle → minhash → LSH bands → band-bucket groupby →
             candidate pairs → Jaccard verify
- simhash:   64-bit simhash + hamming-radius bucketing
- ngram:     n-gram Jaccard verification kernel (used by minhash)

All are streaming map_batches + one groupby each; nothing
materializes the corpus. MinHash permutations are the classic
``(a*h + b) mod p`` universal hashes with a fixed seed so results
are deterministic across runs/processes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _md5_hex_column(batch: pa.Table, col: str = "text") -> pa.Table:
    hashes = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[col].to_pylist()
    ]
    return batch.append_column("text_md5", pa.array(hashes, pa.string()))


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: md5(text) groups → keeper = min doc_id, dup count.
    The md5 column is computed batch-local; the groupby shuffles only
    (hash, doc_id) pairs, not the text."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    hashed = docs.map_batches(_md5_hex_column, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "text_md5"]
    )
    return hashed.groupby("text_md5").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_dups"),
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

# Universal-hash prime 2^31-1: products a·h' with a, h' < 2^31 fit a
# uint64 exactly, so the whole signature stays in C-speed numpy (the
# 61-bit Mersenne variant needs 122-bit products → Python bigints,
# ~100× slower per signature).
_P31 = (1 << 31) - 1
_MERSENNE = _P31  # empty-shingle sentinel == max hash value
_N_PERM_DEFAULT = 64
# odd multiplier for the rolling shingle combine (64-bit golden ratio)
_ROLL_C = np.uint64(0x9E3779B97F4A7C15)


def _perm_params(n_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P31, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _P31, size=n_perm, dtype=np.uint64)
    return a, b


def _word_hash(w: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big"
    )


def _word_hash_array(words: list[str], cache: dict | None = None) -> np.ndarray:
    """uint64 blake2b per word, memoized across calls — natural text
    repeats words heavily, so an actor-held cache turns most lookups
    into dict hits instead of hash computations."""
    out = np.empty(len(words), dtype=np.uint64)
    if cache is None:
        for i, w in enumerate(words):
            out[i] = _word_hash(w)
        return out
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = _word_hash(w)
            cache[w] = h
        out[i] = h
    return out


def shingles(text: str, k: int = 5, cache: dict | None = None) -> np.ndarray:
    """Word k-shingle 64-bit hashes.

    Order-sensitive rolling combine of per-word blake2b hashes:
    g_i = Σ_j wh[i+j]·C^(k-1-j) (mod 2^64). One cheap hash per WORD
    plus a vectorized combine, instead of one blake2b per k-word gram
    string — same dedup semantics (two texts share a shingle iff they
    share the k-gram), ~k× less hashing in the hot path."""
    words = text.split()
    if not words:
        return np.array([np.uint64(0)], dtype=np.uint64)
    wh = _word_hash_array(words, cache)
    n = len(words)
    kk = min(k, n)
    powers = _ROLL_C ** np.arange(kk - 1, -1, -1, dtype=np.uint64)
    out = np.zeros(n - kk + 1, dtype=np.uint64)
    for j in range(kk):
        out += wh[j : j + n - kk + 1] * powers[j]
    return out


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """n_perm minima of (a·(h mod p) + b) mod p — pure uint64 numpy
    (a, b < 2^31 so every product fits 64 bits)."""
    if len(sh) == 0:
        return np.full(len(a), _P31, dtype=np.uint64)
    hp = sh % np.uint64(_P31)
    prod = (a[:, None] * hp[None, :] + b[:, None]) % np.uint64(_P31)
    return prod.min(axis=1)


class MinHasher:
    """Actor-pool stage: permutation params AND the word-hash memo
    built once per actor (map_batches(MinHasher, concurrency=N) —
    SURVEY.md §7.2)."""

    _CACHE_LIMIT = 1 << 20  # ~16 MB of dict; reset beyond that

    def __init__(self, n_perm: int = _N_PERM_DEFAULT, k: int = 5, seed: int = 42):
        self.a, self.b = _perm_params(n_perm, seed)
        self.k = k
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.cache) > self._CACHE_LIMIT:
            self.cache.clear()
        sigs = [
            minhash_signature(shingles(t, self.k, self.cache), self.a, self.b)
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def _explode_bands(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    """doc → n_bands rows of (doc_id, band_id, band_hash): fully
    vectorized — the signature list column flattens zero-copy to a
    (n, n_perm) uint64 matrix and each band's rows combine via the
    rolling multiplier (no per-chunk blake2b; two docs share a
    band_hash iff they share the band's signature rows, modulo a
    2^-64 collision)."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "band_id": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.uint64())}
        )
    sig_col = batch["sig"].combine_chunks()
    sig = sig_col.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
    s3 = sig.astype(np.uint64).reshape(n, n_bands, rows_per_band)
    powers = _ROLL_C ** np.arange(1, rows_per_band + 1, dtype=np.uint64)
    bh = (s3 * powers).sum(axis=2, dtype=np.uint64)  # (n, n_bands)
    ids = batch["doc_id"].to_numpy()
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n), pa.int32()
            ),
            "band_hash": pa.array(bh.ravel(), pa.uint64()),
        }
    )


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(shingles(a, k).tolist()), set(shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(
    sf_dir: str,
    n_perm: int = _N_PERM_DEFAULT,
    n_bands: int = 16,
    k: int = 5,
    docs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """LSH candidate pairs: signature → band explode → groupby
    (band_id, band_hash) → pairs within bucket (deduped, a<b).

    The groupby is the one shuffle; bucket skew is bounded because a
    bucket is an exact band-hash collision set. Verification
    (exact Jaccard) happens on the candidate pairs only.
    """
    rows_per_band = n_perm // n_bands
    if docs is None:
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    sigs = docs.map_batches(
        MinHasher, fn_constructor_kwargs={"n_perm": n_perm, "k": k},
        batch_format="pyarrow", batch_size=None, concurrency=(1, 4),
    )
    bands = sigs.map_batches(
        lambda t: _explode_bands(t, n_bands, rows_per_band),
        batch_format="pyarrow", batch_size=None,
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        a_ids, b_ids = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_ids.append(ids[i])
                b_ids.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(a_ids, pa.int64()),
                "doc_b": pa.array(b_ids, pa.int64()),
            }
        )

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
    # distinct pairs (a pair can collide in several bands) — numpy
    # pair-dedup, not groupby-aggregate (see util.grouped_pairs: Ray's
    # aggregate pays Python time per distinct key)
    from .util import grouped_pairs

    return grouped_pairs(pairs, "doc_a", "doc_b", alias="n_bands_hit",
                         num_parts=16)


_VERIFY_PARTITIONS = 16


def minhash_verified_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    n_perm: int = _N_PERM_DEFAULT,
    n_bands: int = 16,
    k: int = 5,
    num_partitions: int = _VERIFY_PARTITIONS,
    docs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """LSH candidates → exact-Jaccard verify via candidates ⋈
    documents lookup joins (one per pair side, groupby-lowered —
    see util.attach_column for why not Dataset.join). Texts move
    through the shuffle keyed by doc_id — nothing is broadcast and
    the driver never materializes the corpus, so this is the 100 TB
    shape: candidate volume (LSH output) bounds everything
    downstream. Output: (doc_a, doc_b, jaccard ≥ threshold)."""
    from .util import attach_column

    if docs is None:
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    candidates = minhash_candidate_pairs(sf_dir, n_perm, n_bands, k, docs=docs)

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    with_a = attach_column(
        candidates, docs, item_key="doc_a", lookup_key="doc_id",
        payload_col="text", out_col="text_a",
        item_schema=pair_schema, payload_type=pa.string(),
        num_parts=num_partitions,
    )
    with_both = attach_column(
        with_a, docs, item_key="doc_b", lookup_key="doc_id",
        payload_col="text", out_col="text_b",
        item_schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()),
             ("text_a", pa.string())]
        ),
        payload_type=pa.string(),
        num_parts=num_partitions,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        cache: dict[str, int] = {}
        # a doc appears in MANY pairs inside dup-heavy batches —
        # shingle each doc once per batch, not once per pair
        sets_by_doc: dict[int, set] = {}

        def shingle_set(doc_id, text):
            s = sets_by_doc.get(doc_id)
            if s is None:
                s = set(shingles(text, k, cache).tolist())
                sets_by_doc[doc_id] = s
            return s

        keep_a, keep_b, sims = [], [], []
        for a, b, ta, tb in zip(
            batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist(),
            batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
        ):
            sa = shingle_set(a, ta)
            sb = shingle_set(b, tb)
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 1.0
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow", batch_size=None)


def connected_components(
    pairs: ray.data.Dataset,
    num_partitions: int = _VERIFY_PARTITIONS,
    max_iter: int = 50,
) -> ray.data.Dataset:
    """(doc_a, doc_b) edges → (doc_id, cluster_id = min doc_id of the
    component), computed as distributed min-label propagation to a
    fixed point: each round every node takes the min of its own label
    and its neighbors' labels (edges ⋈ labels lookup join +
    groupby-min), until no label changes. Rounds needed = component
    diameter (near-dup clusters are short chains); work per round =
    O(edges) through two sort-shuffle groupbys — no driver-side
    union-find and no whole corpus on any single node. Convergence is
    detected by the label SUM: labels shrink monotonically, so the
    fixed point is exactly 'sum unchanged' — one cheap aggregate per
    round, no compare join."""
    from ray.data.aggregate import Sum as AggSum

    from .util import attach_column, ensure_schema

    _edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    _label_schema = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])

    def to_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return _edge_schema.empty_table()
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t["doc_a"].combine_chunks().cast(pa.int64()),
                     t["doc_b"].combine_chunks().cast(pa.int64())]
                ),
                "dst": pa.concat_arrays(
                    [t["doc_b"].combine_chunks().cast(pa.int64()),
                     t["doc_a"].combine_chunks().cast(pa.int64())]
                ),
            }
        )

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow", batch_size=None
    ).materialize()

    from .util import grouped_agg

    def agg_to_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _label_schema.empty_table()
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "label": pc.min_element_wise(t["doc_id"], t["min_nb"]).cast(
                    pa.int64()
                ),
            }
        )

    # init fused with round 1: label(x) = min(x, min neighbor);
    # grouped_agg, not groupby-aggregate — node counts are corpus-ish
    labels = (
        grouped_agg(edges, "src", "dst", mode="min",
                    out_key="doc_id", out_value="min_nb",
                    num_parts=num_partitions)
        .map_batches(agg_to_labels, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    def label_sum(ds) -> int:
        row = ds.aggregate(AggSum("label", alias_name="s"))
        return int(row["s"]) if row and row.get("s") is not None else 0

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        # neighbor labels: for edge (src, dst), label(dst) reaches src
        prop = attach_column(
            edges.map_batches(
                ensure_schema(_edge_schema),
                batch_format="pyarrow", batch_size=None,
            ),
            labels,
            item_key="dst", lookup_key="doc_id",
            payload_col="label", out_col="label",
            item_schema=pa.schema([("src", pa.int64())]),
            payload_type=pa.int64(),
            num_parts=num_partitions,
        ).map_batches(
            lambda t: pa.table(
                {"doc_id": t["src"], "label": t["label"]}, schema=_label_schema
            ) if t.num_rows and "src" in t.column_names
            else _label_schema.empty_table(),
            batch_format="pyarrow", batch_size=None,
        )
        labels = grouped_agg(
            labels.union(prop), "doc_id", "label", mode="min",
            num_parts=num_partitions,
        ).materialize()
        new_sum = label_sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "cluster_id": t["label"]}),
        batch_format="pyarrow", batch_size=None,
    )


def minhash_dedup(sf_dir: str, threshold: float = 0.8,
                  n_perm: int = _N_PERM_DEFAULT, n_bands: int = 16,
                  k: int = 5) -> ray.data.Dataset:
    """Complete near-dup pipeline: LSH candidates → exact-Jaccard
    verify (candidates ⋈ documents lookup joins — nothing broadcast) →
    distributed connected components (min-label propagation) →
    (doc_id, cluster_id = min doc of component). Every stage's
    data volume is bounded by max(corpus stream, candidate pairs);
    no driver materialization anywhere.

    Cost model (measured, BASELINE.md): wall time is linear in the
    CANDIDATE PAIR count, and an m-way exact-dup clique contributes
    O(m²) pairs — so the production composition runs ``dedup_exact``
    FIRST and near-dups only the per-hash keepers, exactly like the
    standard training-data pipeline."""
    verified = minhash_verified_pairs(sf_dir, threshold, n_perm, n_bands, k)
    return connected_components(verified.select_columns(["doc_a", "doc_b"]))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str, cache: dict | None = None) -> int:
    """64-bit SimHash over word unigrams (blake2b word hashes).
    Vectorized: word hashes → (n_words, 64) ±1 bit matrix → column
    sums → majority bits. Values identical to the per-word loop."""
    words = text.split()
    if not words:
        return 0
    wh = _word_hash_array(words, cache)
    bits = (
        (wh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.int32)
    acc = (2 * bits - 1).sum(axis=0)
    return int(
        ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
    )


class SimHasher:
    """Actor-pool stage: word-hash memo shared across batches."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.cache) > MinHasher._CACHE_LIMIT:
            self.cache.clear()
        hashes = [simhash64(t, self.cache) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(hashes, pa.uint64()),
                # 16-bit prefix bucket: near-dups (small hamming dist)
                # mostly share it; simhash_near_dups checks all
                # rotations for full hamming-radius coverage
                "bucket": pa.array([h >> 48 for h in hashes], pa.uint32()),
            }
        )


def simhash_table(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=None, concurrency=(1, 4)
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_near_dups(sf_dir: str, radius: int = 3,
                      n_rot: int = 8) -> ray.data.Dataset:
    """Hamming-radius near-dup pairs via rotated prefix buckets
    (Charikar / Manku-style): for each of ``n_rot`` bit-rotations,
    bucket on the rotated hash's top 16 bits; two hashes within
    hamming distance r share at least one rotated prefix with high
    probability (r ≤ 3 over 8 rotations of 64 bits ⇒ some 16-bit
    window avoids all differing bits by pigeonhole when the diffs
    cluster; verification is exact so precision is always 1).
    Output: (doc_a, doc_b, hamming) with hamming ≤ radius."""
    sigs = simhash_table(sf_dir).select_columns(["doc_id", "simhash"])
    rot_step = 64 // n_rot

    def explode_rot(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "rot": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.uint32()),
                 "simhash": pa.array([], pa.uint64())}
            )
        h = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_numpy()
        tables = []
        for r in range(n_rot):
            s = np.uint64(r * rot_step)
            rot = (h << s) | (h >> np.uint64(64 - int(s))) if s else h
            tables.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "rot": pa.array(np.full(n, r, dtype=np.int32), pa.int32()),
                        "bucket": pa.array(
                            (rot >> np.uint64(48)).astype(np.uint32), pa.uint32()
                        ),
                        "simhash": pa.array(h, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        hs = group["simhash"].to_numpy().astype(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        a_ids, b_ids, dists = [], [], []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(d <= radius)[0]:
                if ids[i] != ids[i + 1 + j]:
                    a_ids.append(ids[i])
                    b_ids.append(ids[i + 1 + j])
                    dists.append(int(d[j]))
        return pa.table(
            {
                "doc_a": pa.array(a_ids, pa.int64()),
                "doc_b": pa.array(b_ids, pa.int64()),
                "hamming": pa.array(dists, pa.int64()),
            }
        )

    pairs = (
        sigs.map_batches(explode_rot, batch_format="pyarrow", batch_size=None)
        .groupby(["rot", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    # a pair can collide under several rotations — keep one row
    from .util import grouped_pairs

    return grouped_pairs(pairs, "doc_a", "doc_b", value_col="hamming",
                         mode="min", alias="hamming")


def dedup_clusters(sf_dir: str, threshold: float = 0.8,
                   n_perm: int = _N_PERM_DEFAULT, n_bands: int = 16,
                   k: int = 5, num_parts: int = 64) -> ray.data.Dataset:
    """PRODUCTION dedup composition: exact dedup FIRST (collapses
    m-way identical-text cliques to one keeper with m-1 edges instead
    of O(m²) candidate pairs), then MinHash near-dup over the per-hash
    KEEPERS only, then one connected-component pass over
    exact-dup ∪ verified-near-dup edges. Output: (doc_id, cluster_id
    = min doc_id of the combined component) for every doc in ≥1 dup
    relation — the cost-model-correct pipeline (see minhash_dedup's
    docstring and BASELINE.md's 200x stress).

    Content key is the first 64 bits of md5(text) (collision odds
    ~n²/2⁻⁶⁵ — negligible below ~10⁸ distinct texts; widen to the
    full digest via two int64 columns beyond that)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    _mark_schema = pa.schema(
        [("key", pa.int64()), ("doc_id", pa.int64()), ("__part", pa.int32())]
    )
    _ek_schema = pa.schema(
        [("kind", pa.string()), ("doc_a", pa.int64()), ("doc_b", pa.int64())]
    )

    def mark(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        keys = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            keys[i] = (
                int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
                ) - (1 << 63)
            )
        part = (
            (keys.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(num_parts)
        ).astype(np.int32)
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "doc_id": pa.array(ids, pa.int64()),
             "__part": pa.array(part, pa.int32())},
            schema=_mark_schema,
        )

    def exact_groups(group: pa.Table) -> pa.Table:
        """Per partition: keeper ('k') row per distinct content key +
        edge ('e') rows keeper→member — numpy group scan."""
        if group.num_rows == 0 or "key" not in group.column_names:
            return _ek_schema.empty_table()
        keys = group["key"].to_numpy().astype(np.int64)
        ids = group["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        starts = np.nonzero(np.r_[True, np.diff(keys) != 0])[0]
        group_of = np.repeat(np.arange(len(starts)),
                             np.diff(np.r_[starts, len(keys)]))
        keepers = ids[starts]               # min doc per key (sorted)
        is_keeper = np.zeros(len(ids), dtype=bool)
        is_keeper[starts] = True
        kinds = ["k"] * len(keepers) + ["e"] * int((~is_keeper).sum())
        doc_a = np.concatenate([keepers, keepers[group_of[~is_keeper]]])
        doc_b = np.concatenate([keepers, ids[~is_keeper]])
        return pa.table(
            {"kind": pa.array(kinds, pa.string()),
             "doc_a": pa.array(doc_a, pa.int64()),
             "doc_b": pa.array(doc_b, pa.int64())},
            schema=_ek_schema,
        )

    groups = (
        docs.map_batches(mark, batch_format="pyarrow", batch_size=None)
        .groupby("__part", num_partitions=num_parts)
        .map_groups(exact_groups, batch_format="pyarrow")
        .materialize()  # small: one row per doc (kind+2 ints)
    )
    exact_edges = groups.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "e")).drop(["kind"])
        if t.num_rows and "kind" in t.column_names
        else pa.schema([("doc_a", pa.int64()),
                        ("doc_b", pa.int64())]).empty_table(),
        batch_format="pyarrow", batch_size=None,
    )
    keepers = groups.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.equal(t["kind"], "k"))["doc_a"]}
        ) if t.num_rows and "kind" in t.column_names
        else pa.schema([("doc_id", pa.int64())]).empty_table(),
        batch_format="pyarrow", batch_size=None,
    )

    from .util import attach_column

    # materialized ONCE: the verify pipeline consumes keeper_texts
    # three times (signatures + both lookup sides); blocks live in the
    # object store (spillable), never on the driver
    keeper_texts = attach_column(
        keepers, docs, item_key="doc_id", lookup_key="doc_id",
        payload_col="text", out_col="text",
        item_schema=pa.schema([("doc_id", pa.int64())]),
        payload_type=pa.string(),
        num_parts=16,
    ).repartition(16).materialize()
    # ^ coalesce: a 64-partition groupby output is 64+ near-empty
    # blocks, and block count multiplies TASK count in every
    # downstream stage (batch_size=None preserves blocks)
    near_edges = minhash_verified_pairs(
        sf_dir, threshold, n_perm, n_bands, k, docs=keeper_texts
    ).select_columns(["doc_a", "doc_b"])

    return connected_components(exact_edges.union(near_edges))
