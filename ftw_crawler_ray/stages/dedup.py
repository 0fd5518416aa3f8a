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

_MERSENNE = (1 << 61) - 1
_N_PERM_DEFAULT = 64


def _perm_params(n_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingle 64-bit hashes (stable: blake2b truncated)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """n_perm minima of (a*h+b) mod p — vectorized outer product."""
    if len(sh) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    # (n_perm, n_shingles) — use object->uint128 avoidance: mod-mul in uint64
    # via python ints is slow; use float-safe trick with uint64 overflow-free
    # computation in numpy by splitting: (a*h) % p with a,h < 2^61 needs
    # 122-bit products → do it in Python-int vector via np.frompyfunc only
    # for small n; here use np.uint64 wraparound-safe approach:
    prod = (a[:, None].astype(object) * sh[None, :].astype(object)) % _MERSENNE
    sig = ((prod + b[:, None].astype(object)) % _MERSENNE).min(axis=1)
    return sig.astype(np.uint64)


class MinHasher:
    """Actor-pool stage: permutation params built once per actor
    (map_batches(MinHasher, concurrency=N) — SURVEY.md §7.2)."""

    def __init__(self, n_perm: int = _N_PERM_DEFAULT, k: int = 5, seed: int = 42):
        self.a, self.b = _perm_params(n_perm, seed)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(shingles(t, self.k), self.a, self.b)
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def _explode_bands(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    doc_ids, band_ids, band_hashes = [], [], []
    for doc_id, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        sig = np.asarray(sig, dtype=np.uint64)
        for band in range(n_bands):
            chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            doc_ids.append(doc_id)
            band_ids.append(band)
            band_hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
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
) -> ray.data.Dataset:
    """LSH candidate pairs: signature → band explode → groupby
    (band_id, band_hash) → pairs within bucket (deduped, a<b).

    The groupby is the one shuffle; bucket skew is bounded because a
    bucket is an exact band-hash collision set. Verification
    (exact Jaccard) happens on the candidate pairs only.
    """
    rows_per_band = n_perm // n_bands
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(
        MinHasher, fn_constructor_kwargs={"n_perm": n_perm, "k": k},
        batch_format="pyarrow", batch_size=None, concurrency=4,
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
    # distinct pairs (a pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands_hit"))


def minhash_dedup(sf_dir: str, threshold: float = 0.8,
                  n_perm: int = _N_PERM_DEFAULT, n_bands: int = 16,
                  k: int = 5) -> ray.data.Dataset:
    """Complete near-dup pipeline: LSH candidates → exact-Jaccard
    verify (texts broadcast once via ray.put — at 10^10 docs swap for
    a candidate⋈texts hash join) → connected components → (doc_id,
    cluster_id=min doc of component). Components come from
    driver-side union-find over the *verified pair list*, which is
    output-sized (≪ corpus); the groupby-based min-label-propagation
    variant slots in when pairs no longer fit one node.
    """
    import pyarrow.parquet as pq

    texts_tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    texts_ref = ray.put(
        dict(zip(texts_tbl["doc_id"].to_pylist(), texts_tbl["text"].to_pylist()))
    )
    candidates = minhash_candidate_pairs(sf_dir, n_perm, n_bands, k)

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            j = jaccard(texts[a], texts[b], k)
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

    verified = candidates.map_batches(
        verify, batch_format="pyarrow", batch_size=None
    )
    pairs = verified.select_columns(["doc_a", "doc_b"]).take_all()

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p["doc_a"]), find(p["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((doc, find(doc)) for doc in parent)
    return ray.data.from_items(
        [{"doc_id": d, "cluster_id": c} for d, c in rows]
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (blake2b word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big"
        )
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_table(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def add_simhash(batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(hashes, pa.uint64()),
                # 16-bit prefix bucket: near-dups (small hamming dist)
                # mostly share it; full pipeline checks rotated buckets
                "bucket": pa.array([h >> 48 for h in hashes], pa.uint32()),
            }
        )

    return docs.map_batches(add_simhash, batch_format="pyarrow", batch_size=None)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
