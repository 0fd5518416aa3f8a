"""Similarity search over the ``embeddings`` table
(vec_id, embedding: list<float>, label).

- brute-force cosine top-k: numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, read per task) — the
  exact baseline; scales linearly in corpus size, embarrassingly
  parallel, no shuffle.
- random-hyperplane LSH bucketing: the scale path — signature →
  bucket groupby → exact cosine within bucket only.
- embedding near-dup pairs: all pairs ≥ threshold (batch × broadcast
  matrix; at 10^9 vectors swap the broadcast side for the LSH
  buckets).

Determinism: similarities are computed in float64 and rounded to 6
decimals before ranking, ties broken by vec_id — so results are
stable across BLAS implementations and match the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import sized_read_parquet, stateful


def _read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return sized_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    emb = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, emb


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def load_query_matrix(sf_dir: str, query_ids: list[int]):
    """Driver-side: the (tiny) query rows, normalized."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = dict(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
    q = np.array([by_id[i] for i in query_ids], dtype=np.float64)
    return np.asarray(query_ids, dtype=np.int64), _normalize(q)


def ann_topk(sf_dir: str, query_ids: list[int], k: int = 10) -> ray.data.Dataset:
    """Brute-force cosine top-k: per-batch local top-k against the
    broadcast queries, then one tiny groupby(query_id) finalizer.
    Output: (query_id, vec_id, rank, sim) with sim rounded at 6dp."""
    qids, qmat = load_query_matrix(sf_dir, query_ids)
    q_ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(q_ref)
        ids, emb = _matrix(batch)
        sims = np.round(_normalize(emb) @ qmat_.T, 6)  # (n, nq)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for j, qid in enumerate(qids_):
            col = sims[:, j]
            # candidates: local top-k by (sim desc, vec_id asc)
            order = np.lexsort((ids, -col))[:kk]
            out_q.extend([qid] * len(order))
            out_v.extend(ids[order])
            out_s.extend(col[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy()
        sims = group["sim"].to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        qid = group["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "vec_id": pa.array(ids[order], pa.int64()),
                "rank": pa.array(np.arange(len(order)), pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    candidates = _read_embeddings(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    )
    return candidates.groupby("query_id").map_groups(
        finalize, batch_format="pyarrow"
    )


@ray.remote
def _load_corpus_matrix(path: str):
    """Load + normalize the full embedding matrix in a WORKER task —
    the driver only ever holds the ObjectRef. Used by the exact
    (brute-force) twin; the scale path is lsh_near_dups."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = _normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    return ids, mat


def near_dup_pairs(sf_dir: str, threshold: float = 0.95) -> ray.data.Dataset:
    """All embedding pairs with cosine ≥ threshold (vec_a < vec_b).

    Batch × shared-matrix product: each task compares its block
    against the full (normalized) corpus matrix, loaded once in a
    worker task and shared via the object store — the exact baseline
    / oracle twin of ``lsh_near_dups``, O(n²) compute by design; use
    the LSH variant beyond ~10^6 vectors."""
    ref = _load_corpus_matrix.remote(f"{sf_dir}/embeddings.parquet")

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        ids, emb = _matrix(batch)
        sims = np.round(_normalize(emb) @ mat_all.T, 6)
        rows_a, rows_b, rows_s = [], [], []
        for i in range(len(ids)):
            hits = np.where(sims[i] >= threshold)[0]
            for j in hits:
                if ids[i] < ids_all[j]:
                    rows_a.append(ids[i])
                    rows_b.append(ids_all[j])
                    rows_s.append(sims[i, j])
        return pa.table(
            {
                "vec_a": pa.array(rows_a, pa.int64()),
                "vec_b": pa.array(rows_b, pa.int64()),
                "sim": pa.array(rows_s, pa.float64()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(
        pairs, batch_format="pyarrow", batch_size=None
    )


class Signer:
    """Per-worker stage (util.stateful): 16-bit hyperplane signature
    per vector; planes built lazily at first batch (dim from data)."""

    def __init__(self, n_planes: int = 16, seed: int = 42):
        self.n_planes = n_planes
        self.seed = seed
        self.planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _matrix(batch)
        if self.planes is None:
            self.planes = np.random.default_rng(self.seed).standard_normal(
                (emb.shape[1], self.n_planes)
            )
        bits = (emb @ self.planes) > 0
        sig = (bits * (1 << np.arange(self.n_planes))).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(sig.astype(np.int64), pa.int64()),
            }
        )


class BandSigner:
    """Per-worker stage (util.stateful): (vec_id, band_id, bucket)
    rows — each band's bucket is that band's hyperplane sign bits."""

    def __init__(self, n_bands: int = 16, planes_per_band: int = 4,
                 seed: int = 42):
        self.n_bands = n_bands
        self.planes_per_band = planes_per_band
        self.seed = seed
        self.planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bands, ppb = self.n_bands, self.planes_per_band
        ids, emb = _matrix(batch)
        if self.planes is None:
            self.planes = np.random.default_rng(self.seed).standard_normal(
                (emb.shape[1], n_bands * ppb)
            )
        bits = (emb @ self.planes) > 0  # (n, n_bands*ppb)
        b3 = bits.reshape(len(ids), n_bands, ppb)
        weights = 1 << np.arange(ppb)
        buckets = (b3 * weights).sum(axis=2).astype(np.int64)  # (n, n_bands)
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(n_bands, dtype=np.int32), n), pa.int32()
                ),
                "bucket": pa.array(buckets.ravel(), pa.int64()),
            }
        )


def lsh_buckets(sf_dir: str, n_planes: int = 16, seed: int = 42) -> ray.data.Dataset:
    """Random-hyperplane LSH: 16-bit signature per vector → bucket
    column. The scale path for near-dup / ANN: groupby(bucket) then
    exact cosine within each bucket (candidates only). Deterministic
    (seeded planes, built once per worker)."""

    return _read_embeddings(sf_dir).map_batches(
        stateful(Signer, n_planes=n_planes, seed=seed),
        batch_format="pyarrow", batch_size=None,
    )


def _band_signatures(sf_dir: str, n_bands: int, planes_per_band: int,
                     seed: int) -> ray.data.Dataset:
    """(vec_id, band_id, bucket): one row per vector per band, bucket
    = the band's hyperplane sign bits. Ids-only — vectors do NOT ride
    the explode (at 16 bands that would shuffle the corpus 16×);
    exact similarity is recovered later by joining embeddings back."""

    return _read_embeddings(sf_dir).map_batches(
        stateful(BandSigner, n_bands=n_bands,
                 planes_per_band=planes_per_band, seed=seed),
        batch_format="pyarrow", batch_size=None,
    )


def lsh_near_dups(
    sf_dir: str,
    threshold: float = 0.95,
    n_bands: int = 16,
    planes_per_band: int = 4,
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Near-dup pairs via banded random-hyperplane LSH — the scale
    path (same output contract as ``near_dup_pairs``): band explode →
    bucket groupby → candidate pairs → pair dedup → exact-cosine
    verify through candidates ⋈ embeddings hash joins. Vectors
    shuffle at most twice (once per join side) regardless of band
    count; candidate volume bounds everything else. Precision is
    exact (verification); recall is the LSH band-collision
    probability 1-(1-(1-θ/π)^p)^b — at cos ≥ 0.95, p=4, b=16 the
    per-pair miss rate is ~4e-8."""
    bands = _band_signatures(sf_dir, n_bands, planes_per_band, seed)

    from ..stages.util import attach_column, bucket_pairs, grouped_pairs

    # within-bucket pairs via the fixed-partition numpy lowering —
    # never groupby(bucket).map_groups (buckets ≈ vectors × bands)
    candidates = grouped_pairs(
        bucket_pairs(bands, ["band_id", "bucket"], "vec_id",
                     out_a="vec_a", out_b="vec_b", num_parts=16),
        "vec_a", "vec_b", alias="n_bands_hit",
    )

    emb = _read_embeddings(sf_dir)
    emb_type = pa.list_(pa.float32())
    pair_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    with_a = attach_column(
        candidates, emb, item_key="vec_a", lookup_key="vec_id",
        payload_col="embedding", out_col="emb_a",
        item_schema=pair_schema, payload_type=emb_type,
    )
    with_both = attach_column(
        with_a, emb, item_key="vec_b", lookup_key="vec_id",
        payload_col="embedding", out_col="emb_b",
        item_schema=pa.schema(
            [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("emb_a", emb_type)]
        ),
        payload_type=emb_type,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_a" not in batch.column_names:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()),
                 "vec_b": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        ea = _normalize(np.array(batch["emb_a"].to_pylist(), dtype=np.float64))
        eb = _normalize(np.array(batch["emb_b"].to_pylist(), dtype=np.float64))
        sims = np.round((ea * eb).sum(axis=1), 6)
        keep = sims >= threshold
        a = batch["vec_a"].to_numpy()[keep]
        b = batch["vec_b"].to_numpy()[keep]
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "sim": pa.array(sims[keep], pa.float64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the prebuilt-index scale path
# ---------------------------------------------------------------------------


@ray.remote
def _train_centroids(path: str, n_centroids: int, iters: int, seed: int):
    """Deterministic coarse quantizer: seeded init + fixed Lloyd
    iteration count over the (sampled) corpus, trained in a WORKER
    task. At 100 TB the sample is a hash-filtered read; here the
    table is the sample."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    mat = _normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = mat @ centroids.T                      # cosine on unit vectors
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def build_ivf_index(sf_dir: str, index_dir: str, n_centroids: int = 16,
                    iters: int = 5, seed: int = 42) -> np.ndarray:
    """Assign every vector to its nearest centroid and write the
    corpus as Parquet PARTITIONED BY cell (plus a centroids file):
    a query then reads only its probed cells' partitions — the read
    itself prunes, which is the property that matters at 10^9
    vectors. Returns the centroid matrix."""
    import os

    import pyarrow.parquet as pq

    centroids = ray.get(
        _train_centroids.remote(
            f"{sf_dir}/embeddings.parquet", n_centroids, iters, seed
        )
    )
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, emb = _matrix(batch)
        cells = (_normalize(emb) @ cents.T).argmax(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": batch["embedding"],
                "cell": pa.array(cells.astype(np.int32), pa.int32()),
            }
        )

    _read_embeddings(sf_dir).map_batches(
        assign, batch_format="pyarrow", batch_size=None
    ).write_parquet(index_dir, partition_cols=["cell"])
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table({"centroid": [row.tolist() for row in centroids]}),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    return centroids


def ivf_topk(sf_dir: str, query_ids: list[int], k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, iters: int = 5,
             seed: int = 42, index_dir: str | None = None) -> ray.data.Dataset:
    """Approximate cosine top-k via the IVF index: per query, read
    ONLY the ``n_probe`` nearest cells' partitions and brute-force
    within (exact math on the probed subset). Output contract matches
    ``ann_topk``; recall is test-pinned against the exact twin.
    ``index_dir=None`` builds a fresh index under /tmp (cached per
    (sf_dir, params) so repeated driver calls reuse it)."""
    import hashlib as _hl
    import os

    import pyarrow.parquet as pq

    if index_dir is None:
        # cache tag includes the data file's mtime+size: regenerating
        # embeddings.parquet at the same path must invalidate the
        # cached index, or stale cell assignments silently diverge
        # from the exact oracle
        st = os.stat(f"{sf_dir}/embeddings.parquet")
        tag = _hl.md5(
            f"{os.path.abspath(sf_dir)}|{n_centroids}|{iters}|{seed}"
            f"|{st.st_mtime_ns}|{st.st_size}".encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/ftw_crawler_ray_ivf/{tag}"
    cent_path = os.path.join(index_dir, "_centroids.parquet")
    if not os.path.exists(cent_path):
        build_ivf_index(sf_dir, index_dir, n_centroids, iters, seed)
    centroids = np.array(
        pq.read_table(cent_path)["centroid"].to_pylist(), dtype=np.float64
    )

    qids, qmat = load_query_matrix(sf_dir, query_ids)
    probe_cells = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    cells_needed = sorted({int(c) for row in probe_cells for c in row})
    q_ref = ray.put((qids, qmat, {int(q): set(map(int, row))
                                  for q, row in zip(qids, probe_cells)}))

    # partition-pruned read: only the probed cells' partitions leave
    # storage. PathPartitionFilter (hive style) works on any
    # filesystem read_parquet supports — no local glob — and skips
    # unpartitioned files (the _centroids sidecar) via the empty-dict
    # convention.
    from ray.data.datasource.partitioning import PathPartitionFilter

    cells_set = {str(c) for c in cells_needed}
    index = ray.data.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(
            lambda d: bool(d) and d.get("cell") in cells_set,
            base_dir=index_dir,
        ),
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_, probes = ray.get(q_ref)
        ids, emb = _matrix(batch)
        emb = _normalize(emb)
        # cell of this partition's rows (hive column absent in batch →
        # recompute against centroids; cheap: one small matmul)
        cells = (emb @ centroids.T).argmax(axis=1)
        sims = np.round(emb @ qmat_.T, 6)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids_):
            mask = np.isin(cells, list(probes[int(qid)]))
            if not mask.any():
                continue
            col = sims[mask, j]
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -col))[: min(k, mask.sum())]
            out_q.extend([qid] * len(order))
            out_v.extend(sub_ids[order])
            out_s.extend(col[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy()
        sims = group["sim"].to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        qid = group["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "vec_id": pa.array(ids[order], pa.int64()),
                "rank": pa.array(np.arange(len(order)), pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    candidates = index.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    )
    return candidates.groupby("query_id").map_groups(
        finalize, batch_format="pyarrow"
    )


def embedding_dedup(
    sf_dir: str,
    threshold: float = 0.4,
    n_bands: int = 64,
    planes_per_band: int = 4,
    seed: int = 42,
    scratch_dir: "str | None" = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup CLUSTERS — the vector-side twin of
    stages/dedup.minhash_dedup: banded-LSH candidate pairs with exact
    cosine verification (:func:`lsh_near_dups`) feed the distributed
    connected-components pass (min-label propagation with pointer
    doubling, stages/dedup.connected_components). Output: (vec_id,
    cluster_id = min vec_id of the component) for every vector in
    ≥ 1 near-dup relation — drop non-representatives to dedup a
    corpus by embedding similarity.

    Scale shape inherits both parents: vectors shuffle at most twice
    (the verify joins), components exchange only int labels."""
    from .dedup import connected_components

    pairs = lsh_near_dups(
        sf_dir, threshold=threshold, n_bands=n_bands,
        planes_per_band=planes_per_band, seed=seed,
    )

    def as_edges(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "vec_a" not in t.column_names:
            return empty
        return pa.table(
            {"doc_a": t["vec_a"].combine_chunks().cast(pa.int64()),
             "doc_b": t["vec_b"].combine_chunks().cast(pa.int64())}
        )

    comps = connected_components(
        pairs.map_batches(as_edges, batch_format="pyarrow",
                          batch_size=None),
        scratch_dir=scratch_dir,
    )

    def rename(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("vec_id", pa.int64()), ("cluster_id", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return empty
        return pa.table(
            {"vec_id": t["doc_id"], "cluster_id": t["cluster_id"]}
        )

    return comps.map_batches(rename, batch_format="pyarrow",
                             batch_size=None)
