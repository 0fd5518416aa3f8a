"""Shared stage helpers."""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def sized_read_parquet(path: str, *, columns=None,
                       bytes_per_task: int = 16 << 20,
                       min_blocks: int | None = None,
                       **kw) -> "ray.data.Dataset":
    """``read_parquet`` with the task count sized to INPUT BYTES
    instead of Ray's cpu-count heuristic. Ray's default splits even a
    0.2 MB table into 2×num_cpus eight-row blocks, and the per-task
    dispatch of every downstream operator then dominates wall time
    (measured 3× end-to-end on lsh_near_dups at sf0.01). One read
    task per 16 MB of file bytes: tiny inputs collapse to a handful
    of blocks; at scale the byte count exceeds the cpu heuristic
    anyway, so the override asks for MORE parallelism, never less.
    Non-local paths (object stores) fall through to Ray's default.

    ``min_blocks`` floors the task count regardless of byte size —
    for a small table feeding an ACTOR POOL (the crawl plan → fetch
    pool), where one block = one pool task and a byte-sized read
    would leave all but a handful of actors idle."""
    size = None
    if os.path.isfile(path):
        size = os.path.getsize(path)
    elif os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")
        )
    if size:
        blocks = max(1, math.ceil(size / bytes_per_task))
        if min_blocks:
            blocks = max(blocks, min_blocks)
        kw.setdefault("override_num_blocks", blocks)
    elif min_blocks:
        kw.setdefault("override_num_blocks", min_blocks)
    return ray.data.read_parquet(path, columns=columns, **kw)


@contextmanager
def payload_block_ctx(max_bytes: int = 16 * 1024 * 1024):
    """Cap ``target_max_block_size`` (default Ray: 128 MiB) while a
    payload-expanding pipeline builds AND executes.

    Fetch output carries full page bodies, so at the default size a
    single upstream task emits 40-120 MB blocks that pass through
    whole — the CPU-heavy extract stage then inherits the upstream
    task count instead of fanning out (measured: 25 → ~100-176 even
    tasks, 28.9 → 21.0 s on the 1.66M-page bench crawl). Restores the
    caller's value on exit so a shared driver context (the
    ``queries()`` surface) is never left mutated."""
    dctx = ray.data.DataContext.get_current()
    prev = dctx.target_max_block_size
    dctx.target_max_block_size = max_bytes
    try:
        yield
    finally:
        dctx.target_max_block_size = prev


def stage_dir(scratch_dir: "str | None", label: str) -> str:
    """Unique per-invocation staging directory for Parquet handoffs
    between pipeline stages (keeper texts, component labels, …).

    Every call returns a FRESH subdirectory — ``<root>/<label>_<uuid>``
    — so a caller reusing one ``scratch_dir`` across runs (the run-dir
    checkpoint discipline) never re-reads stale files from an earlier
    invocation: Ray's ``write_parquet`` appends uniquely-named files
    and would otherwise mix old and new rows.

    Lifecycle: with ``scratch_dir`` the CALLER owns cleanup (staged
    files must outlive this function — the datasets that read them are
    lazy). Without it, the root comes from ``tempfile.mkdtemp`` and is
    deleted at interpreter exit (the earliest point that is safe for
    an unknown consumer of the returned lazy dataset).

    Topology requirement: the path must be reachable under the SAME
    name from every worker — a shared filesystem (NFS/FUSE-mounted
    object store) on multi-node clusters; on the single-node sandbox
    any local path works. For pure-object-store deployments point
    ``scratch_dir`` at the mounted bucket path."""
    import atexit
    import shutil
    import tempfile
    import uuid

    if scratch_dir is None:
        root = tempfile.mkdtemp(prefix="ftw_stage_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    else:
        root = scratch_dir
    d = os.path.join(root, f"{label}_{uuid.uuid4().hex[:12]}")
    os.makedirs(d, exist_ok=True)
    return d


def ensure_schema(schema: pa.Schema):
    """Schema-preserving batch normalizer: Ray hash-shuffle stages
    (groupby / aggregate) can emit EMPTY schemaless blocks, which
    crash Acero when they reach a downstream hash join ("No match
    for FieldRef"). Map every batch onto the declared schema so
    empty blocks stay typed. Use on any join input whose plan
    contains a groupby."""

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or set(schema.names) - set(batch.column_names):
            return schema.empty_table()
        return batch.select(schema.names).cast(schema)

    return fix


# Per-worker-process instance memo for `stateful` stages (a Ray worker
# process survives across tasks, so this plays the role of an actor's
# __init__-once state without a dedicated pool).
_WORKER_STATE: dict = {}


def stateful(cls, **ctor_kwargs):
    """Run a callable-class stage on the elastic TASK pool with its
    instance built once per worker process.

    ``map_batches(Cls, concurrency=(m, n))`` spins up a dedicated
    actor pool — right for EXPENSIVE state (HTTP sessions, codecs,
    loaded models: pipelines/fetch_http.py, stages/multimodal.py) but
    pure overhead for cheap state (hash params, regex tables, memo
    caches): pool spin-up costs ~2 s per stage, autoscaling ramps from
    one actor on short jobs, and reserved actors compete with every
    other stage for CPUs. This wrapper keeps the once-per-worker setup
    semantics of an actor ``__init__`` (Ray reuses worker processes
    across tasks) while the scheduler spreads tasks over all idle
    workers immediately — measured 2× faster than a (1, 8) pool on
    the minhash signature stage with identical output.

    ``ctor_kwargs`` values must be hashable (they key the per-process
    memo alongside the class identity)."""
    key = (cls.__module__, cls.__qualname__,
           tuple(sorted(ctor_kwargs.items())))

    def fn(batch):
        inst = _WORKER_STATE.get(key)
        if inst is None:
            inst = cls(**ctor_kwargs)
            _WORKER_STATE[key] = inst
        return inst(batch)

    fn.__name__ = cls.__name__
    return fn


# Partition-id space is OVERSAMPLE× finer than the shuffle's partition
# count: Ray's sort shuffle draws range boundaries from value samples,
# and with only num_parts distinct key values the 10·num_parts samples
# collide, leaving EMPTY ranges — for which merge_sorted_blocks
# manufactures a SCHEMALESS empty block (ArrowBlockBuilder's bare
# build), the source of every streaming_executor "new schema: ."
# warning and of Acero "No match for FieldRef" crashes at joins.
# 16× more distinct values than boundaries makes collisions
# vanishingly rare; logical keys still co-locate (same key → same
# part value → same range), each range just holds ~16 part-groups.
PART_OVERSAMPLE = 16


def part_space(num_parts: int) -> int:
    """Size of the partition-id space callers should mod by when
    deriving a ``__part`` column for :func:`partitioned_groups`."""
    return num_parts * PART_OVERSAMPLE


def partitioned_groups(
    ds: "ray.data.Dataset",
    finalize,
    *,
    mid_schema: pa.Schema,
    num_parts: int,
    part_col: str = "__part",
) -> "ray.data.Dataset":
    """``groupby(part_col).map_groups(finalize)`` hardened against
    Ray's empty-range schemaless blocks, two ways:

    1. SENTINEL SEEDING — one row per partition id. Ray's
       ``map_groups`` never invokes the UDF on an empty partition
       (``_apply_udf_to_groups`` finds zero group boundaries) and a
       range with no rows gets a SCHEMALESS empty block from the sort
       reduce itself; typed-empty returns inside the UDF can't fix
       either (the UDF never runs). Seeding guarantees every value of
       the id space exists, so every sampled boundary range is
       non-empty and every output block is produced by ``finalize``
       with the declared schema. Sentinels are stripped before
       ``finalize`` sees the group.
    2. OVERSAMPLED ID SPACE — see :data:`PART_OVERSAMPLE` above.

    ``ds`` must already emit ``mid_schema`` batches (typed empties
    included) with ``part_col`` values in
    ``[0, part_space(num_parts))``. ``finalize`` receives one group
    per part value (complete: a logical key never splits across part
    values) and must handle an empty group."""
    seeded = pa.schema(list(mid_schema) + [("__sent", pa.int8())])
    n_ids = part_space(num_parts)

    def add_flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or part_col not in t.column_names:
            return seeded.empty_table()
        return t.cast(mid_schema).append_column(
            "__sent", pa.array(np.zeros(t.num_rows, np.int8), pa.int8())
        )

    cols = {}
    for f in mid_schema:
        if f.name == part_col:
            cols[f.name] = pa.array(np.arange(n_ids), f.type)
        else:
            cols[f.name] = pa.nulls(n_ids, f.type)
    cols["__sent"] = pa.array(np.ones(n_ids, np.int8), pa.int8())
    sentinels = ray.data.from_arrow(pa.table(cols, schema=seeded))

    def departitioned(group: pa.Table) -> pa.Table:
        if "__sent" in group.column_names:
            group = group.filter(
                pc.equal(group["__sent"], 0)
            ).drop_columns(["__sent"])
        return finalize(group)

    departitioned.__name__ = getattr(finalize, "__name__", "finalize")
    return (
        ds.map_batches(add_flag, batch_format="pyarrow", batch_size=None)
        .union(sentinels)
        .groupby(part_col, num_partitions=num_parts)
        .map_groups(departitioned, batch_format="pyarrow")
    )


def attach_column(
    items: "ray.data.Dataset",
    lookup: "ray.data.Dataset",
    *,
    item_key: str,
    lookup_key: str,
    payload_col: str,
    out_col: str,
    item_schema: pa.Schema,
    payload_type: pa.DataType,
    num_parts: int = 64,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Equi-join one payload column onto ``items`` (``how="inner"``,
    the default, drops unmatched items; ``how="left"`` keeps them
    with a null payload) via a tagged union + FIXED-partition shuffle
    + an in-partition hash join.

    Why not ``Dataset.join``: Ray 2.49's hash-shuffle join (a) crashes
    on any shuffle partition that receives zero shards on one side
    (the empty ArrowBlockBuilder yields a schemaless table Acero
    rejects), which makes small or skewed key sets a coin flip, and
    (b) deadlocks when two join ops share a streaming plan.

    Why partition-then-dict rather than ``groupby(key).map_groups``:
    Ray pays Python time per GROUP, so millions of keys cost minutes;
    here the shuffle has ``num_parts`` groups total and each
    partition joins through one dict built at C speed. Both sides of
    a key always land in the same partition (same hash), and payload
    columns can be any Arrow type including lists.
    """
    full = pa.schema(
        [("__key", pa.int64()), ("__part", pa.int32())]
        + list(item_schema)
        + [(out_col, payload_type), ("__is_item", pa.int8())]
    )
    out_schema = pa.schema(list(item_schema) + [(out_col, payload_type)])

    def _part_of(keys: np.ndarray) -> np.ndarray:
        return (
            (keys.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)

    def tag_items(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or item_key not in t.column_names:
            return full.empty_table()
        n = t.num_rows
        keys = t[item_key].to_numpy().astype(np.int64)
        cols = {"__key": pa.array(keys, pa.int64()),
                "__part": pa.array(_part_of(keys), pa.int32())}
        for f in item_schema:
            cols[f.name] = t[f.name].combine_chunks().cast(f.type)
        cols[out_col] = pa.nulls(n, payload_type)
        cols["__is_item"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        return pa.table(cols, schema=full)

    def tag_lookup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lookup_key not in t.column_names:
            return full.empty_table()
        n = t.num_rows
        keys = t[lookup_key].to_numpy().astype(np.int64)
        cols = {"__key": pa.array(keys, pa.int64()),
                "__part": pa.array(_part_of(keys), pa.int32())}
        for f in item_schema:
            cols[f.name] = pa.nulls(n, f.type)
        cols[out_col] = t[payload_col].combine_chunks().cast(payload_type)
        cols["__is_item"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
        return pa.table(cols, schema=full)

    def join_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__is_item" not in group.column_names:
            return out_schema.empty_table()
        is_item = pc.equal(group["__is_item"], 1)
        item_rows = group.filter(is_item)
        payload_rows = group.filter(pc.invert(is_item))
        if item_rows.num_rows == 0:
            return out_schema.empty_table()
        if payload_rows.num_rows == 0:
            if how != "left":
                return out_schema.empty_table()
            cols = {f.name: item_rows[f.name] for f in item_schema}
            cols[out_col] = pa.nulls(item_rows.num_rows, payload_type)
            return pa.table(cols, schema=out_schema)
        # vectorized hash join: sorted payload keys + searchsorted +
        # Arrow take — no per-row Python, and list/large payloads move
        # by buffer, not through pylist round-trips
        pk = payload_rows["__key"].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk_sorted = pk[order]
        ik = item_rows["__key"].to_numpy()
        pos = np.searchsorted(pk_sorted, ik)
        pos_c = np.minimum(pos, len(pk_sorted) - 1)
        hit = pk_sorted[pos_c] == ik
        if how == "left":
            # null-padded take: a null index yields a null output slot,
            # which works for ANY payload type (lists included)
            idx = pa.array(order[pos_c].astype(np.int64), mask=~hit)
            payload = (
                payload_rows[out_col].combine_chunks()
                .cast(payload_type).take(idx)
            )
            cols = {f.name: item_rows[f.name] for f in item_schema}
            cols[out_col] = payload
            return pa.table(cols, schema=out_schema)
        item_rows = item_rows.filter(pa.array(hit))  # inner-join semantics
        sel = order[pos_c[hit]]
        payload = payload_rows.take(pa.array(sel, pa.int64()))[out_col]
        cols = {f.name: item_rows[f.name] for f in item_schema}
        cols[out_col] = payload.combine_chunks().cast(payload_type)
        return pa.table(cols, schema=out_schema)

    tagged = items.map_batches(
        tag_items, batch_format="pyarrow", batch_size=None
    ).union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow", batch_size=None)
    )
    return partitioned_groups(
        tagged, join_part, mid_schema=full, num_parts=num_parts
    )


def grouped_pairs(
    ds: "ray.data.Dataset",
    a_col: str,
    b_col: str,
    *,
    value_col: str | None = None,
    mode: str = "count",
    alias: str = "n",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Distinct (a, b) pairs with an aggregated value — ``count`` of
    occurrences or ``min`` of ``value_col`` — lowered to a per-batch
    numpy pre-combine + a FIXED-small-partition shuffle + a C-speed
    per-partition reduce.

    Why not ``groupby([a, b]).aggregate(...)``: Ray's aggregate costs
    Python time per DISTINCT key; at millions of candidate pairs that
    is minutes for work numpy does in milliseconds. Here the shuffle
    key is ``hash(a, b) % num_parts`` (both halves of a pair always
    co-locate), and every reduce is lexsort + reduceat."""
    out_type = pa.int64()

    def _reduce(a, b, v):
        order = np.lexsort((b, a))
        a, b, v = a[order], b[order], v[order]
        if len(a) == 0:
            return a, b, v
        new = np.r_[True, (np.diff(a) != 0) | (np.diff(b) != 0)]
        starts = np.nonzero(new)[0]
        if mode == "count":
            agg = np.add.reduceat(v, starts)
        else:
            agg = np.minimum.reduceat(v, starts)
        return a[starts], b[starts], agg

    out_schema = pa.schema(
        [(a_col, pa.int64()), (b_col, pa.int64()), (alias, out_type),
         ("__part", pa.int32())]
    )
    final_schema = pa.schema(
        [(a_col, pa.int64()), (b_col, pa.int64()), (alias, out_type)]
    )

    def precombine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or a_col not in t.column_names:
            return out_schema.empty_table()
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        v = (
            t[value_col].to_numpy().astype(np.int64)
            if value_col is not None
            else np.ones(len(a), dtype=np.int64)
        )
        a, b, v = _reduce(a, b, v)
        part = (
            (a.astype(np.uint64) * np.uint64(2654435761)) ^ b.astype(np.uint64)
        ) % np.uint64(part_space(num_parts))
        return pa.table(
            {a_col: pa.array(a, pa.int64()), b_col: pa.array(b, pa.int64()),
             alias: pa.array(v, out_type),
             "__part": pa.array(part.astype(np.int32), pa.int32())},
            schema=out_schema,
        )

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or a_col not in group.column_names:
            return final_schema.empty_table()
        a = group[a_col].to_numpy().astype(np.int64)
        b = group[b_col].to_numpy().astype(np.int64)
        v = group[alias].to_numpy().astype(np.int64)
        a, b, v = _reduce(a, b, v)
        return pa.table(
            {a_col: pa.array(a, pa.int64()), b_col: pa.array(b, pa.int64()),
             alias: pa.array(v, out_type)},
            schema=final_schema,
        )

    return partitioned_groups(
        ds.map_batches(precombine, batch_format="pyarrow", batch_size=None),
        finalize, mid_schema=out_schema, num_parts=num_parts,
    )


def bucket_pairs(
    ds: "ray.data.Dataset",
    key_cols: "list[str]",
    id_col: str,
    *,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
    payload_col: str | None = None,
    pair_fn=None,
    value_alias: str = "v",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """All within-bucket (a < b) id pairs, lowered to a FIXED-partition
    shuffle + a vectorized triangular expansion per partition.

    Why not ``groupby(bucket_cols).map_groups(pairs_in_bucket)``: LSH
    band explosion makes distinct buckets ≈ n_docs × n_bands, and Ray
    pays Python dispatch per GROUP — at 10⁸ docs that is billions of
    groups (the CLAUDE.md anti-pattern). Here the shuffle key is
    ``hash(bucket) % num_parts`` (a bucket never splits), and each
    partition does ONE lexsort + segment scan emitting every pair in
    numpy. Bucket identity is preserved exactly (segment boundaries
    compare both key columns, not their combined hash), so candidate
    sets are identical to the per-bucket formulation.

    ``payload_col`` (uint64) rides along; ``pair_fn(pay_a, pay_b) ->
    (mask, values)`` then filters/annotates pairs vectorized (e.g.
    hamming-distance ≤ radius for simhash). Without it, all pairs are
    emitted with no value column. Duplicate (bucket, id) rows are
    dropped; ids within a segment are ascending so a < b always."""
    k0_col, k1_col = key_cols

    has_value = pair_fn is not None
    mid_fields = [("__k0", pa.uint64()), ("__k1", pa.uint64()),
                  ("__id", pa.int64())]
    if payload_col is not None:
        mid_fields.append(("__pay", pa.uint64()))
    mid_fields.append(("__part", pa.int32()))
    mid_schema = pa.schema(mid_fields)
    out_fields = [(out_a, pa.int64()), (out_b, pa.int64())]
    if has_value:
        out_fields.append((value_alias, pa.int64()))
    out_schema = pa.schema(out_fields)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or k0_col not in t.column_names:
            return mid_schema.empty_table()
        k0 = t[k0_col].to_numpy().astype(np.uint64)
        k1 = t[k1_col].to_numpy().astype(np.uint64)
        part = (
            (k0 * np.uint64(2654435761) ^ k1 * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        cols = {
            "__k0": pa.array(k0, pa.uint64()),
            "__k1": pa.array(k1, pa.uint64()),
            "__id": t[id_col].combine_chunks().cast(pa.int64()),
        }
        if payload_col is not None:
            cols["__pay"] = pa.array(
                t[payload_col].to_numpy().astype(np.uint64), pa.uint64()
            )
        cols["__part"] = pa.array(part, pa.int32())
        return pa.table(cols, schema=mid_schema)

    def gen(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or "__k0" not in group.column_names:
            return out_schema.empty_table()
        k0 = group["__k0"].to_numpy().astype(np.uint64)
        k1 = group["__k1"].to_numpy().astype(np.uint64)
        ids = group["__id"].to_numpy().astype(np.int64)
        pay = (
            group["__pay"].to_numpy().astype(np.uint64)
            if payload_col is not None else None
        )
        order = np.lexsort((ids, k1, k0))
        k0, k1, ids = k0[order], k1[order], ids[order]
        if pay is not None:
            pay = pay[order]
        keep = np.r_[
            True,
            (np.diff(k0) != 0) | (np.diff(k1) != 0) | (np.diff(ids) != 0),
        ]
        if not keep.all():
            k0, k1, ids = k0[keep], k1[keep], ids[keep]
            if pay is not None:
                pay = pay[keep]
        n = len(ids)
        new_seg = np.r_[True, (np.diff(k0) != 0) | (np.diff(k1) != 0)]
        starts = np.nonzero(new_seg)[0]
        grp = np.cumsum(new_seg) - 1
        counts = np.arange(n) - starts[grp]  # element pairs w/ p predecessors
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        b_idx = np.repeat(np.arange(n), counts)
        cum_excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(total) - np.repeat(cum_excl, counts)
        a_idx = np.repeat(starts[grp], counts) + within
        a_ids, b_ids = ids[a_idx], ids[b_idx]
        cols = {out_a: None, out_b: None}
        if has_value:
            mask, values = pair_fn(pay[a_idx], pay[b_idx])
            a_ids, b_ids = a_ids[mask], b_ids[mask]
            cols[value_alias] = pa.array(
                np.asarray(values)[mask].astype(np.int64), pa.int64()
            )
        cols[out_a] = pa.array(a_ids, pa.int64())
        cols[out_b] = pa.array(b_ids, pa.int64())
        return pa.table(cols, schema=out_schema)

    return partitioned_groups(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None),
        gen, mid_schema=mid_schema, num_parts=num_parts,
    )


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bit order irrelevant)."""
    return (
        np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
        if len(x)
        else np.zeros(0, dtype=np.int64)
    )


def grouped_agg(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    *,
    mode: str = "min",
    out_key: str | None = None,
    out_value: str | None = None,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Single-key ``min``/``sum`` aggregate lowered exactly like
    grouped_pairs: per-batch lexsort+reduceat pre-combine → fixed
    ``num_parts`` shuffle → the same C-speed reduce per partition.
    Use instead of ``groupby(key).aggregate(...)`` whenever distinct
    keys number in the tens of thousands or more."""
    out_key = out_key or key_col
    out_value = out_value or value_col
    mid_schema = pa.schema(
        [(key_col, pa.int64()), (value_col, pa.int64()),
         ("__part", pa.int32())]
    )
    final_schema = pa.schema([(out_key, pa.int64()), (out_value, pa.int64())])
    reducer = np.minimum.reduceat if mode == "min" else np.add.reduceat

    def _reduce(k, v):
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        if len(k) == 0:
            return k, v
        starts = np.nonzero(np.r_[True, np.diff(k) != 0])[0]
        return k[starts], reducer(v, starts)

    def precombine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return mid_schema.empty_table()
        k = t[key_col].to_numpy().astype(np.int64)
        v = t[value_col].to_numpy().astype(np.int64)
        k, v = _reduce(k, v)
        part = (
            (k.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(part_space(num_parts))
        ).astype(np.int32)
        return pa.table(
            {key_col: pa.array(k, pa.int64()),
             value_col: pa.array(v, pa.int64()),
             "__part": pa.array(part, pa.int32())},
            schema=mid_schema,
        )

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key_col not in group.column_names:
            return final_schema.empty_table()
        k = group[key_col].to_numpy().astype(np.int64)
        v = group[value_col].to_numpy().astype(np.int64)
        k, v = _reduce(k, v)
        return pa.table(
            {out_key: pa.array(k, pa.int64()),
             out_value: pa.array(v, pa.int64())},
            schema=final_schema,
        )

    return partitioned_groups(
        ds.map_batches(precombine, batch_format="pyarrow", batch_size=None),
        finalize, mid_schema=mid_schema, num_parts=num_parts,
    )
