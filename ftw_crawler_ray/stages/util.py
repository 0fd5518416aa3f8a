"""Shared stage helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


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
) -> "ray.data.Dataset":
    """Equi-join one payload column onto ``items`` (inner-join
    semantics) via a tagged union + groupby — the sort-shuffle
    lookup-join lowering.

    Why not ``Dataset.join``: Ray 2.49's hash-shuffle join (a) crashes
    on any shuffle partition that receives zero shards on one side
    (the empty ArrowBlockBuilder yields a schemaless table Acero
    rejects), which makes small or skewed key sets a coin flip, and
    (b) deadlocks when two join ops share a streaming plan. A
    groupby carries exactly the same data volume (one shuffle keyed
    by the join key) without either failure mode, and payload columns
    can be any Arrow type including lists.

    Partitioning assumption: all rows of one key fit one group —
    true when ``lookup`` is unique per key (our case: doc_id / vec_id
    lookups) and item fan-in per key is bounded.
    """
    full = pa.schema(
        [("__key", pa.int64())]
        + list(item_schema)
        + [(out_col, payload_type), ("__is_item", pa.int8())]
    )
    out_schema = pa.schema(list(item_schema) + [(out_col, payload_type)])

    def tag_items(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or item_key not in t.column_names:
            return full.empty_table()
        n = t.num_rows
        cols = {"__key": t[item_key].combine_chunks().cast(pa.int64())}
        for f in item_schema:
            cols[f.name] = t[f.name].combine_chunks().cast(f.type)
        cols[out_col] = pa.nulls(n, payload_type)
        cols["__is_item"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        return pa.table(cols, schema=full)

    def tag_lookup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lookup_key not in t.column_names:
            return full.empty_table()
        n = t.num_rows
        cols = {"__key": t[lookup_key].combine_chunks().cast(pa.int64())}
        for f in item_schema:
            cols[f.name] = pa.nulls(n, f.type)
        cols[out_col] = t[payload_col].combine_chunks().cast(payload_type)
        cols["__is_item"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
        return pa.table(cols, schema=full)

    def emit(group: pa.Table) -> pa.Table:
        is_item = pc.equal(group["__is_item"], 1)
        item_rows = group.filter(is_item)
        payload_rows = group.filter(pc.invert(is_item))
        if item_rows.num_rows == 0 or payload_rows.num_rows == 0:
            return out_schema.empty_table()
        payload_val = payload_rows[out_col][0]
        cols = {f.name: item_rows[f.name] for f in item_schema}
        cols[out_col] = pa.chunked_array(
            [pa.Array.from_pandas(
                [payload_val.as_py()] * item_rows.num_rows, type=payload_type
            )]
        )
        return pa.table(cols, schema=out_schema)

    tagged = items.map_batches(
        tag_items, batch_format="pyarrow", batch_size=None
    ).union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow", batch_size=None)
    )
    return tagged.groupby("__key").map_groups(emit, batch_format="pyarrow")
