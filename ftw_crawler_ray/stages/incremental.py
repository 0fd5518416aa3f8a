"""Incrementality: frontier ⋈ index_state (J1) + is_modified (S6).

The reference does an O(urls × indexed_docs) linear scan per URL
(main.py:61-66) and a per-URL lastmod/HEAD check (fetcher.py:26-43).
Here J1 is a hash-partitioned left join on ``url`` (every block
shuffled once, no driver-side state) and S6 is a vectorized Arrow
predicate:

    modified ⇔ last_indexed IS NULL            (never indexed)
             ∨ lastmod IS NULL                 (HEAD fallback → True in-corpus)
             ∨ parse(lastmod) > last_indexed

Scale note: index_state is usually ≪ frontier; when it fits the
object store comfortably, ``broadcast=True`` skips the shuffle by
shipping a url→last_modified dict via ``ray.put`` once and doing the
lookup inside ``map_batches`` (SURVEY.md §2.5 J1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sources.pages import read_frontier, read_index_state

_JOIN_PARTITIONS = 16


def _parse_lastmod_us(lastmod: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """ISO 'YYYY-MM-DDTHH:MM:SS' strings → datetime64[us] (NaT for
    null). The corpus writes strict ISO so a vectorized numpy cast is
    exact; arbitrary sitemap dates go through functions.dates kernels
    in the sitemap parse stage."""
    vals = lastmod.to_pylist()
    return np.array(
        [v if v is not None else "NaT" for v in vals], dtype="datetime64[us]"
    )


def join_index_state(
    sf_dir: str,
    broadcast: bool = False,
    columns: tuple = ("url", "lastmod", "seq"),
    replicate: int = 1,
) -> ray.data.Dataset:
    """J1: frontier LEFT JOIN index_state ON url → adds last_indexed."""
    frontier = read_frontier(sf_dir, replicate).select_columns(list(columns))
    index_state = read_index_state(sf_dir, replicate).select_columns(
        ["url", "last_modified"]
    )

    if broadcast:
        # Build the lookup dict in a WORKER task from the streamed
        # index_state — the driver only ever holds the ObjectRef
        # (never materializes a corpus-scaled table).
        @ray.remote
        def _build_lookup(refs):
            out: dict = {}
            for batch in refs.iter_batches(batch_format="pyarrow"):
                out.update(
                    zip(batch["url"].to_pylist(),
                        batch["last_modified"].to_pylist())
                )
            return out

        lookup_ref = _build_lookup.remote(index_state)

        def add_last_indexed(batch: pa.Table) -> pa.Table:
            lookup = ray.get(lookup_ref)
            vals = [lookup.get(u) for u in batch["url"].to_pylist()]
            return batch.append_column(
                "last_indexed", pa.array(vals, type=pa.timestamp("us"))
            )

        return frontier.map_batches(add_last_indexed, batch_format="pyarrow", batch_size=None)

    joined = frontier.join(
        index_state,
        join_type="left_outer",
        num_partitions=_JOIN_PARTITIONS,
        on=("url",),
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            [
                "last_indexed" if c == "last_modified" else c
                for c in t.column_names
            ]
        ),
        batch_format="pyarrow", batch_size=None,
    )


def is_modified_mask(batch: pa.Table) -> np.ndarray:
    lastmod_us = _parse_lastmod_us(batch["lastmod"])
    li_col = batch["last_indexed"]
    if pa.types.is_timestamp(li_col.type):
        li_us = li_col.to_numpy(zero_copy_only=False).astype("datetime64[us]")
    else:  # object fallback (e.g. pandas-roundtripped blocks)
        vals = li_col.to_pylist()
        li_us = np.array(
            [v if v is not None else "NaT" for v in vals], dtype="datetime64[us]"
        )
    never_indexed = np.isnat(li_us)
    no_lastmod = np.isnat(lastmod_us)
    newer = np.zeros(len(batch), dtype=bool)
    both = ~never_indexed & ~no_lastmod
    newer[both] = lastmod_us[both] > li_us[both]
    return never_indexed | no_lastmod | newer


def fetch_candidates(sf_dir: str) -> ray.data.Dataset:
    """S6 filter over J1 output → the fetch-ready frontier subset."""

    def keep_modified(batch: pa.Table) -> pa.Table:
        out = batch.filter(pa.array(is_modified_mask(batch)))
        return out.select(["url", "seq"])

    return join_index_state(sf_dir).map_batches(
        keep_modified, batch_format="pyarrow", batch_size=None
    )
