"""Synthetic Common-Crawl-style corpus, derived deterministically from
the driver's ``documents`` table — and reproducible in ANSI SQL.

``BASELINE.json.input_hint`` fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``. No such table ships in /root/testdata, so we derive
one 1:1 from ``documents.parquet`` (doc_id, text, lang, source,
n_chars) with pure column expressions. Because every derived column
is a simple string/arithmetic expression, the DuckDB oracle can
synthesize the *same* pages/frontier/index_state tables in SQL (see
``__ray_entry__.oracle_sql``) and check the whole crawl pipeline
end-to-end, value-for-value.

Layout: hosts ``h{doc_id % 41}.example.org`` (41 hosts → hot/cold mix
across frontier shards), one site per host, urls
``http://host/docs/page-{doc_id}``; ``html`` wraps the document text
in the reference test-asset structure (``div#content > h1``);
``text`` is title + newline + body so the Title/Snippet cascade has
real work to do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.util import sized_read_parquet

NUM_HOSTS = 41
TS0 = np.datetime64("2020-01-01T00:00:00", "us")

_HTML_PRE = b'<html><head><meta charset="utf-8"/><title>Doc '
_HTML_MID = b'</title></head><body><div id="content"><h1>Doc '
_HTML_MID2 = b"</h1><p>"
_HTML_POST = b"</p></div></body></html>"


def _ids_hosts(batch: pa.Table):
    doc_id = batch["doc_id"].combine_chunks()
    ids = pc.cast(doc_id, pa.string())
    host_n = pc.cast(pa.array(doc_id.to_numpy() % NUM_HOSTS), pa.string())
    host = pc.binary_join_element_wise("h", host_n, ".example.org", "")
    return doc_id, ids, host


def build_pages(doc_id: pa.Array, doc_text: pa.Array) -> pa.Table:
    """(doc_id, document text) → full pages columns. The shared
    kernel behind both the pages-table source and the sandbox fetch
    actor (which resolves a body per planned url)."""
    ids = pc.cast(doc_id, pa.string())
    host_n = pc.cast(pa.array(doc_id.to_numpy() % NUM_HOSTS), pa.string())
    host = pc.binary_join_element_wise("h", host_n, ".example.org", "")
    url = pc.binary_join_element_wise("http://", host, "/docs/page-", ids, "")
    warc_ts = pa.array(
        TS0 + (doc_id.to_numpy() * 60_000_000).astype("timedelta64[us]"),
        type=pa.timestamp("us"),
    )
    title = pc.binary_join_element_wise("Doc ", ids, "")
    text = pc.binary_join_element_wise(title, "\n", doc_text, "")
    n = len(ids)
    html = pc.binary_join_element_wise(
        pa.array([_HTML_PRE] * n, pa.binary()),
        pc.cast(ids, pa.binary()),
        pa.array([_HTML_MID] * n, pa.binary()),
        pc.cast(ids, pa.binary()),
        pa.array([_HTML_MID2] * n, pa.binary()),
        pc.cast(doc_text, pa.binary()),
        pa.array([_HTML_POST] * n, pa.binary()),
        pa.array([b""] * n, pa.binary()),
    )
    return pa.table(
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "content_type": pa.array(["text/html"] * n, pa.string()),
            "site_id": host,
            "doc_id": doc_id,
        }
    )


def pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch → pages batch (vectorized Arrow kernels)."""
    doc_id = batch["doc_id"].combine_chunks()
    pages = build_pages(doc_id, batch["text"].combine_chunks())
    return pages.append_column("lang", batch["lang"])


def frontier_batch(batch: pa.Table) -> pa.Table:
    """documents batch → frontier (sitemap url_info) batch.

    Mirrors the reference's url_info record (sitemap.py:15
    PROPERTIES, string-typed, absent-key → null): lastmod present for
    2/3 of rows, changefreq/priority/target sparsely populated, plus
    crawl-order ``seq`` and the canonical-host shard key (SURVEY.md
    §2.6 A3, §7.3).
    """
    doc_id, ids, host = _ids_hosts(batch)
    np_id = doc_id.to_numpy()
    url = pc.binary_join_element_wise("http://", host, "/docs/page-", ids, "")
    warc = pa.array(
        TS0 + (np_id * 60_000_000).astype("timedelta64[us]"),
        type=pa.timestamp("us"),
    )
    # ISO lastmod string of warc_ts, null for every 3rd row (HEAD-
    # fallback path in the reference, fetcher.py:35-42)
    lastmod = pc.if_else(
        pa.array(np_id % 3 == 2),
        pa.nulls(len(np_id), pa.string()),
        # cast to second resolution first: Arrow's %S prints
        # fractional digits for sub-second timestamp types
        pc.strftime(pc.cast(warc, pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%S"),
    )
    changefreq = pc.if_else(
        pa.array(np_id % 5 == 0),
        pa.scalar("daily", pa.string()),
        pa.nulls(len(np_id), pa.string()),
    )
    priority = pc.if_else(
        pa.array(np_id % 7 == 0),
        pa.scalar("1.0", pa.string()),
        pa.scalar("0.5", pa.string()),
    )
    target = pc.if_else(
        pa.array(np_id % 13 == 0),
        pc.binary_join_element_wise(url, "?target=1", ""),
        pa.nulls(len(np_id), pa.string()),
    )
    return pa.table(
        {
            "url": url,
            "lastmod": lastmod,
            "changefreq": changefreq,
            "priority": priority,
            "target": target,
            "site_id": host,
            "seq": pc.cast(doc_id, pa.int64()),
        }
    )


def index_state_batch(batch: pa.Table) -> pa.Table:
    """documents batch → previously-indexed docs (the Solr stand-in,
    reference main.py:49-66). Overlap design per FIXTURES.md §3:
    - doc_id % 6 == 0 → last_modified one day AFTER warc_ts (skip)
    - doc_id % 6 == 3 → one day BEFORE (re-fetch)
    - doc_id % 11 == 0 → a vanished url (purge candidate)
    - doc_id % 19 == 0 → a foreign-host url (must never be purged)
    """
    from ..functions.urlnorm import uid_for_url

    doc_id, ids, host = _ids_hosts(batch)
    np_id = doc_id.to_numpy()
    warc = TS0 + (np_id * 60_000_000).astype("timedelta64[us]")
    day = np.timedelta64(1, "D")
    m_after = np_id % 6 == 0
    m_mod = m_after | (np_id % 6 == 3)
    m_gone = np_id % 11 == 0
    m_foreign = np_id % 19 == 0

    def _page_urls(mask: np.ndarray, stem: str) -> pa.Array:
        idx = pa.array(np.flatnonzero(mask))
        return pc.binary_join_element_wise(
            "http://", host.take(idx), f"/docs/{stem}-",
            pc.cast(pa.array(np_id[mask]), pa.string()), ""
        )

    # three row groups instead of the historical per-doc interleave —
    # every consumer (union → shard shuffle, joins, sorted oracle
    # compare) is row-order-independent; the VALUES are pinned
    # identical to the row formulation by tests/test_stages.py
    urls = pa.concat_arrays([
        _page_urls(m_mod, "page"),
        _page_urls(m_gone, "gone"),
        pc.binary_join_element_wise(
            "http://other.example.net/docs/page-",
            pc.cast(pa.array(np_id[m_foreign]), pa.string()), ""
        ),
    ])
    last_mods = np.concatenate([
        np.where(m_after[m_mod], warc[m_mod] + day, warc[m_mod] - day),
        warc[m_gone],
        warc[m_foreign],
    ])
    site_ids = pa.concat_arrays([
        host.take(pa.array(np.flatnonzero(m_mod))),
        host.take(pa.array(np.flatnonzero(m_gone))),
        pa.array(["other.example.net"] * int(m_foreign.sum()), pa.string()),
    ])
    uids = pa.array([uid_for_url(u) for u in urls.to_pylist()], pa.string())
    return pa.table(
        {
            "uid": uids,
            "url": urls,
            "last_modified": pa.array(last_mods, type=pa.timestamp("us")),
            "crawler_site_id": site_ids,
        }
    )


# Replica doc_id offset: large and odd so every replica produces fresh
# urls while the % 41 host spread and the %3/%5/%6/... property rules
# still vary across replicas (bench-scale corpus amplification).
REPLICA_OFFSET = 1_000_003


def _documents(sf_dir: str, replicate: int = 1,
               num_blocks: int | None = None) -> ray.data.Dataset:
    ds = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    # A single small parquet file reads as one block, and Ray fuses the
    # downstream map chain into per-block tasks — parallelism would be
    # bounded at 1 regardless of cluster size. Split early (row-range
    # split, no shuffle) so every map stage fans out.
    if num_blocks is None:
        num_blocks = 64 if replicate > 1 else None
    if num_blocks:
        ds = ds.repartition(num_blocks)
    if replicate > 1:

        def amplify(batch: pa.Table) -> pa.Table:
            idx = batch.column_names.index("doc_id")
            base = batch["doc_id"].to_numpy()
            return pa.concat_tables(
                batch.set_column(
                    idx, "doc_id", pa.array(base + rep * REPLICA_OFFSET)
                )
                for rep in range(replicate)
            )

        # batch_size=None → one task per (small) input block: a row
        # minimum here would BUNDLE the freshly split blocks back
        # together and collapse parallelism to a handful of tasks
        ds = ds.map_batches(amplify, batch_format="pyarrow", batch_size=None)
    return ds


def read_pages(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    """The pages corpus as a streaming Dataset (never materialized)."""
    return _documents(sf_dir, replicate).map_batches(
        pages_batch, batch_format="pyarrow", batch_size=None
    )


def read_frontier(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    return _documents(sf_dir, replicate).map_batches(
        frontier_batch, batch_format="pyarrow", batch_size=None
    )


def read_index_state(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    return _documents(sf_dir, replicate).map_batches(
        index_state_batch, batch_format="pyarrow", batch_size=None
    )
