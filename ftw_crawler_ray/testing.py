"""Test helpers for config / extractor-plugin authors — the
reference's ``testing.py`` role (reference testing.py:20-100,
tests/helpers.py) rebuilt for the batch engine.

A plugin author typically wants to (1) run their config over one
synthetic resource and inspect the output row, (2) stub the
converter, (3) feed the sitemap machinery from an in-memory corpus,
and (4) — if they implemented ``extract_batch`` — prove it agrees
with their ``extract_value``. Each of those is one helper here.
"""

from __future__ import annotations

import pyarrow as pa

from .engine import ExtractionEngine
from .resource import ResourceInfo


class MockConverter:
    """Converter stub (reference tests/helpers.py MockConverter):
    fixed metadata + text regardless of the body."""

    def __init__(self, metadata=None, text=""):
        self.metadata = metadata or {}
        self.text = text

    def extract_metadata(self, resource_info):
        return dict(self.metadata)

    def extract_text(self, resource_info):
        return self.text


def corpus_fetch(corpus: dict):
    """``fetch(url) -> (status, content_type, body)`` over an
    in-memory dict of ``url -> (content_type, body)`` — for
    exercising sitemap discovery / crawl_live without a server."""

    def fetch(url):
        if url in corpus:
            ctype, body = corpus[url]
            return (200, ctype, body)
        return (404, "text/html", b"not found")

    return fetch


def resource_for(url: str, *, html=None, text=None,
                 content_type: str = "text/html", headers=None,
                 metadata=None, site=None) -> ResourceInfo:
    """One synthetic ResourceInfo, ready for ``extract_value``."""
    body = html.encode("utf-8") if isinstance(html, str) else html
    return ResourceInfo(
        url_info={"loc": url}, content_type=content_type, site=site,
        headers=headers or {}, metadata=metadata, text=text, body=body,
    )


def extract_one(config, *, url: str, html=None, text=None,
                content_type: str = "text/html", site_id=None,
                doc_id: int = 0, converter=None, crawl_ts=None) -> dict:
    """Run the FULL engine over one synthetic page row and return the
    extracted field dict — the plugin author's quickest feedback
    loop: ``extract_one(my_config, url=..., html=...)``."""
    engine = ExtractionEngine(
        config, converter=converter, crawl_ts=crawl_ts,
        keep_input_columns=("url",),
    )
    body = html.encode("utf-8") if isinstance(html, str) else html
    batch = pa.table(
        {
            "url": pa.array([url], pa.string()),
            "html": pa.array([body], pa.binary()),
            "text": pa.array([text], pa.string()),
            "content_type": pa.array([content_type], pa.string()),
            "site_id": pa.array([site_id], pa.string()),
            "doc_id": pa.array([doc_id], pa.int64()),
        }
    )
    out = engine(batch)
    return {c: out[c][0].as_py() for c in out.column_names}


def assert_engine_paths_agree(config, batch: pa.Table, crawl_ts=None):
    """Assert the vectorized batch path and the per-row path produce
    IDENTICAL output for ``batch`` — the repo's engine-equivalence
    invariant, exposed so a plugin adding ``extract_batch`` can hold
    itself to the same bar. Raises AssertionError with the first
    differing (row, column). ``crawl_ts`` is pinned when omitted —
    otherwise now()-dependent fields trivially differ between the
    two passes."""
    if crawl_ts is None:
        from datetime import datetime

        crawl_ts = datetime(2024, 1, 1)
    fast = ExtractionEngine(config, crawl_ts=crawl_ts,
                            keep_input_columns=("url",))
    if not fast._vectorized:
        raise AssertionError(
            "config has extractors without extract_batch (or a custom "
            "converter) — the vectorized path would not engage"
        )
    slow = ExtractionEngine(config, crawl_ts=crawl_ts,
                            keep_input_columns=("url",))
    slow._vectorized = False
    a, b = fast(batch), slow(batch)
    assert a.column_names == b.column_names
    for col in a.column_names:
        av, bv = a[col].to_pylist(), b[col].to_pylist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x != y:
                raise AssertionError(
                    f"engine paths disagree at row {i} column {col!r}: "
                    f"batch={x!r} row={y!r}"
                )
