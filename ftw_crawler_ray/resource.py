"""ResourceInfo — the per-row view handed to extractors.

Reference resource.py:1-13 is a mutable 8-slot bag whose ``filename``
points at a temp-spooled body; here the body is the ``html`` binary
value of the Arrow row (no filesystem), everything else keeps its
name so third-party extractors port unchanged.
"""

from __future__ import annotations

from .functions.textutils import CaseInsensitiveDict


class ResourceInfo:
    __slots__ = (
        "url_info",
        "content_type",
        "site",
        "last_indexed",
        "headers",
        "metadata",
        "text",
        "body",
        "crawl_ts",
        "filename",
        "cache",
    )

    def __init__(self, url_info=None, content_type=None, site=None,
                 last_indexed=None, headers=None, metadata=None, text=None,
                 body=None, crawl_ts=None, filename=None):
        self.url_info = url_info if url_info is not None else {}
        self.content_type = content_type
        self.site = site
        self.last_indexed = last_indexed
        if headers is not None and not isinstance(headers, CaseInsensitiveDict):
            headers = CaseInsensitiveDict(headers)
        self.headers = headers if headers is not None else CaseInsensitiveDict()
        self.metadata = metadata
        self.text = text
        self.body = body  # bytes — replaces the reference's temp file
        self.crawl_ts = crawl_ts  # pipeline-level indexing timestamp
        self.filename = filename  # parity slot; unused (no spool dir)
        self.cache = {}  # per-row memo (parsed markup tree, xpath hits)
