"""Content converters — the reference's Tika seam (S7/S8), rebuilt
for Arrow-bodied resources.

The reference converts every fetched resource through a Tika JAXRS
server (tika.py:23-59): PUT the body to ``{url}/meta`` (CSV of
metadata key/values) and ``{url}/tika`` with ``Accept: text/plain``
(plain text, UTF-8 without declaring it — TIKA-912). ``TikaConverter``
here speaks the same protocol from the resource's in-memory ``body``
bytes (bodies are Arrow binary cells in this engine, not temp files —
SURVEY.md §2.7), so a user with a Tika server gets the reference's
exact extraction path for PDFs and office documents.

``DispatchConverter`` routes by content type: markup → the in-process
``HtmlConverter``, text/plain → decoded body, everything else → the
configured binary converter (a ``TikaConverter`` in production). With
no binary converter configured a non-markup resource raises
``ConversionError`` loudly — never a silent empty document.

The sandbox has no Tika server; tests exercise ``TikaConverter``
against a loopback HTTP server that mirrors the reference's own test
facts (tests/test_tika.py: CSV metadata incl. multi-value join,
undeclared-UTF-8 text).
"""

from __future__ import annotations

import csv
import io

from .engine import HtmlConverter, PassthroughConverter
from .exceptions import CrawlerError
from .functions.metadata import canonicalize_metadata
from .functions.textutils import safe_unicode

MARKUP_TYPES = frozenset(
    ["text/html", "application/xhtml+xml", "text/xml", "application/xml"]
)


class ConversionError(CrawlerError):
    """No converter can handle this content type."""


class TikaConverter:
    """Tika JAXRS client converter (reference tika.py:11-59), fed from
    in-memory bodies. One ``requests.Session`` per instance — build it
    inside an actor's ``__init__`` so connections pool per actor."""

    def __init__(self, tika_url: str, timeout: float = 30.0):
        import requests

        self.tika_url = tika_url.rstrip("/")
        self.timeout = timeout
        self.session = requests.Session()

    def _tika_request(self, endpoint: str, resource_info, headers: dict):
        body = resource_info.body
        if isinstance(body, str):
            body = body.encode("utf-8")
        return self.session.put(
            f"{self.tika_url}/{endpoint}", data=body or b"",
            headers=headers, timeout=self.timeout,
        )

    def extract_metadata(self, resource_info) -> dict:
        headers = {"Content-type": resource_info.content_type}
        response = self._tika_request("meta", resource_info, headers)
        # Tika /meta answers CSV; rare multi-value rows join with a
        # space (reference tika.py:36-41); values are UTF-8
        reader = csv.reader(
            io.StringIO(response.content.decode("utf-8")),
            delimiter=",", quotechar='"',
        )
        metadata = {}
        for item in reader:
            if not item:
                continue
            metadata[item[0]] = " ".join(item[1:])
        return canonicalize_metadata(metadata)

    def extract_text(self, resource_info) -> str:
        headers = {
            "Content-type": resource_info.content_type,
            "Accept": "text/plain",
        }
        response = self._tika_request("tika", resource_info, headers)
        # Tika sends UTF-8 without declaring it (TIKA-912,
        # reference tika.py:54-59) — decode explicitly
        return response.content.decode("utf-8")


class PlainTextConverter(PassthroughConverter):
    """text/* bodies: the body IS the text."""

    def extract_text(self, resource_info):
        if resource_info.text:
            return resource_info.text
        body = resource_info.body
        if body is None:
            return ""
        if isinstance(body, bytes):
            return safe_unicode(body)
        return body


class DispatchConverter:
    """Route a resource to the converter owning its content type —
    the reference's implicit 'Tika handles everything' becomes an
    explicit, pluggable table here (markup stays in-process; binary
    formats need a configured Tika endpoint)."""

    def __init__(self, markup=None, plain=None, binary=None):
        self.markup = markup or HtmlConverter()
        self.plain = plain or PlainTextConverter()
        self.binary = binary  # e.g. TikaConverter("http://tika:9998")

    def _route(self, resource_info):
        ctype = (resource_info.content_type or "").split(";")[0].strip()
        if ctype in MARKUP_TYPES:
            return self.markup
        if ctype.startswith("text/"):
            return self.plain
        if self.binary is not None:
            return self.binary
        raise ConversionError(
            f"no converter for content type {ctype!r}: configure "
            "DispatchConverter(binary=TikaConverter(...)) for non-markup "
            "formats"
        )

    def extract_metadata(self, resource_info):
        return self._route(resource_info).extract_metadata(resource_info)

    def extract_text(self, resource_info):
        return self._route(resource_info).extract_text(resource_info)
