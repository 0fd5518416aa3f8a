"""Converter seam (S7/S8): TikaConverter against a loopback fake
Tika JAXRS server — mirrors reference tests/test_tika.py facts (CSV
metadata with multi-value join, /tika UTF-8-without-charset text) —
plus DispatchConverter routing and the loud no-converter error."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ftw_crawler_ray.converters import (
    ConversionError,
    DispatchConverter,
    PlainTextConverter,
    TikaConverter,
)
from ftw_crawler_ray.resource import ResourceInfo

# CSV exactly as Tika's /meta emits it, incl. a multi-value row
META_CSV = (
    '"Content-Type","application/pdf"\r\n'
    '"title","Bärengraben"\r\n'
    '"multi","a","b"\r\n'
).encode("utf-8")
TIKA_TEXT = "Der Bärengraben ist sehenswert.".encode("utf-8")


class _FakeTika(BaseHTTPRequestHandler):
    last = {}

    def log_message(self, *a):
        pass

    def do_PUT(self):
        n = int(self.headers.get("Content-Length", 0))
        _FakeTika.last = {
            "path": self.path,
            "content_type": self.headers.get("Content-type"),
            "accept": self.headers.get("Accept"),
            "body": self.rfile.read(n),
        }
        payload = META_CSV if self.path == "/meta" else TIKA_TEXT
        self.send_response(200)
        # NOTE: no charset declared — the TIKA-912 quirk under test
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def tika_url():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _FakeTika)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _pdf_resource():
    return ResourceInfo(
        url_info={"loc": "http://example.org/doc.pdf"},
        content_type="application/pdf",
        body=b"%PDF-1.4 fake",
    )


class TestTikaConverter:
    def test_metadata_csv_parse_and_multivalue_join(self, tika_url):
        meta = TikaConverter(tika_url).extract_metadata(_pdf_resource())
        assert meta["title"] == "Bärengraben"
        assert meta["Content-Type"] == "application/pdf"
        assert meta["multi"] == "a b"  # reference tika.py:36-41 join
        assert _FakeTika.last["path"] == "/meta"
        assert _FakeTika.last["content_type"] == "application/pdf"
        assert _FakeTika.last["body"] == b"%PDF-1.4 fake"

    def test_text_decodes_undeclared_utf8(self, tika_url):
        text = TikaConverter(tika_url).extract_text(_pdf_resource())
        assert text == "Der Bärengraben ist sehenswert."
        assert _FakeTika.last["path"] == "/tika"
        assert _FakeTika.last["accept"] == "text/plain"


class TestDispatch:
    def test_markup_routes_in_process(self):
        ri = ResourceInfo(
            content_type="text/html",
            body=b"<html><head><title>T</title></head><body>Hi</body></html>",
        )
        d = DispatchConverter()
        assert d.extract_text(ri) == "Hi"
        assert d.extract_metadata(ri)["title"] == "T"

    def test_plain_text_routes_to_body_decode(self):
        ri = ResourceInfo(content_type="text/plain; charset=utf-8",
                          body="café".encode("utf-8"))
        assert DispatchConverter().extract_text(ri) == "café"

    def test_binary_without_tika_raises_loudly(self):
        with pytest.raises(ConversionError, match="application/pdf"):
            DispatchConverter().extract_text(_pdf_resource())

    def test_binary_routes_to_tika(self, tika_url):
        d = DispatchConverter(binary=TikaConverter(tika_url))
        assert d.extract_text(_pdf_resource()).startswith("Der Bärengraben")


class TestEngineWithTika:
    def test_pdf_flows_through_engine(self, tika_url):
        """A PDF row extracted through the full engine with the
        dispatch converter: SearchableText comes from the fake Tika,
        Title from its metadata (title cascade)."""
        import pyarrow as pa

        from ftw_crawler_ray.engine import ExtractionEngine
        from ftw_crawler_ray.pipelines.extract import CRAWL_TS, corpus_config

        engine = ExtractionEngine(
            corpus_config(),
            converter=DispatchConverter(binary=TikaConverter(tika_url)),
            crawl_ts=CRAWL_TS,
            keep_input_columns=("url",),
        )
        batch = pa.table(
            {
                "url": pa.array(["http://h0.example.org/docs/doc-0.pdf"]),
                "html": pa.array([b"%PDF-1.4 fake"], pa.binary()),
                "text": pa.array([None], pa.string()),
                "content_type": pa.array(["application/pdf"]),
                "site_id": pa.array(["h0.example.org"]),
                "doc_id": pa.array([0], pa.int64()),
            }
        )
        out = engine(batch)
        row = {c: out[c][0].as_py() for c in out.column_names}
        assert "Bärengraben" in row["SearchableText"]
        assert row["Title"] == "Bärengraben"
