"""WARC source: stdlib record walker, HTTP payload parse, gzip
multi-member handling, and the read → extract pipeline end-to-end."""

from __future__ import annotations

import pytest

from ftw_crawler_ray.sources.warc import (
    iter_warc_records,
    parse_http_response,
    synthesize_warc,
    warc_records_to_rows,
)

PAGE = (
    b'<html><head><title>Warc Page</title></head>'
    b'<body><div id="content"><h1>Warc Page</h1>'
    b"<p>archived body text</p></div></body></html>"
)

RECORDS = [
    ("http://a.example.com/ok", 200, "text/html; charset=utf-8", PAGE),
    ("http://a.example.com/gone", 404, "text/html", b"nope"),
    ("http://b.example.com/two", 200, "text/html", b"<html><body>two</body></html>"),
]


class TestWarcParsing:
    @pytest.mark.parametrize("gz", [False, True])
    def test_record_walk_and_http_parse(self, gz):
        data = synthesize_warc(RECORDS, gzip_members=gz)
        recs = list(iter_warc_records(data))
        assert len(recs) == 3
        headers, payload = recs[0]
        assert headers["warc-type"] == "response"
        assert headers["warc-target-uri"] == "http://a.example.com/ok"
        status, http_headers, body = parse_http_response(payload)
        assert status == 200
        assert http_headers["content-type"].startswith("text/html")
        assert body == PAGE

    def test_rows_schema_and_quarantine(self):
        t = warc_records_to_rows(synthesize_warc(RECORDS))
        assert t.num_rows == 3
        assert t["fetch_status"].to_pylist() == [
            "fetched", "fetch_error", "fetched"
        ]
        assert t["content_type"].to_pylist()[0] == "text/html"  # charset cut
        assert t["site_id"].to_pylist() == [
            "a.example.com", "a.example.com", "b.example.com"
        ]
        assert t["html"].to_pylist()[1] is None  # non-200 carries no body

    def test_non_response_records_skipped(self):
        data = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"info\r\n\r\n"
        ) + synthesize_warc(RECORDS[:1])
        t = warc_records_to_rows(data)
        assert t.num_rows == 1


class TestWarcPipeline:
    def test_warc_to_docs_end_to_end(self, ray_session, tmp_path):
        import pyarrow.compute as pc

        from ftw_crawler_ray.sources.warc import warc_to_docs

        (tmp_path / "part1.warc").write_bytes(synthesize_warc(RECORDS[:2]))
        (tmp_path / "part2.warc.gz").write_bytes(
            synthesize_warc(RECORDS[2:], gzip_members=True)
        )
        rows = warc_to_docs(
            [str(tmp_path / "part1.warc"), str(tmp_path / "part2.warc.gz")]
        ).take_all()
        assert len(rows) == 3
        ok = {r["url"]: r for r in rows if r["fetch_status"] == "fetched"}
        assert set(ok) == {"http://a.example.com/ok",
                           "http://b.example.com/two"}
        a = ok["http://a.example.com/ok"]
        assert a["Title"] == "Warc Page"
        assert "archived body text" in a["SearchableText"]
        assert a["UID"]
