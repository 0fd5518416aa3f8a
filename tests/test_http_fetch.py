"""HttpFetchActor against a loopback http.server — mirrors the
reference's fetcher facts (tests/test_fetcher.py:29-205): fetch+
content-type strip, non-200 raises, redirect raises, 429 sleep-retry
with doubling only on consecutive 429 (0.1s then 0.2s), NotModified
short-circuit and the HEAD last-modified fallback. No Ray session
needed: the actor is a plain callable class."""

from __future__ import annotations

import threading
from collections import defaultdict
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from ftw_crawler_ray.exceptions import (
    AttemptedRedirect,
    FetchingError,
    NotModified,
)
from ftw_crawler_ray.pipelines.fetch_http import HttpFetchActor

OLD = datetime(2020, 1, 1, tzinfo=timezone.utc)
NEW = datetime(2024, 6, 1, tzinfo=timezone.utc)


class _Handler(BaseHTTPRequestHandler):
    hits = defaultdict(int)

    def log_message(self, *a):  # quiet
        pass

    def _respond(self, code, body=b"", headers=()):
        self.send_response(code)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def do_HEAD(self):
        if self.path == "/head-old":
            self._respond(200, headers=[("Last-Modified",
                                         "2021-01-01T00:00:00Z")])
        elif self.path == "/head-new":
            self._respond(200, headers=[("Last-Modified",
                                         "2025-01-01T00:00:00Z")])
        else:
            self._respond(200)

    def do_GET(self):
        self.hits[self.path] += 1
        if self.path == "/redirect":
            self._respond(301, headers=[("Location", "/ok")])
        elif self.path == "/missing":
            self._respond(404, b"nope")
        elif self.path == "/flaky":
            if self.hits[self.path] <= 2:
                self._respond(429)
            else:
                self._respond(200, b"RECOVERED",
                              [("Content-Type", "text/html")])
        else:
            self._respond(200, b"MARKER",
                          [("Content-Type", "text/html; charset=utf-8")])


@pytest.fixture(scope="module")
def server():
    _Handler.hits = defaultdict(int)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


class TestFetchOne:
    def test_fetches_and_strips_charset(self, server):
        actor = HttpFetchActor()
        body, ctype, headers = actor.fetch_one(f"{server}/ok")
        assert body == b"MARKER"
        assert ctype == "text/html"  # charset stripped
        # full headers surface (reference fetcher.py:75)
        assert headers.get("Content-Type") == "text/html; charset=utf-8"

    def test_non_200_raises_fetching_error(self, server):
        with pytest.raises(FetchingError):
            HttpFetchActor().fetch_one(f"{server}/missing")

    def test_redirect_forbidden(self, server):
        with pytest.raises(AttemptedRedirect):
            HttpFetchActor().fetch_one(f"{server}/redirect")

    def test_429_sleeps_retries_and_doubles_on_consecutive(self, server,
                                                           monkeypatch):
        # reference facts: two 429s then 200 → sleeps 0.1 then 0.2,
        # sleeptime persists at 0.2 for the host
        import ftw_crawler_ray.pipelines.fetch_http as mod

        sleeps = []
        monkeypatch.setattr(mod.time, "sleep", sleeps.append)
        actor = HttpFetchActor()
        body, _, _ = actor.fetch_one(f"{server}/flaky")
        assert body == b"RECOVERED"
        assert sleeps == [pytest.approx(0.1), pytest.approx(0.2)]
        assert actor.sleeptimes["127.0.0.1"] == pytest.approx(0.2)

    def test_not_modified_short_circuit_via_lastmod(self, server):
        actor = HttpFetchActor()
        with pytest.raises(NotModified):
            actor.fetch_one(f"{server}/ok", lastmod="2020-06-01", last_indexed=NEW)
        # force=True ignores incrementality (reference options.force)
        body, _, _ = HttpFetchActor(force=True).fetch_one(
            f"{server}/ok", lastmod="2020-06-01", last_indexed=NEW
        )
        assert body == b"MARKER"

    def test_head_fallback_old_header_not_modified(self, server):
        actor = HttpFetchActor()
        with pytest.raises(NotModified):
            actor.fetch_one(f"{server}/head-old", last_indexed=NEW)

    def test_head_fallback_new_header_fetches(self, server):
        body, _, _ = HttpFetchActor().fetch_one(f"{server}/head-new",
                                             last_indexed=NEW)
        assert body == b"MARKER"

    def test_head_fallback_no_header_fetches(self, server):
        body, _, _ = HttpFetchActor().fetch_one(f"{server}/ok", last_indexed=OLD)
        assert body == b"MARKER"

    def test_never_indexed_always_modified(self, server):
        assert HttpFetchActor().is_modified(f"{server}/ok", None, None)


class TestBatchContract:
    def test_batch_rows_quarantine_by_status(self, server):
        actor = HttpFetchActor()
        batch = pa.table(
            {
                "url": pa.array(
                    [f"{server}/ok", f"{server}/redirect", f"{server}/missing"],
                    pa.string(),
                ),
                "lastmod": pa.array([None] * 3, pa.string()),
                "shard": pa.array([0, 0, 0], pa.int32()),
                "seq": pa.array([1, 2, 3], pa.int64()),
                "fetch_order": pa.array([0, 1, 2], pa.int64()),
            }
        )
        out = actor(batch)
        assert out["fetch_status"].to_pylist() == [
            "fetched", "redirect", "fetch_error"
        ]
        assert out["html"].to_pylist()[0] == b"MARKER"
        assert out["html"].to_pylist()[1] is None
        assert out["content_type"].to_pylist()[0] == "text/html"
        assert out["site_id"].to_pylist() == ["127.0.0.1"] * 3
        # headers column: map<string,string> populated for fetched rows
        hdrs = out["headers"].to_pylist()
        assert dict(hdrs[0])["Content-Type"] == "text/html; charset=utf-8"
        assert hdrs[1] is None and hdrs[2] is None

    def test_dead_host_quarantined_not_task_fatal(self):
        """A ConnectionError (no listener) must become one
        fetch_error row, not a raised exception killing the Ray
        task — dead hosts are routine in live crawls."""
        actor = HttpFetchActor(timeout=0.5)
        batch = pa.table({
            "url": pa.array(["http://127.0.0.1:9/unroutable"], pa.string()),
            "lastmod": pa.array([None], pa.string()),
        })
        out = actor(batch)
        assert out["fetch_status"].to_pylist() == ["fetch_error"]

    def test_malformed_lastmod_quarantined(self, server):
        """A garbage sitemap lastmod raising in from_iso_datetime is
        quarantined per row, not task-fatal."""
        actor = HttpFetchActor()
        batch = pa.table({
            "url": pa.array([f"{server}/ok"] * 2, pa.string()),
            "lastmod": pa.array(["not-a-date", None], pa.string()),
            "last_indexed": pa.array([OLD, None],
                                     pa.timestamp("us", tz="UTC")),
        })
        out = actor(batch)
        assert out["fetch_status"].to_pylist() == ["fetch_error", "fetched"]


class TestPlannedPacing:
    def test_fetches_wait_for_planned_offsets(self, server, monkeypatch):
        """pace_from + planned_offset: each fetch starts no earlier
        than crawl_start + offset, rows processed in offset order —
        the scheduler's virtual politeness clock honored in real
        time (virtual clock here: sleep/time are monkeypatched)."""
        import ftw_crawler_ray.pipelines.fetch_http as mod

        now = {"t": 1000.0}
        sleeps = []

        def fake_time():
            return now["t"]

        def fake_sleep(dt):
            sleeps.append(round(dt, 3))
            now["t"] += dt

        monkeypatch.setattr(mod.time, "time", fake_time)
        monkeypatch.setattr(mod.time, "sleep", fake_sleep)
        actor = HttpFetchActor(pace_from=1000.0)
        batch = pa.table(
            {
                "url": pa.array([f"{server}/ok"] * 3, pa.string()),
                "lastmod": pa.array([None] * 3, pa.string()),
                "shard": pa.array([0] * 3, pa.int32()),
                "seq": pa.array([1, 2, 3], pa.int64()),
                "fetch_order": pa.array([2, 0, 1], pa.int64()),
                "planned_offset": pa.array([0.4, 0.0, 0.2], pa.float64()),
            }
        )
        out = actor(batch)
        assert out["fetch_status"].to_pylist() == ["fetched"] * 3
        # processed in offset order 0.0, 0.2, 0.4 → slept up to each
        assert sleeps == [pytest.approx(0.2), pytest.approx(0.2)]
        assert out["fetch_order"].to_pylist() == [0, 1, 2]
