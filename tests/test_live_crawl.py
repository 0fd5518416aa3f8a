"""crawl_live end-to-end against a loopback HTTP site: sitemap
discovery → robots gate → shard scheduling → HttpFetchActor →
HtmlConverter extraction → docs/index_state Parquet, plus
checkpointed resume (second run all-dup) and incrementality via
index_state_dir."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow.dataset as pads
import pytest

from ftw_crawler_ray.config import Site
from ftw_crawler_ray.pipelines.live import crawl_live, live_robots
from ftw_crawler_ray.pipelines.fetch_http import RequestsFetch

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _page(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head>"
        f'<body><div id="content"><h1>{title}</h1>'
        f"<p>{body}</p></div></body></html>"
    ).encode()


class _SiteHandler(BaseHTTPRequestHandler):
    base = ""

    def log_message(self, *a):
        pass

    def _ok(self, body, ctype="text/html; charset=utf-8", extra=()):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        for k, v in extra:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_HEAD(self):
        self.send_response(200)
        self.end_headers()

    def do_GET(self):
        b = _SiteHandler.base
        if self.path == "/robots.txt":
            self._ok(b"User-agent: *\nDisallow: /private/", "text/plain")
        elif self.path == "/sitemap.xml":
            urls = "".join(
                f"<url><loc>{b}{p}</loc><lastmod>2024-01-0{i+1}</lastmod>"
                f"</url>"
                for i, p in enumerate(
                    ["/a", "/b", "/c", "/hdr", "/file",
                     "/private/secret", "/missing", "/redir"]
                )
            )
            self._ok(f'<urlset {NS}>{urls}</urlset>'.encode(), "text/xml")
        elif self.path == "/a":
            self._ok(_page("Alpha", "first page text"))
        elif self.path == "/b":
            self._ok(_page("Beta", "second page text"))
        elif self.path == "/c":
            self._ok(_page("Gamma", "third page text"))
        elif self.path == "/hdr":
            # X-Document-Title beats the h1 cascade (reference
            # extractors.py:199-202); weird casing on the wire
            import base64

            self._ok(
                _page("Ignored", "header-titled page"),
                extra=[("x-DoCuMeNt-TiTlE",
                        base64.b64encode("Header Titel".encode()).decode())],
            )
        elif self.path == "/file":
            # no <title>/h1/meta → Title falls through to the
            # Content-Disposition filename (reference :347-360)
            self._ok(
                b"<html><body><p>just an attachment body</p></body></html>",
                extra=[("Content-Disposition",
                        'attachment; filename="Bericht.pdf"')],
            )
        elif self.path == "/private/secret":
            self._ok(_page("Secret", "robots should block this"))
        elif self.path == "/redir":
            self.send_response(301)
            self.send_header("Location", f"{b}/a")
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            body = b"nope"
            self.send_response(404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)


@pytest.fixture(scope="module")
def site_server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    _SiteHandler.base = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield _SiteHandler.base
    httpd.shutdown()


class TestLiveCrawl:
    def test_end_to_end(self, ray_session, site_server, tmp_path):
        sites = [Site(site_server + "/")]
        out = tmp_path / "live"
        s = crawl_live(
            sites, str(out), num_shards=2,
            checkpoint_dir=str(out / "ckpt"),
        )
        # robots blocked /private/secret; dedup saw nothing twice
        assert s["plan_counts"]["scheduled"] == 7
        assert s["plan_counts"]["robots_blocked"] == 1
        # /missing 404 → fetch_error, /redir 301 → redirect
        assert s["fetch_counts"]["fetched"] == 5
        assert s["fetch_counts"]["fetch_error"] == 1
        assert s["fetch_counts"]["redirect"] == 1

        docs = pads.dataset(str(out / "docs"), partitioning="hive").to_table(
            columns=["url", "Title", "SearchableText", "UID", "fetch_status"]
        ).to_pylist()
        ok = {r["url"]: r for r in docs if r["fetch_status"] == "fetched"}
        assert set(ok) == {
            site_server + p for p in ("/a", "/b", "/c", "/hdr", "/file")
        }
        a = ok[site_server + "/a"]
        assert a["Title"] == "Alpha"          # h1 via HtmlConverter
        assert "first page text" in a["SearchableText"]
        assert a["UID"]
        # response headers flow through the fetch pool into the
        # engine: X-Document-Title (base64, weird casing) beats the
        # h1; Content-Disposition filename catches a title-less doc
        assert ok[site_server + "/hdr"]["Title"] == "Header Titel"
        assert ok[site_server + "/file"]["Title"] == "Bericht.pdf"

        # resume with same checkpoints: everything is a dup
        s2 = crawl_live(
            sites, str(tmp_path / "live2"), num_shards=2,
            checkpoint_dir=str(out / "ckpt"),
        )
        assert s2["plan_counts"] == {"dup": 8}

    def test_incrementality_via_index_state(self, ray_session, site_server,
                                            tmp_path):
        """Second run fed the first run's index_state: every page's
        sitemap lastmod (2024) is older than last crawl → nothing is
        modified → nothing scheduled."""
        sites = [Site(site_server + "/")]
        first = tmp_path / "first"
        s1 = crawl_live(sites, str(first), num_shards=2)
        assert s1["fetch_counts"]["fetched"] == 5

        s2 = crawl_live(
            sites, str(tmp_path / "second"), num_shards=2,
            index_state_dir=str(first / "index_state"),
        )
        # a/b/c: indexed with last_modified == sitemap lastmod → NOT
        # modified → filtered; /missing + /redir never made the index
        # → still candidates; /private robots-blocked
        assert s2["plan_counts"].get("scheduled", 0) == 2
        assert s2["plan_counts"].get("robots_blocked", 0) == 1
        assert s2["fetch_counts"].get("fetched", 0) == 0

    def test_paced_crawl_matches_unpaced(self, ray_session, site_server,
                                         tmp_path):
        """pace=True engages planned-offset pacing AND the plan-read
        fan-out (min_blocks per ~512 urls) — results must equal the
        unpaced run, and the crawl CANNOT finish before the last
        planned offset elapses (the politeness guarantee: each fetch
        waits until crawl_start + its scheduler offset, so wall time
        ≥ max planned_offset regardless of how the plan was split)."""
        import time as _time

        # politeness spacing comes from the SITE config (reference
        # configuration.py:67), not the fetch actor's 429 base
        sites = [Site(site_server + "/", sleeptime=1.0)]
        out = tmp_path / "paced"
        t0 = _time.time()
        s = crawl_live(sites, str(out), num_shards=2, pace=True)
        took = _time.time() - t0
        assert s["plan_counts"]["scheduled"] == 7
        assert s["fetch_counts"]["fetched"] == 5
        docs = pads.dataset(str(out / "docs"), partitioning="hive").to_table(
            columns=["url", "fetch_status"]
        ).to_pylist()
        fetched = {r["url"] for r in docs if r["fetch_status"] == "fetched"}
        assert fetched == {
            site_server + p for p in ("/a", "/b", "/c", "/hdr", "/file")
        }
        # the scheduler's own plan gives the exact politeness budget
        plan = pads.dataset(str(out / "plan")).to_table(
            columns=["status", "planned_offset"]
        ).to_pylist()
        max_offset = max(
            (r["planned_offset"] or 0.0) for r in plan
            if r["status"] == "scheduled"
        )
        # 7 urls on one host at 1.0 s spacing → a bound large enough
        # that a silently-disabled sleep (crawl overhead alone) fails
        assert max_offset >= 1.0 * 5
        assert took >= max_offset

    def test_skewed_hosts_hot_ceiling_vs_small_full_speed(self, ray_session,
                                                          tmp_path):
        """Skew stress (SURVEY §4.1 per-host-ceiling claim): ONE hot
        host (8 urls, sleeptime=1.0 → politeness ceiling ≈ 7 s) plus
        four small hosts (3 urls each, sleeptime=0.05). Under
        pace=True the hot host's ceiling must be HONORED (its last
        fetch lands ≥ its planned offset after its first) while the
        small hosts complete at full speed near the pace epoch —
        never serialized behind the hot host's sleeps."""
        import time as _time

        servers, sites, req_times = [], [], {}
        # distinct POLITENESS hosts need distinct loopback IPs —
        # host_of strips ports (the politeness unit is the host)
        next_ip = iter(f"127.0.1.{i}" for i in range(1, 20))

        def _start_host(paths, sleeptime):
            times: list[tuple[str, float]] = []

            class H(BaseHTTPRequestHandler):
                base = ""

                def log_message(self, *a):
                    pass

                def _ok(self, body, ctype="text/html; charset=utf-8"):
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

                def do_HEAD(self):
                    self.send_response(200)
                    self.end_headers()

                def do_GET(self):
                    if self.path == "/robots.txt":
                        self._ok(b"User-agent: *\n", "text/plain")
                    elif self.path == "/sitemap.xml":
                        urls = "".join(
                            f"<url><loc>{H.base}{p}</loc></url>"
                            for p in paths
                        )
                        self._ok(f"<urlset {NS}>{urls}</urlset>".encode(),
                                 "text/xml")
                    elif self.path in paths:
                        times.append((self.path, _time.monotonic()))
                        self._ok(_page("T" + self.path, "body " + self.path))
                    else:
                        self.send_response(404)
                        self.send_header("Content-Length", "0")
                        self.end_headers()

            ip = next(next_ip)
            httpd = ThreadingHTTPServer((ip, 0), H)
            H.base = f"http://{ip}:{httpd.server_address[1]}"
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            servers.append(httpd)
            sites.append(Site(H.base + "/", sleeptime=sleeptime))
            req_times[H.base] = times
            return H.base

        try:
            hot = _start_host([f"/h{i}" for i in range(8)], sleeptime=1.0)
            smalls = [
                _start_host([f"/s{i}" for i in range(3)], sleeptime=0.05)
                for _ in range(4)
            ]
            s = crawl_live(sites, str(tmp_path / "skew"), num_shards=4,
                           pace=True)
            assert s["fetch_counts"]["fetched"] == 8 + 4 * 3

            hot_t = [t for _, t in req_times[hot]]
            small_t = [t for b in smalls for _, t in req_times[b]]
            assert len(hot_t) == 8 and len(small_t) == 12
            hot_first, hot_last = min(hot_t), max(hot_t)
            # ceiling honored: 8 urls at 1.0 s spacing plan offsets
            # 0..7; absolute pacing means the last fetch cannot land
            # sooner than ~7 s after the first (margin for clock skew)
            assert hot_last - hot_first >= 5.5, (hot_first, hot_last)
            # small hosts at full speed: their offsets are ≤ 0.15, so
            # every small fetch lands near the pace epoch (≈ the hot
            # host's FIRST fetch at offset 0) — far before the hot
            # ceiling, proving no serialization behind the hot queue
            assert max(small_t) <= hot_first + 2.5, (
                max(small_t) - hot_first
            )
        finally:
            for httpd in servers:
                httpd.shutdown()

    def test_console_script_single_url(self, site_server, tmp_path):
        """The ``crawl config.py [url]`` console script (reference
        setup.py:55-58 parity): runs in its own process (own Ray
        session) via the bin/crawl shim, single-URL mode."""
        import json
        import subprocess
        import sys

        cfg = tmp_path / "site_config.py"
        cfg.write_text(
            "from ftw_crawler_ray.config import Site\n"
            "from ftw_crawler_ray.pipelines.extract import corpus_config\n"
            "CONFIG = corpus_config()\n"
            f"CONFIG.sites = [Site({site_server + '/'!r})]\n"
        )
        out = tmp_path / "out"
        proc = subprocess.run(
            [sys.executable, "/root/repo/bin/crawl", str(cfg),
             f"{site_server}/b", "--out", str(out), "--num-cpus", "4"],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["fetch_counts"] == {"fetched": 1}
        import pyarrow.dataset as pads

        docs = pads.dataset(str(out / "docs"), partitioning="hive").to_table(
            columns=["url", "Title"]
        ).to_pylist()
        assert docs == [{"url": f"{site_server}/b", "Title": "Beta"}]

    def test_live_robots_helper(self, site_server):
        from ftw_crawler_ray.functions.urlnorm import host_of

        robots = live_robots([Site(site_server + "/")], RequestsFetch())
        assert "Disallow: /private/" in robots[host_of(site_server + "/")]
