"""S5 production fetch: a ``requests``-backed actor pool behind the
SAME row contract as the sandbox ``FetchActor`` (pipelines/crawl.py).

Reference semantics rebuilt per row (fetcher.py:26-83):

- ``is_modified`` (fetcher.py:28-43): never indexed → modified; a
  ``lastmod`` sitemap hint compares against ``last_indexed``; with no
  hint, a HEAD request's ``last-modified`` header decides (the
  reference parses that header with ``from_iso_datetime`` — its own
  test servers send ISO dates — so we try ISO first and fall back to
  the RFC1123 HTTP grammar); header absent → modified.
- ``NotModified`` short-circuit unless ``force`` (fetcher.py:49-51).
- GET with redirects FORBIDDEN: any 3xx raises ``AttemptedRedirect``
  → quarantined as ``fetch_status='redirect'`` (fetcher.py:53-58 —
  the canonical URL would be ambiguous).
- 429 loop (fetcher.py:60-66): sleep the host's current sleeptime,
  retry, and double the sleeptime only when the retry itself returns
  429 again; the doubled value PERSISTS for the host (never reset).
- any other non-200 → ``FetchingError`` → ``fetch_status='fetch_error'``
  (fetcher.py:67-70).

Pool shape: one ``requests.Session`` per actor, built in ``__init__``
(connection pooling across batches); per-host sleeptimes live in actor
state. Planned inter-fetch politeness is the SCHEDULER's job (virtual
clock offsets in the plan); the in-actor 429 loop is the reactive
fallback exactly like the reference's.

This module never runs in the hermetic driver queries — it is
exercised against a loopback ``http.server`` in
tests/test_http_fetch.py, which mirrors the reference's fetcher test
facts (tests/test_fetcher.py:29-205).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..exceptions import AttemptedRedirect, FetchingError, NotModified
from ..functions.dates import from_http_datetime, from_iso_datetime, to_utc
from ..functions.textutils import get_content_type
from ..functions.urlnorm import host_of

FETCH_OUTPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lastmod", pa.string()),
        ("shard", pa.int32()),
        ("seq", pa.int64()),
        ("fetch_order", pa.int64()),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("content_type", pa.string()),
        # full response headers (reference fetcher.py:75 hands
        # response.headers to the extractors: X-Document-Title,
        # Content-Disposition, Last-Modified all flow from here)
        ("headers", pa.map_(pa.string(), pa.string())),
        ("site_id", pa.string()),
        ("doc_id", pa.int64()),
        ("fetch_status", pa.string()),
    ]
)


def _parse_header_datetime(value: str):
    """The reference feeds the ``last-modified`` header to
    ``from_iso_datetime`` (fetcher.py:38-41); real servers send
    RFC1123. Accept both."""
    try:
        return to_utc(from_iso_datetime(value))
    except (ValueError, OverflowError):
        return to_utc(from_http_datetime(value))


class HttpFetchActor:
    """Actor-pool stage: plan rows in, resource rows out, one HTTP
    session per actor. Constructor args are picklable primitives so
    the class works as a ``map_batches`` callable
    (``map_batches(HttpFetchActor, fn_constructor_kwargs=...,
    concurrency=(2, 16), batch_size=...)``)."""

    def __init__(self, base_sleeptime: float = 0.1, timeout: float = 10.0,
                 force: bool = False, max_429_retries: int = 16,
                 user_agent: str = "ftw-crawler-ray/1.0",
                 pace_from: float | None = None):
        import requests

        self.session = requests.Session()
        self.session.headers["User-Agent"] = user_agent
        self.base_sleeptime = base_sleeptime
        self.timeout = timeout
        self.force = force
        self.max_429_retries = max_429_retries
        self.sleeptimes: dict[str, float] = {}  # host → current (persists)
        # planned-offset pacing: with an absolute crawl-start epoch,
        # each row's fetch starts no earlier than pace_from +
        # planned_offset. The offsets are the scheduler's per-host
        # virtual clock, so pacing is globally correct ACROSS actors
        # without any coordination — every actor shares the same wall
        # clock and each host's rows carry disjoint offsets.
        self.pace_from = pace_from

    # -- reference loop, one url ------------------------------------------
    def is_modified(self, url: str, lastmod: str | None,
                    last_indexed) -> bool:
        if last_indexed is None:
            return True
        last_indexed = to_utc(last_indexed)
        if lastmod:
            return to_utc(from_iso_datetime(lastmod)) > last_indexed
        response = self.session.head(url, timeout=self.timeout)
        header = response.headers.get("last-modified")
        if header:
            return _parse_header_datetime(header) > last_indexed
        return True

    def fetch_one(self, url: str, lastmod: str | None = None,
                  last_indexed=None) -> tuple[bytes, str, dict]:
        """GET one url → (body, content_type, headers); raises
        NotModified / AttemptedRedirect / FetchingError exactly like
        the reference."""
        if not self.force and not self.is_modified(url, lastmod, last_indexed):
            raise NotModified(url)

        host = host_of(url)
        response = self.session.get(
            url, allow_redirects=False, timeout=self.timeout
        )
        if response.is_redirect:
            raise AttemptedRedirect(url)

        retries = 0
        while response.status_code == 429:
            if retries >= self.max_429_retries:
                raise FetchingError(
                    f"Could not fetch {url}. Got status 429 after "
                    f"{retries} retries"
                )
            sleeptime = self.sleeptimes.setdefault(host, self.base_sleeptime)
            time.sleep(sleeptime)
            response = self.session.get(
                url, allow_redirects=False, timeout=self.timeout
            )
            if response.status_code == 429:
                self.sleeptimes[host] = sleeptime * 2
            retries += 1

        if response.status_code != 200:
            raise FetchingError(
                f"Could not fetch {url}. Got status {response.status_code}"
            )
        content_type = get_content_type(response.headers.get("Content-Type"))
        return response.content, content_type, dict(response.headers)

    # -- batch contract ----------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        import requests

        offsets = None
        if self.pace_from is not None and "planned_offset" in batch.column_names:
            batch = batch.sort_by("planned_offset")
            offsets = batch["planned_offset"].to_pylist()
        urls = batch["url"].to_pylist()
        lastmods = (
            batch["lastmod"].to_pylist()
            if "lastmod" in batch.column_names else [None] * len(urls)
        )
        last_indexed = (
            batch["last_indexed"].to_pylist()
            if "last_indexed" in batch.column_names else [None] * len(urls)
        )
        rows = {name: [] for name in FETCH_OUTPUT_SCHEMA.names}
        for i, url in enumerate(urls):
            if offsets is not None and offsets[i] is not None:
                wait = (self.pace_from + offsets[i]) - time.time()
                if wait > 0:
                    time.sleep(wait)
            body, ctype, headers, status = None, None, None, "fetched"
            try:
                body, ctype, headers = self.fetch_one(
                    url, lastmods[i], last_indexed[i]
                )
            except NotModified:
                status = "not_modified"
            except AttemptedRedirect:
                status = "redirect"
            except FetchingError:
                status = "fetch_error"
            except requests.RequestException:
                # dead host / timeout / connection reset — routine in a
                # live crawl; quarantine the row, never the Ray task
                status = "fetch_error"
            except (ValueError, OverflowError):
                # malformed sitemap lastmod or last-modified header
                # escaping the date parsers
                status = "fetch_error"
            rows["url"].append(url)
            rows["lastmod"].append(lastmods[i])
            rows["shard"].append(
                batch["shard"][i].as_py() if "shard" in batch.column_names else 0
            )
            rows["seq"].append(
                batch["seq"][i].as_py() if "seq" in batch.column_names else i
            )
            rows["fetch_order"].append(
                batch["fetch_order"][i].as_py()
                if "fetch_order" in batch.column_names else -1
            )
            rows["html"].append(body)
            rows["text"].append(None)  # conversion is the engine's job
            rows["content_type"].append(ctype)
            rows["headers"].append(
                list(headers.items()) if headers is not None else None
            )
            rows["site_id"].append(host_of(url))
            rows["doc_id"].append(-1)
            rows["fetch_status"].append(status)
        return pa.table(rows, schema=FETCH_OUTPUT_SCHEMA)


def http_fetch_pool(plan, concurrency=(1, 16), batch_size: int = 256,
                    **actor_kwargs):
    """Plan → HttpFetchActor pool → resource rows (no shuffle); the
    production twin of pipelines.crawl.fetch_pool."""
    return plan.map_batches(
        HttpFetchActor,
        fn_constructor_kwargs=actor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class RequestsFetch:
    """Picklable ``fetch(url) -> (status, content_type, body)``
    callable for the sitemap-discovery stage (sources/sitemap.py
    takes any such callable): the session is built lazily per
    process, so the object ships to Ray tasks cleanly."""

    def __init__(self, timeout: float = 10.0,
                 user_agent: str = "ftw-crawler-ray/1.0"):
        self.timeout = timeout
        self.user_agent = user_agent
        self._session = None

    def __getstate__(self):
        return {"timeout": self.timeout, "user_agent": self.user_agent}

    def __setstate__(self, state):
        self.timeout = state["timeout"]
        self.user_agent = state["user_agent"]
        self._session = None

    def __call__(self, url: str):
        if self._session is None:
            import requests

            self._session = requests.Session()
            self._session.headers["User-Agent"] = self.user_agent
        r = self._session.get(url, allow_redirects=False,
                              timeout=self.timeout)
        return (r.status_code, r.headers.get("Content-Type", ""), r.content)
