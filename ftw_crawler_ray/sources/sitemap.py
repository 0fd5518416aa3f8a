"""Sitemap discovery + parsing (S1-S4) as Dataset-source kernels.

Reference semantics replicated (sitemap.py:12-219):
- discovery order: explicit ``site.sitemap_urls`` → no discovery;
  else ``sitemap_index.xml`` / ``sitemap_index.xml.gz`` under the
  site url (no redirects), validated as ``//sitemapindex``; else a
  *virtual* index wrapping the discovered single sitemap
  (``sitemap.xml[.gz]`` validated as ``//urlset``); nothing found →
  NoSitemapFound (:174-175)
- gzip detection by Content-Type / ``.gz`` path only (utils.py:69-78)
- ``<url>``/``<sitemap>`` nodes → dicts with only the PROPERTIES
  keys that are present (:105-113, :211-219); values are the XML
  text verbatim
- membership tests are case-insensitive on ``loc`` (:200-204)

Network is abstracted behind ``fetch(url) -> (status_code,
content_type, body_bytes) | None``; production plugs an HTTP
session, tests/sandbox plug a dict-backed corpus. The Ray-side
shape: one ``flat_map``-style batch kernel per site expanding
(site, fetch) → frontier url_info rows with (site_seq, sitemap_seq,
url_seq) ordering columns (A3).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pyarrow as pa

from ..exceptions import NoSitemapFound
from ..functions.markup import parse_xml
from ..functions.textutils import gunzip, is_gzipped

SITEMAP_INDEX_NAMES = ("sitemap_index.xml", "sitemap_index.xml.gz")
SITEMAP_NAMES = ("sitemap.xml", "sitemap.xml.gz")
PROPERTIES = ("loc", "lastmod", "changefreq", "priority", "target")


def _maybe_gunzip(body: bytes, content_type, url: str) -> bytes:
    if is_gzipped(content_type, url.split("?")[0]):
        return gunzip(body)
    return body


def _nodes_to_infos(root, node_name: str):
    """``<url>``/``<sitemap>`` children → property dicts, key present
    only when the element is (reference sitemap.py:105-113,211-219)."""
    infos = []
    for node in root.iter(node_name):
        info = {}
        for name in PROPERTIES:
            el = node.find(name)
            if el is not None and el.text is not None:
                info[name] = el.text
        infos.append(info)
    return infos


class Sitemap:
    """One parsed urlset (reference sitemap.py:178-219)."""

    def __init__(self, site, sitemap_xml: bytes, url=None):
        self.site = site
        self.url = url
        self.root = parse_xml(sitemap_xml)
        self._url_infos = None

    def is_sitemap(self) -> bool:
        return self.root.tag == "urlset" or any(
            True for _ in self.root.iter("urlset")
        )

    @property
    def url_infos(self) -> list[dict]:
        if self._url_infos is None:
            self._url_infos = _nodes_to_infos(self.root, "url")
        return self._url_infos

    def __contains__(self, url: str) -> bool:
        return url.lower() in (ui["loc"].lower() for ui in self.url_infos)


class SitemapIndex:
    """A parsed sitemapindex (reference sitemap.py:55-113)."""

    def __init__(self, site, sitemap_idx_xml: bytes, url=None, fetch=None):
        self.site = site
        self.url = url
        self.root = parse_xml(sitemap_idx_xml)
        self._fetch = fetch
        self._sitemap_infos = None
        self._sitemaps = None

    def is_sitemap_index(self) -> bool:
        return self.root.tag == "sitemapindex" or any(
            True for _ in self.root.iter("sitemapindex")
        )

    @property
    def sitemap_infos(self) -> list[dict]:
        if self._sitemap_infos is None:
            self._sitemap_infos = _nodes_to_infos(self.root, "sitemap")
        return self._sitemap_infos

    @property
    def sitemaps(self) -> list[Sitemap]:
        if self._sitemaps is None:
            fetcher = SitemapFetcher(self.site, self._fetch)
            self._sitemaps = [
                fetcher.fetch(info["loc"]) for info in self.sitemap_infos
            ]
        return self._sitemaps

    def __contains__(self, url: str) -> bool:
        return any(url in sm for sm in self.sitemaps)


class VirtualSitemapIndex(SitemapIndex):
    """Uniform interface over a discovered bare sitemap (reference
    sitemap.py:116-135)."""

    def __init__(self, site, sitemaps, url=None):
        self.site = site
        self._sitemaps = sitemaps
        self.url = url

    @property
    def sitemaps(self):
        return self._sitemaps

    @property
    def sitemap_infos(self):
        raise NotImplementedError


class SitemapFetcher:
    """Discover/download one sitemap (reference sitemap.py:138-175)."""

    def __init__(self, site, fetch):
        self.site = site
        self._fetch = fetch

    def fetch(self, url=None) -> Sitemap:
        if url is not None:
            resp = self._fetch(url)
            if resp is None:
                raise NoSitemapFound(f"No sitemap at {url}!")
            status, content_type, body = resp
            return Sitemap(
                self.site, _maybe_gunzip(body, content_type, url), url
            )
        for sm_name in SITEMAP_NAMES:
            url = urljoin(self.site.url, sm_name)
            resp = self._fetch(url)
            if resp is None or resp[0] != 200:
                continue
            status, content_type, body = resp
            sitemap = Sitemap(
                self.site, _maybe_gunzip(body, content_type, url), url
            )
            if sitemap.is_sitemap():
                return sitemap
        raise NoSitemapFound(f"No sitemap found for {self.site.url}!")


class SitemapIndexFetcher:
    """Discover the sitemap index for a site (reference
    sitemap.py:20-52)."""

    def __init__(self, site, fetch):
        self.site = site
        self._fetch = fetch

    def fetch(self) -> SitemapIndex:
        if self.site.sitemap_urls:
            fetcher = SitemapFetcher(self.site, self._fetch)
            sitemaps = [fetcher.fetch(u) for u in self.site.sitemap_urls]
            return VirtualSitemapIndex(self.site, sitemaps=sitemaps)

        for sm_idx_name in SITEMAP_INDEX_NAMES:
            url = urljoin(self.site.url, sm_idx_name)
            resp = self._fetch(url)  # no redirects, like the reference
            if resp is None or resp[0] != 200:
                continue
            status, content_type, body = resp
            index = SitemapIndex(
                self.site,
                _maybe_gunzip(body, content_type, url),
                url,
                fetch=self._fetch,
            )
            if index.is_sitemap_index():
                return index

        sitemap = SitemapFetcher(self.site, self._fetch).fetch()
        return VirtualSitemapIndex(self.site, sitemaps=[sitemap])


def frontier_rows_for_site(site, fetch, site_seq: int = 0) -> pa.Table:
    """The flat_map kernel: one site → frontier url_info rows with
    (site_seq, sitemap_seq, url_seq) reference-order columns
    (main.py:107-113 total order, SURVEY.md A3)."""
    index = SitemapIndexFetcher(site, fetch).fetch()
    cols = {p: [] for p in PROPERTIES}
    site_seqs, sitemap_seqs, url_seqs, site_ids = [], [], [], []
    for sm_seq, sitemap in enumerate(index.sitemaps):
        for u_seq, info in enumerate(sitemap.url_infos):
            for p in PROPERTIES:
                cols[p].append(info.get(p))
            site_seqs.append(site_seq)
            sitemap_seqs.append(sm_seq)
            url_seqs.append(u_seq)
            site_ids.append(site.crawler_site_id or site.url)
    return pa.table(
        {
            "url": pa.array(cols["loc"], pa.string()),
            "lastmod": pa.array(cols["lastmod"], pa.string()),
            "changefreq": pa.array(cols["changefreq"], pa.string()),
            "priority": pa.array(cols["priority"], pa.string()),
            "target": pa.array(cols["target"], pa.string()),
            "site_id": pa.array(site_ids, pa.string()),
            "site_seq": pa.array(site_seqs, pa.int64()),
            "sitemap_seq": pa.array(sitemap_seqs, pa.int64()),
            "url_seq": pa.array(url_seqs, pa.int64()),
        }
    )


def synthesize_sitemap_xml(urls: list[str], lastmods: list) -> bytes:
    """Valid sitemaps.org-0.9 urlset XML for a url list (used by the
    sandbox to exercise the real XML writer→parser round-trip)."""
    parts = [
        b'<?xml version="1.0" encoding="UTF-8"?>\n'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    ]
    for url, lm in zip(urls, lastmods):
        parts.append(b"<url><loc>" + url.encode() + b"</loc>")
        if lm is not None:
            parts.append(b"<lastmod>" + lm.encode() + b"</lastmod>")
        parts.append(b"</url>")
    parts.append(b"</urlset>")
    return b"".join(parts)


def frontier_from_sites(sites, fetch, concurrency: int = 8):
    """Seed-expansion stage: Dataset of sites → frontier Dataset via
    per-site sitemap discovery (network-bound tasks; one task per
    site — SURVEY.md S1-S4 mapping)."""
    import ray.data

    site_list = list(sites)

    def expand(batch: pa.Table) -> pa.Table:
        tables = [
            frontier_rows_for_site(site_list[i], fetch, site_seq=i)
            for i in batch["site_idx"].to_pylist()
        ]
        return pa.concat_tables(tables)

    ds = ray.data.from_items([{"site_idx": i} for i in range(len(site_list))])
    return ds.map_batches(expand, batch_format="pyarrow", batch_size=None)
