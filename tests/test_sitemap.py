"""Sitemap parsing/discovery tests — facts ported from reference
test_sitemap.py (parse properties, gzip, discovery cascade, virtual
index, case-insensitive membership)."""

import gzip

import pytest

from ftw_crawler_ray.config import Site
from ftw_crawler_ray.exceptions import NoSitemapFound
from ftw_crawler_ray.sources.sitemap import (
    Sitemap,
    SitemapIndex,
    SitemapIndexFetcher,
    VirtualSitemapIndex,
    frontier_rows_for_site,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

SITEMAP_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url>
    <loc>http://example.org/foo</loc>
    <lastmod>2014-12-31</lastmod>
    <changefreq>daily</changefreq>
    <priority>1.0</priority>
    <target>http://example.org/foo-target</target>
  </url>
  <url>
    <loc>http://example.org/bar</loc>
  </url>
</urlset>""".encode()

SITEMAP_INDEX_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex {NS}>
  <sitemap>
    <loc>http://example.org/sitemap_a.xml</loc>
    <lastmod>2015-01-01</lastmod>
  </sitemap>
  <sitemap>
    <loc>http://example.org/sitemap_b.xml</loc>
  </sitemap>
</sitemapindex>""".encode()

SITEMAP_B = f"""<urlset {NS}>
  <url><loc>http://example.org/baz</loc></url>
</urlset>""".encode()

HTML_404 = b"<html><body>not a sitemap</body></html>"


def corpus_fetch(corpus):
    def fetch(url):
        if url in corpus:
            content_type, body = corpus[url]
            return (200, content_type, body)
        return (404, "text/html", HTML_404)

    return fetch


SITE = Site("http://example.org/")


class TestSitemapParse:
    # reference test_sitemap.py:129-150
    def test_all_properties(self):
        sm = Sitemap(SITE, SITEMAP_XML)
        assert sm.url_infos[0] == {
            "loc": "http://example.org/foo",
            "lastmod": "2014-12-31",
            "changefreq": "daily",
            "priority": "1.0",
            "target": "http://example.org/foo-target",
        }

    def test_required_only_omits_keys(self):
        sm = Sitemap(SITE, SITEMAP_XML)
        assert sm.url_infos[1] == {"loc": "http://example.org/bar"}

    def test_is_sitemap(self):
        assert Sitemap(SITE, SITEMAP_XML).is_sitemap()
        assert not Sitemap(SITE, SITEMAP_INDEX_XML).is_sitemap()
        assert not Sitemap(SITE, HTML_404).is_sitemap()

    def test_membership_case_insensitive(self):
        # reference sitemap.py:200-204 / test_sitemap.py:163-167
        sm = Sitemap(SITE, SITEMAP_XML)
        assert "http://EXAMPLE.org/FOO" in sm
        assert "http://example.org/nope" not in sm


class TestSitemapIndexParse:
    def test_sitemap_infos(self):
        idx = SitemapIndex(SITE, SITEMAP_INDEX_XML)
        assert idx.is_sitemap_index()
        assert idx.sitemap_infos == [
            {"loc": "http://example.org/sitemap_a.xml", "lastmod": "2015-01-01"},
            {"loc": "http://example.org/sitemap_b.xml"},
        ]


class TestDiscovery:
    # reference test_sitemap.py:224-311
    def test_discovers_index(self):
        fetch = corpus_fetch(
            {
                "http://example.org/sitemap_index.xml": ("text/xml", SITEMAP_INDEX_XML),
                "http://example.org/sitemap_a.xml": ("text/xml", SITEMAP_XML),
                "http://example.org/sitemap_b.xml": ("text/xml", SITEMAP_B),
            }
        )
        idx = SitemapIndexFetcher(SITE, fetch).fetch()
        assert isinstance(idx, SitemapIndex)
        assert len(idx.sitemaps) == 2
        assert "http://example.org/baz" in idx

    def test_gzipped_index_and_sitemap(self):
        # reference test_sitemap.py:38-53,94-111 — .gz path triggers gunzip
        fetch = corpus_fetch(
            {
                "http://example.org/sitemap_index.xml.gz": (
                    "application/x-gzip", gzip.compress(SITEMAP_INDEX_XML)),
                "http://example.org/sitemap_a.xml": ("text/xml", SITEMAP_XML),
                "http://example.org/sitemap_b.xml": ("text/xml", SITEMAP_B),
            }
        )
        idx = SitemapIndexFetcher(SITE, fetch).fetch()
        assert len(idx.sitemaps) == 2

    def test_virtual_index_fallback(self):
        # no index → bare sitemap wrapped in a virtual index
        fetch = corpus_fetch(
            {"http://example.org/sitemap.xml": ("text/xml", SITEMAP_XML)}
        )
        idx = SitemapIndexFetcher(SITE, fetch).fetch()
        assert isinstance(idx, VirtualSitemapIndex)
        assert len(idx.sitemaps) == 1
        with pytest.raises(NotImplementedError):
            idx.sitemap_infos

    def test_non_sitemap_200_skipped_then_fallback(self):
        # a 200 that is NOT a urlset/sitemapindex is skipped
        fetch = corpus_fetch(
            {
                "http://example.org/sitemap_index.xml": ("text/xml", SITEMAP_B),
                "http://example.org/sitemap.xml": ("text/xml", SITEMAP_XML),
            }
        )
        idx = SitemapIndexFetcher(SITE, fetch).fetch()
        assert isinstance(idx, VirtualSitemapIndex)

    def test_explicit_sitemap_urls_skip_discovery(self):
        # reference sitemap.py:32-34 / test_sitemap.py:294-311
        site = Site("http://example.org/",
                    sitemap_urls=["http://cdn.example.net/my_sitemap.xml"])
        fetch = corpus_fetch(
            {"http://cdn.example.net/my_sitemap.xml": ("text/xml", SITEMAP_XML)}
        )
        idx = SitemapIndexFetcher(site, fetch).fetch()
        assert isinstance(idx, VirtualSitemapIndex)
        assert "http://example.org/foo" in idx

    def test_nothing_found_raises(self):
        fetch = corpus_fetch({})
        with pytest.raises(NoSitemapFound):
            SitemapIndexFetcher(SITE, fetch).fetch()


class TestFrontierRows:
    def test_order_columns(self):
        fetch = corpus_fetch(
            {
                "http://example.org/sitemap_index.xml": ("text/xml", SITEMAP_INDEX_XML),
                "http://example.org/sitemap_a.xml": ("text/xml", SITEMAP_XML),
                "http://example.org/sitemap_b.xml": ("text/xml", SITEMAP_B),
            }
        )
        t = frontier_rows_for_site(SITE, fetch, site_seq=3)
        rows = t.to_pylist()
        assert [r["url"] for r in rows] == [
            "http://example.org/foo",
            "http://example.org/bar",
            "http://example.org/baz",
        ]
        assert [(r["site_seq"], r["sitemap_seq"], r["url_seq"]) for r in rows] == [
            (3, 0, 0), (3, 0, 1), (3, 1, 0)
        ]
        assert rows[0]["priority"] == "1.0"
        assert rows[1]["lastmod"] is None  # absent property → null
