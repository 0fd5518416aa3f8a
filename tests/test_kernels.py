"""Kernel-level golden tests — facts ported from the reference test
suite (SURVEY.md §5): test_utils.py, test_extractors.py,
test_metadata.py. Every value here is a pinned reference behavior."""

from datetime import datetime, timezone

import pytest

from ftw_crawler_ray.functions.dates import (
    from_http_datetime,
    from_iso_datetime,
    to_http_datetime,
    to_iso_datetime,
    to_utc,
)
from ftw_crawler_ray.functions.metadata import SimpleMetadata, canonicalize_metadata
from ftw_crawler_ray.functions.textutils import (
    CaseInsensitiveDict,
    get_content_type,
    gunzip,
    is_gzipped,
    lstrip_charset,
    normalize_whitespace,
    parse_content_disposition_filename,
    split_keywords,
)
from ftw_crawler_ray.functions.urlnorm import (
    canonical_url,
    host_hash,
    host_of,
    shard_of,
    slug_from_url,
    slugify,
    uid_for_url,
)

UTC = timezone.utc


class TestNormalizeWhitespace:
    # reference test_utils.py:101-116
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("foo\nbar", "foo bar"),
            ("foo\r\nbar", "foo bar"),
            ("foo\tbar", "foo bar"),
            ("a  b     c", "a b c"),
            (" \r\n \tx \r\n \t ", "x"),
            ("", ""),
            (b"b\xc3\xa4r  baz", "b\xe4r baz"),
        ],
    )
    def test_golden(self, raw, expected):
        assert normalize_whitespace(raw) == expected


class TestSnippetLstrip:
    # reference test_extractors.py:375-430 (char-set lstrip semantics)
    def test_title_not_prefix_returns_text(self):
        assert lstrip_charset("Lorem Ipsum", "Foo") == "Lorem Ipsum"

    def test_strips_title_prefix(self):
        text = normalize_whitespace("My Title\nLorem Ipsum")
        assert lstrip_charset(text, "My Title") == "Lorem Ipsum"

    def test_charset_semantics_non_ascii(self):
        assert lstrip_charset("B\xe4rengraben", "B\xe4ren") == "graben"


class TestDates:
    # reference test_utils.py:58-98 / test_extractors.py:433-455
    def test_iso_with_offset(self):
        assert from_iso_datetime("2014-12-31T16:45:30+01:00") == datetime(
            2014, 12, 31, 15, 45, 30, tzinfo=UTC
        )

    def test_iso_date_only(self):
        assert from_iso_datetime("2014-12-31") == datetime(2014, 12, 31, tzinfo=UTC)

    def test_to_iso(self):
        assert (
            to_iso_datetime(datetime(2014, 12, 31, 15, 45, 30))
            == "2014-12-31T15:45:30.000000Z"
        )

    def test_http_rfc1123(self):
        assert from_http_datetime("Wed, 31 Dec 2014 15:45:30 GMT") == datetime(
            2014, 12, 31, 15, 45, 30, tzinfo=UTC
        )

    def test_http_rfc850(self):
        assert from_http_datetime("Wednesday, 31-Dec-14 15:45:30 GMT") == datetime(
            2014, 12, 31, 15, 45, 30, tzinfo=UTC
        )

    def test_http_asctime(self):
        assert from_http_datetime("Wed Dec 31 15:45:30 2014") == datetime(
            2014, 12, 31, 15, 45, 30, tzinfo=UTC
        )

    def test_to_http(self):
        assert (
            to_http_datetime(datetime(2014, 12, 31, 15, 45, 30, tzinfo=UTC))
            == "Wed, 31 Dec 2014 15:45:30 GMT"
        )

    def test_to_utc_naive_assumed_utc(self):
        assert to_utc(datetime(2020, 1, 1)) == datetime(2020, 1, 1, tzinfo=UTC)


class TestContentTypeGzip:
    # reference utils.py:57-85 / test_utils.py
    def test_strips_charset(self):
        assert get_content_type("text/html; charset=utf-8") == "text/html"

    def test_none_safe(self):
        assert get_content_type(None) is None

    def test_is_gzipped_by_type(self):
        assert is_gzipped("application/x-gzip", "/sitemap.xml")

    def test_is_gzipped_by_extension(self):
        assert is_gzipped("text/xml", "/sitemap.xml.gz")

    def test_not_gzipped(self):
        assert not is_gzipped("text/xml; charset=utf-8", "/sitemap.xml")

    def test_gunzip_roundtrip(self):
        import gzip as _gzip

        assert gunzip(_gzip.compress(b"<urlset/>")) == b"<urlset/>"


class TestUid:
    # reference test_extractors.py:515-541
    def test_golden(self):
        assert uid_for_url("http://example.org") == (
            "dab521de-65f9-250b-4cca-7383feef67dc"
        )

    def test_stable_and_distinct(self):
        assert uid_for_url("http://example.org") == uid_for_url("http://example.org")
        assert uid_for_url("http://example.org") != uid_for_url(
            "http://example.org/foo"
        )


class TestSlug:
    # reference test_extractors.py:544-598
    @pytest.mark.parametrize(
        "url,expected",
        [
            ("http://example.org/foo/bar", "bar"),
            ("http://example.org/foo/bar/", "bar"),
            ("http://example.org/", "index-html"),
            ("http://example.org/foo%20bar", "foo-bar"),
            ("http://example.org/b\xe4rengraben", "barengraben"),
        ],
    )
    def test_golden(self, url, expected):
        assert slug_from_url(url) == expected

    def test_slugify_basic(self):
        assert slugify("Foo Bar  Baz") == "foo-bar-baz"

    def test_batch_kernel_matches_scalar(self):
        """slugs_for_urls (Arrow fast path + scalar fallback) must be
        byte-identical to slug_from_url per url — including every
        fallback trigger: %-encoding, '+', query, fragment, unicode,
        whitespace, no scheme, uppercase, ports, userinfo, UUID
        golden urls."""
        from ftw_crawler_ray.functions.urlnorm import slugs_for_urls

        urls = [
            "http://example.org/foo/bar",
            "http://example.org/foo/bar/",
            "http://example.org/",
            "http://example.org",
            "HTTP://EXAMPLE.ORG/Foo/BAR.HTML",
            "http://example.org/foo%20bar",
            "http://example.org/a+b",
            "http://example.org/page?x=1",
            "http://example.org/page#frag",
            "http://example.org/b\xe4rengraben",
            "http://h1.example.org:8080/docs/page-42",
            "http://user@h.example.org/docs/x",
            "//example.org/schemeless/path",
            "example.org/no/scheme",
            "http://example.org/a/b/c.d-e_f",
            "http://example.org/trailing///",
            "http://example.org/tab\there",
            None,
        ]
        expected = [
            slug_from_url(u) if u is not None else None for u in urls
        ]
        assert slugs_for_urls(urls) == expected
        import pyarrow as pa

        assert slugs_for_urls(pa.array(urls, pa.string())) == expected

    def test_batch_kernel_raises_like_scalar_on_bad_ipv6(self):
        """urlsplit raises on malformed IPv6 netlocs; the batch
        kernel must route such urls through the scalar fallback so
        both paths raise identically (engine quarantine parity)."""
        from ftw_crawler_ray.functions.urlnorm import slugs_for_urls

        bad = "http://[h1.example.org/docs/page-7"
        with pytest.raises(ValueError):
            slug_from_url(bad)
        with pytest.raises(ValueError):
            slugs_for_urls(["http://ok.example.org/a", bad])


class TestKeywords:
    # reference test_extractors.py:485-510
    def test_comma_separated(self):
        assert split_keywords("Foo, Bar,     Baz") == ["Foo", "Bar", "Baz"]

    def test_whitespace_separated(self):
        assert split_keywords("Foo Bar     Baz") == ["Foo", "Bar", "Baz"]


class TestContentDisposition:
    # reference test_extractors.py (FilenameExtractor)
    def test_quoted(self):
        assert (
            parse_content_disposition_filename('attachment; filename="document.pdf"')
            == "document.pdf"
        )

    def test_absent(self):
        assert parse_content_disposition_filename("attachment") is None


class TestMetadataMapping:
    # reference test_metadata.py:22-26 — dcterms > dc precedence
    def test_precedence(self):
        md = SimpleMetadata({"dc:title": "dc", "dcterms:title": "dcterms"})
        assert md["title"] == "dcterms"

    def test_bare_key_last(self):
        assert canonicalize_metadata({"title": "bare"})["title"] == "bare"

    def test_creator_author_alias(self):
        assert canonicalize_metadata({"author": "A"})["creator"] == "A"


class TestCaseInsensitiveDict:
    # requests.CaseInsensitiveDict reliance, reference extractors.py:339-352
    def test_lookup(self):
        d = CaseInsensitiveDict({"Last-Modified": "x"})
        assert "last-modified" in d
        assert d["LAST-MODIFIED"] == "x"
        assert d.get("missing") is None


class TestUrlNorm:
    def test_canonical_url_lower(self):
        # case-insensitive membership, reference sitemap.py:200-204
        assert canonical_url("http://EX.org/Foo") == "http://ex.org/foo"

    def test_host_of(self):
        assert host_of("https://WWW.Example.org:8443/x?y=1") == "example.org"

    def test_host_hash_stable_nonnegative(self):
        h = host_hash("example.org")
        assert h == host_hash("example.org")
        assert 0 <= h < 2**63

    def test_shard_of_range(self):
        assert 0 <= shard_of("example.org", 16) < 16


class TestRegexXPathFastPath:
    """The regex shortcut for //parent[@attr='v']/child must EQUAL
    the streaming scanner wherever it doesn't fall back — on the
    whole synthetic corpus and on adversarial shapes (comments,
    entities, nested markup, mixed quotes, scripts, case)."""

    CASES = [
        '<div id="content"><h1>A</h1></div>',
        "<div id='content'><h1>B</h1></div>",
        "<div id=content class=x><h1>C</h1></div>",
        '<p id="content"><h1>n</h1></p><div id="content"><h1>D</h1></div>',
        '<div title=\'id="content"\'><h1>X</h1></div><div id="content"><h1>E</h1></div>',
        '<!-- <div id="content"><h1>no</h1></div> --><div id="content"><h1>F</h1></div>',
        '<div id="content"><p>p</p><h1>G</h1></div>',
        '<div id="content"><h1>H&amp;M</h1></div>',
        '<div id="content"><h1><b>I</b> J</h1></div>',
        '<DIV ID="content"><H1>K</H1></DIV>',
        '<div id="content"></div>',
        "<span>no divs at all</span>",
        '<div id="contents"><h1>near</h1></div>',
        '<script>var s=\'<div id="content"><h1>fake</h1>\';</script>'
        '<div id="content"><h1>L</h1></div>',
        '<div id="content"><h1/></div>',
        '<div  id = "content" ><h1>M</h1></div>',
        # attr-name boundary: data-id must NOT satisfy @id (and must not
        # shadow a later real id="content" match)
        '<div data-id="content"><h1>no</h1></div>',
        '<div data-id="content"><h1>no</h1></div><div id="content"><h1>N</h1></div>',
        '<div data-id="content" id="content"><h1>O</h1></div>',
        '<div class="x" data-id="content"><h1>no</h1></div>',
    ]

    def test_adversarial_equivalence_or_fallback(self):
        from ftw_crawler_ray.functions.markup import (
            _AMBIGUOUS,
            _FirstMatchScanner,
            _regex_child_text,
        )

        for doc in self.CASES:
            fast = _regex_child_text(doc, "div", "id", "content", "h1")
            ref = _FirstMatchScanner("h1", "div", "id", "content").scan(doc)
            if fast is not _AMBIGUOUS:
                assert fast == ref, (doc, fast, ref)

    def test_corpus_equivalence(self):
        import pyarrow.parquet as pq

        from ftw_crawler_ray.functions.markup import (
            _AMBIGUOUS,
            _FirstMatchScanner,
            _regex_child_text,
        )
        from ftw_crawler_ray.sources.pages import build_pages

        t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text"])
        pages = build_pages(t["doc_id"].combine_chunks(),
                            t["text"].combine_chunks())
        n_fast = 0
        for h in pages["html"].to_pylist():
            text = h.decode("utf-8")
            fast = _regex_child_text(text, "div", "id", "content", "h1")
            if fast is _AMBIGUOUS:
                continue
            ref = _FirstMatchScanner("h1", "div", "id", "content").scan(text)
            assert fast == ref
            n_fast += 1
        assert n_fast == pages.num_rows  # pristine corpus: all fast


class TestLoggingSetup:
    def test_setup_creates_layout_and_is_idempotent(self, tmp_path):
        import logging

        from ftw_crawler_ray.log import setup_logging

        d = setup_logging(str(tmp_path / "logs"))
        import os
        assert sorted(os.listdir(d)) == ["debug.log", "info.log", "warn.log"]
        n1 = len(logging.root.handlers)
        setup_logging(str(tmp_path / "logs"))  # idempotent re-setup
        assert len(logging.root.handlers) == n1
        # requests logger quieted
        assert logging.getLogger("requests").level == logging.WARN
        # cleanup so other tests' logging is unaffected
        for h in list(logging.root.handlers):
            if getattr(h, "_ftw_crawler_ray", False):
                logging.root.removeHandler(h)
