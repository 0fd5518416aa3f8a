"""Extractor + engine semantics tests — facts ported from reference
test_extractors.py (golden values cited per class)."""

from datetime import datetime, timezone

import pytest

from ftw_crawler_ray.config import Config, Field, Site
from ftw_crawler_ray.engine import ExtractionEngine, PassthroughConverter, _field_default
from ftw_crawler_ray.exceptions import ExtractionError, NoValueExtracted
from ftw_crawler_ray.extractors import (
    ConstantExtractor,
    CreatorExtractor,
    DescriptionExtractor,
    FieldMappingExtractor,
    FilenameExtractor,
    HeaderMappingExtractor,
    IndexingTimeExtractor,
    KeywordsExtractor,
    LastModifiedExtractor,
    PlainTextExtractor,
    SiteAttributeExtractor,
    SlugExtractor,
    SnippetTextExtractor,
    TargetURLExtractor,
    TitleExtractor,
    UIDExtractor,
    URLExtractor,
    XPathExtractor,
)
from ftw_crawler_ray.resource import ResourceInfo

UTC = timezone.utc

# Structurally equivalent to the reference assets html5_doc.html /
# xhtml_doc.html (div#content > h1 with a nested span, two <p>s).
HTML5_DOC = """<!DOCTYPE html>
<html>
  <head>
    <title>HTML 5 Example</title>
    <meta charset="utf-8"/>
  </head>
 <body>
  <div id="content">
    <h1><span>Der</span> B\xe4rengraben</h1>
    <p>Foo</p>
    <p>Bar</p>
  </div>
 </body>
</html>""".encode("utf-8")

XHTML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN"
  "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">
<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
 <head><title>XHTML 1.0 Strict Example</title></head>
 <body>
  <div id="content">
    <h1><span>Der</span> B\xe4rengraben</h1>
    <p>Foo</p>
    <p>Bar</p>
  </div>
 </body>
</html>""".encode("utf-8")


def res(**kw):
    return ResourceInfo(**kw)


class TestPlainText:
    def test_returns_given_text(self):
        assert PlainTextExtractor().extract_value(res(text="foobar")) == "foobar"

    def test_normalizes(self):
        assert (
            PlainTextExtractor().extract_value(res(text="a \r\n b\t c"))
            == "a b c"
        )


class TestURLExtractors:
    def test_url(self):
        assert (
            URLExtractor().extract_value(res(url_info={"loc": "http://e.org/x"}))
            == "http://e.org/x"
        )

    def test_target_url_present(self):
        ri = res(url_info={"loc": "http://e.org/x", "target": "http://t.org/y"})
        assert TargetURLExtractor().extract_value(ri) == "http://t.org/y"

    def test_target_url_fallback(self):
        ri = res(url_info={"loc": "http://e.org/x"})
        assert TargetURLExtractor().extract_value(ri) == "http://e.org/x"

    def test_uid_golden(self):
        # reference test_extractors.py:515-521
        ri = res(url_info={"loc": "http://example.org"})
        assert (
            UIDExtractor().extract_value(ri)
            == "dab521de-65f9-250b-4cca-7383feef67dc"
        )

    def test_slug_collapses_underscores(self):
        # reference test_extractors.py:286-293
        ri = res(url_info={"loc": "http://example.org/my____title"})
        assert SlugExtractor().extract_value(ri) == "my-title"


class TestXPath:
    # reference test_extractors.py:296-338
    def _ri(self, body):
        return res(
            metadata={},
            url_info={"loc": "http://example.org"},
            headers={},
            body=body,
            content_type="text/html",
        )

    def test_html5(self):
        x = XPathExtractor("//div[@id='content']/h1")
        assert x.extract_value(self._ri(HTML5_DOC)) == "Der B\xe4rengraben"

    def test_xhtml(self):
        x = XPathExtractor("//div[@id='content']/h1")
        assert x.extract_value(self._ri(XHTML_DOC)) == "Der B\xe4rengraben"

    def test_first_of_many(self):
        x = XPathExtractor("//p")
        assert x.extract_value(self._ri(XHTML_DOC)) == "Foo"

    def test_no_match_raises(self):
        x = XPathExtractor("//doesntexist")
        with pytest.raises(NoValueExtracted):
            x.extract_value(self._ri(XHTML_DOC))

    def test_non_markup_type_raises(self):
        ri = self._ri(HTML5_DOC)
        ri.content_type = "application/pdf"
        with pytest.raises(NoValueExtracted):
            XPathExtractor("//p").extract_value(ri)

    def test_latin1_body(self):
        body = "<div id='content'><h1>B\xe4r</h1></div>".encode("latin1")
        assert (
            XPathExtractor("//div[@id='content']/h1").extract_value(self._ri(body))
            == "B\xe4r"
        )

    def test_unsupported_xpath_raises_loudly(self):
        """lxml-only syntax (functions, axes, text()/@attr selection)
        must fail with a clear error naming the supported subset —
        never silently match nothing (a reference user's exotic
        config breaks visibly at extract time)."""
        from ftw_crawler_ray.functions.markup import xpath_to_et

        for bad in ("//div[contains(@class,'x')]", "//a|//b", "//p/text()",
                    "//meta/@content", "//div/following-sibling::p",
                    "//p[last()]"):
            with pytest.raises(ValueError, match="supported"):
                xpath_to_et(bad)
        # the canonical supported shapes still translate
        assert xpath_to_et("//ol/li[2]") == ".//ol/li[2]"
        assert xpath_to_et("//div[@id='content']/h1") == ".//div[@id='content']/h1"


class TestTitleCascade:
    # reference test_extractors.py:252-293
    def test_x_document_title_header_wins(self):
        ri = res(
            metadata={"title": "dont-use-this"},
            headers={"X-Document-Title": "QsOkcmVuZ3JhYmVuCg=="},
        )
        assert TitleExtractor().extract_value(ri) == "B\xe4rengraben"

    def test_xpath_h1_next(self):
        ri = res(
            metadata={"title": "dont-use-this"},
            headers={},
            body=HTML5_DOC,
            content_type="text/html",
        )
        assert TitleExtractor().extract_value(ri) == "Der B\xe4rengraben"

    def test_metadata_title(self):
        ri = res(metadata={"title": "value"}, headers={})
        assert TitleExtractor().extract_value(ri) == "value"

    def test_filename_fallback(self):
        ri = res(
            metadata={},
            headers={"content-disposition": 'attachment; filename="document.pdf"'},
        )
        assert TitleExtractor().extract_value(ri) == "document.pdf"

    def test_slug_fallback(self):
        ri = res(
            metadata={},
            headers={},
            url_info={"loc": "http://example.org/my____title"},
        )
        assert TitleExtractor().extract_value(ri) == "my-title"


class TestSnippet:
    # reference test_extractors.py:375-430
    def test_plain_when_no_title_prefix(self):
        ri = res(metadata={"title": "Foo"}, text="Lorem Ipsum", headers={})
        assert SnippetTextExtractor().extract_value(ri) == "Lorem Ipsum"

    def test_strips_title_prefix(self):
        ri = res(metadata={"title": "My Title"}, text="My Title\nLorem Ipsum",
                 headers={})
        assert SnippetTextExtractor().extract_value(ri) == "Lorem Ipsum"

    def test_charset_lstrip_non_ascii(self):
        ri = res(metadata={"title": "B\xe4ren"}, text="B\xe4rengraben", headers={})
        assert SnippetTextExtractor().extract_value(ri) == "graben"


class TestLastModified:
    # reference test_extractors.py:433-455
    def test_lastmod_from_urlinfo(self):
        ri = res(url_info={"lastmod": "2014-12-31T16:45:30+01:00"})
        assert LastModifiedExtractor().extract_value(ri) == datetime(
            2014, 12, 31, 15, 45, 30, tzinfo=UTC
        )

    def test_header_fallback(self):
        ri = res(url_info={}, headers={"last-modified": "Wed, 31 Dec 2014 15:45:30 GMT"})
        assert LastModifiedExtractor().extract_value(ri) == datetime(
            2014, 12, 31, 15, 45, 30, tzinfo=UTC
        )

    def test_indexing_time_fallback_uses_crawl_ts(self):
        ts = datetime(2020, 5, 1, tzinfo=UTC)
        ri = res(url_info={}, headers={}, crawl_ts=ts)
        assert LastModifiedExtractor().extract_value(ri) == ts


class TestSimpleExtractors:
    def test_description(self):
        assert (
            DescriptionExtractor().extract_value(res(metadata={"description": "D"}))
            == "D"
        )
        with pytest.raises(NoValueExtracted):
            DescriptionExtractor().extract_value(res(metadata={}))

    def test_creator(self):
        assert CreatorExtractor().extract_value(res(metadata={"creator": "C"})) == "C"

    def test_keywords(self):
        assert KeywordsExtractor().extract_value(
            res(metadata={"keywords": "Foo, Bar,     Baz"})
        ) == ["Foo", "Bar", "Baz"]

    def test_filename(self):
        ri = res(headers={"Content-Disposition": 'inline; filename="a.pdf"'})
        assert FilenameExtractor().extract_value(ri) == "a.pdf"

    def test_site_attribute(self):
        site = Site("http://e.org/", attributes={"site_area": "E"})
        assert (
            SiteAttributeExtractor("site_area").extract_value(res(site=site)) == "E"
        )
        with pytest.raises(NoValueExtracted):
            SiteAttributeExtractor("nope").extract_value(res(site=site))

    def test_indexing_time(self):
        ts = datetime(2021, 3, 4, tzinfo=UTC)
        assert IndexingTimeExtractor().extract_value(res(crawl_ts=ts)) == ts


class TestMappingExtractors:
    # reference test_extractors.py:697-837
    def test_header_mapping_content_type_charset_stripped(self):
        x = HeaderMappingExtractor(
            "content-type", {"text/html": "ContentPage"}, default="File"
        )
        ri = res(headers={"Content-Type": "text/html; charset=utf-8"})
        assert x.extract_value(ri) == "ContentPage"

    def test_header_mapping_default(self):
        x = HeaderMappingExtractor("content-type", {"text/html": "P"}, default="File")
        assert x.extract_value(res(headers={"Content-Type": "image/png"})) == "File"
        assert x.extract_value(res(headers={})) == "File"

    def test_header_mapping_raises_without_default(self):
        x = HeaderMappingExtractor("content-type", {"text/html": "P"})
        with pytest.raises(NoValueExtracted):
            x.extract_value(res(headers={}))

    def test_field_mapping(self):
        config = _basic_config()
        ri = res(headers={"Content-Type": "text/html"},
                 url_info={"loc": "http://e.org/x"}, metadata={}, text="t")
        obj_type = config.get_field("object_type")
        assert obj_type.extractor.extract_value(ri) == "CONTENT_PAGE"


def _basic_config():
    """A trimmed analog of the reference's canonical 20-field config
    (tests/assets/basic_config.py:62-115)."""
    return Config(
        sites=[Site("http://e.org/", attributes={"site_area": "E"})],
        unique_field="UID",
        url_field="path_string",
        last_modified_field="modified",
        fields=[
            Field("UID", extractor=UIDExtractor(), required=True),
            Field("path_string", extractor=URLExtractor()),
            Field("getRemoteUrl", extractor=TargetURLExtractor()),
            Field("getId", extractor=SlugExtractor()),
            Field("Title", extractor=TitleExtractor()),
            Field("SearchableText", extractor=PlainTextExtractor()),
            Field("snippetText", extractor=SnippetTextExtractor()),
            Field("Description", extractor=DescriptionExtractor()),
            Field("portal_type",
                  extractor=HeaderMappingExtractor(
                      "content-type",
                      {"text/html": "ContentPage", "application/pdf": "File"},
                      default="File")),
            Field("object_type",
                  extractor=FieldMappingExtractor(
                      "portal_type",
                      {"ContentPage": "CONTENT_PAGE", "File": "FILE"},
                      default="File")),
            Field("modified", extractor=LastModifiedExtractor(), type_=datetime),
            Field("created", extractor=LastModifiedExtractor(), type_=datetime,
                  required=True),
            Field("showinsearch", extractor=ConstantExtractor(True), type_=bool),
            Field("allowedRolesAndUsers",
                  extractor=ConstantExtractor(["Anonymous"]), multivalued=True),
            Field("Subject", extractor=KeywordsExtractor(), multivalued=True),
            Field("site_area", extractor=SiteAttributeExtractor("site_area")),
        ],
    )


class TestEngineSemantics:
    # reference test_extractors.py:108-229
    def test_required_default_for_str_and_datetime(self):
        # reference :193-218 — u'' and epoch
        assert _field_default(Field("x", ConstantExtractor("v"))) == ""
        f = Field("x", ConstantExtractor("v"), type_=datetime)
        assert _field_default(f) == datetime(1970, 1, 1)

    def test_unknown_extractor_type_raises(self):
        class Rogue:
            def bind(self, f):
                pass

            def extract_value(self, ri):
                return "x"

        config = Config(
            sites=[], unique_field="u", url_field="u", last_modified_field="m",
            fields=[Field("bad", extractor=Rogue())],
        )
        with pytest.raises(ExtractionError):
            ExtractionEngine(config)

    def test_batch_extraction_end_to_end(self):
        import pyarrow as pa

        config = _basic_config()
        engine = ExtractionEngine(
            config,
            converter=PassthroughConverter(),
            crawl_ts=datetime(2020, 1, 1, tzinfo=UTC),
            keep_input_columns=("url",),
        )
        batch = pa.table(
            {
                "url": ["http://e.org/foo/bar", "http://e.org/"],
                "text": ["My Title\nLorem Ipsum", "B\xe4rengraben"],
                "html": [
                    b"<div id='content'><h1>My Title</h1></div>",
                    None,
                ],
                "content_type": ["text/html", "text/html"],
                "lastmod": ["2014-12-31", None],
                "metadata": [None, {"title": "B\xe4ren", "keywords": "a, b"}],
                "headers": [None, None],
            }
        )
        out = engine(batch)
        rows = out.to_pylist()
        assert rows[0]["UID"] is not None
        assert rows[0]["Title"] == "My Title"
        assert rows[0]["snippetText"] == "Lorem Ipsum"
        assert rows[0]["SearchableText"] == "My Title Lorem Ipsum"
        assert rows[0]["modified"] == datetime(2014, 12, 31)
        assert rows[0]["Description"] is None  # optional-missing → null
        assert rows[0]["portal_type"] == "ContentPage"
        assert rows[0]["object_type"] == "CONTENT_PAGE"
        assert rows[0]["showinsearch"] is True
        assert rows[0]["allowedRolesAndUsers"] == ["Anonymous"]
        assert rows[0]["Subject"] is None
        assert rows[1]["Title"] == "B\xe4ren"
        assert rows[1]["snippetText"] == "graben"
        assert rows[1]["getId"] == "index-html"
        assert rows[1]["Subject"] == ["a", "b"]
        assert rows[1]["site_area"] == "E"
        # fallback to crawl_ts for missing lastmod (deterministic)
        assert rows[1]["modified"] == datetime(2020, 1, 1)
