"""Engine extras: HtmlConverter (text/metadata from raw HTML),
third-party plugin extractors (row-path fallback), quarantine mode."""

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from ftw_crawler_ray.config import Config, Field, Site
from ftw_crawler_ray.engine import ExtractionEngine, HtmlConverter
from ftw_crawler_ray.exceptions import NoValueExtracted
from ftw_crawler_ray.extractors import (
    DescriptionExtractor,
    MetadataExtractor,
    PlainTextExtractor,
    TitleExtractor,
    UIDExtractor,
)

UTC = timezone.utc

HTML = b"""<html><head>
<title>Head Title</title>
<meta name="description" content="A test page"/>
<meta name="author" content="A. Writer"/>
</head><body><div id="content"><h1>Body H1</h1><p>Some  body\ttext</p></div>
</body></html>"""


def _config(extra_fields=()):
    return Config(
        sites=[Site("http://e.org/")],
        unique_field="UID",
        url_field="path_string",
        last_modified_field="modified",
        fields=[
            Field("UID", extractor=UIDExtractor(), required=True),
            Field("Title", extractor=TitleExtractor()),
            Field("SearchableText", extractor=PlainTextExtractor()),
            Field("Description", extractor=DescriptionExtractor()),
            *extra_fields,
        ],
    )


class TestHtmlConverter:
    def test_text_and_metadata_from_html(self):
        # S7/S8 stand-in: no `text` column — converter derives text
        # from the body, metadata from <meta>/<title>
        engine = ExtractionEngine(
            _config(), converter=HtmlConverter(),
            crawl_ts=datetime(2021, 1, 1, tzinfo=UTC),
        )
        assert not engine._vectorized  # custom converter → row path
        batch = pa.table(
            {
                "url": ["http://e.org/x"],
                "html": [HTML],
                "content_type": ["text/html"],
            }
        )
        row = engine(batch).to_pylist()[0]
        assert row["Title"] == "Body H1"  # xpath beats metadata title
        assert row["Description"] == "A test page"
        assert "Some body text" in row["SearchableText"]

    def test_metadata_author_canonicalized_to_creator(self):
        conv = HtmlConverter()
        from ftw_crawler_ray.resource import ResourceInfo

        ri = ResourceInfo(body=HTML)
        md = conv.extract_metadata(ri)
        from ftw_crawler_ray.functions.metadata import canonicalize_metadata

        assert canonicalize_metadata(md)["creator"] == "A. Writer"


class TestPluginExtractor:
    def test_third_party_extractor_runs_via_row_path(self):
        # reference extension surface (extractors.py:24-76;
        # test_extractors.py:48-79 pattern): subclass + type tag
        class WordCountExtractor(MetadataExtractor):
            def extract_value(self, resource_info):
                if not resource_info.text:
                    raise NoValueExtracted
                return str(len(resource_info.text.split()))

        engine = ExtractionEngine(
            _config(extra_fields=(Field("wordCount",
                                        extractor=WordCountExtractor()),)),
            crawl_ts=datetime(2021, 1, 1, tzinfo=UTC),
        )
        assert not engine._vectorized  # plugin lacks extract_batch
        batch = pa.table(
            {
                "url": ["http://e.org/x"],
                "text": ["one two three"],
                "content_type": ["text/html"],
            }
        )
        row = engine(batch).to_pylist()[0]
        assert row["wordCount"] == "3"

    def test_untagged_extractor_rejected(self):
        class Rogue:
            def bind(self, f):
                pass

        from ftw_crawler_ray.exceptions import ExtractionError

        with pytest.raises(ExtractionError):
            ExtractionEngine(
                _config(extra_fields=(Field("bad", extractor=Rogue()),))
            )


class TestQuarantine:
    def test_strict_false_captures_row_errors(self):
        # per-row error capture → _error column, batch survives
        # (SURVEY.md §4.1 error isolation; replaces SlackLogger S13)
        class Exploding(MetadataExtractor):
            def extract_value(self, resource_info):
                if resource_info.url_info.get("loc", "").endswith("bad"):
                    raise RuntimeError("boom")
                return "ok"

        engine = ExtractionEngine(
            _config(extra_fields=(Field("maybe", extractor=Exploding()),)),
            crawl_ts=datetime(2021, 1, 1, tzinfo=UTC),
            keep_input_columns=("url",),
            strict=False,
        )
        batch = pa.table(
            {
                "url": ["http://e.org/good", "http://e.org/bad"],
                "text": ["t", "t"],
                "content_type": ["text/html", "text/html"],
            }
        )
        out = engine(batch).to_pylist()
        assert out[0]["_error"] is None and out[0]["maybe"] == "ok"
        assert out[1]["_error"] is not None and "boom" in out[1]["_error"]
        assert out[1]["UID"] is None


class TestExampleConfig:
    def test_loads_and_extracts_with_custom_plugin(self):
        """examples/config_example.py is the user-facing parity demo:
        it must load via load_config and extract a row end-to-end,
        including its custom WordCountExtractor plugin field."""
        import pyarrow as pa

        from ftw_crawler_ray.config import load_config
        from ftw_crawler_ray.engine import ExtractionEngine

        config = load_config("/root/repo/examples/config_example.py")
        assert config.get_field("UID").required
        engine = ExtractionEngine(config, crawl_ts=None,
                                  keep_input_columns=("url",))
        batch = pa.table(
            {
                "url": pa.array(["http://h0.example.org/docs/page-7"]),
                "html": pa.array([b"<html><body>eins zwei drei</body></html>"],
                                 pa.binary()),
                "text": pa.array(["eins zwei drei"], pa.string()),
                "content_type": pa.array(["text/html"]),
                "site_id": pa.array(["h0.example.org"]),
                "doc_id": pa.array([7], pa.int64()),
            }
        )
        out = engine(batch)
        row = {c: out[c][0].as_py() for c in out.column_names}
        assert row["word_count"] == 3          # the custom plugin ran
        assert row["SearchableText"] == "eins zwei drei"
        assert row["portal_type"] == "ContentPage"
        assert row["object_type"] == "CONTENT_PAGE"


class TestTestingHelpers:
    """ftw_crawler_ray.testing — the plugin-author surface."""

    def test_extract_one_and_mock_converter(self):
        from ftw_crawler_ray.pipelines.extract import corpus_config
        from ftw_crawler_ray.testing import MockConverter, extract_one

        row = extract_one(
            corpus_config(),
            url="http://h0.example.org/docs/page-3",
            html="<html><body>ignored</body></html>",
            converter=MockConverter(metadata={"title": "Stubbed"},
                                    text="stub text"),
        )
        assert row["SearchableText"] == "stub text"
        assert row["Title"] == "Stubbed"

    def test_corpus_fetch_and_paths_agree(self):
        import pyarrow as pa

        from ftw_crawler_ray.pipelines.extract import corpus_config
        from ftw_crawler_ray.sources.pages import build_pages
        from ftw_crawler_ray.testing import (
            assert_engine_paths_agree,
            corpus_fetch,
        )

        fetch = corpus_fetch({"http://a.org/x": ("text/plain", b"hi")})
        assert fetch("http://a.org/x")[0] == 200
        assert fetch("http://a.org/y")[0] == 404

        batch = build_pages(
            pa.array([1, 2, 3], pa.int64()),
            pa.array(["eins zwei", "drei vier", "fünf sechs"], pa.string()),
        )
        assert_engine_paths_agree(corpus_config(), batch)

    def test_paths_agree_on_randomized_header_casing(self):
        """Reference headers are a requests CaseInsensitiveDict — both
        engine paths must resolve X-Document-Title / Content-Disposition
        / Last-Modified / content-type regardless of the wire casing
        (reference extractors.py:199,339-360; SURVEY §1.3)."""
        import base64
        import random

        import pyarrow as pa

        from ftw_crawler_ray.pipelines.extract import corpus_config
        from ftw_crawler_ray.testing import assert_engine_paths_agree

        rng = random.Random(42)

        def shuffle_case(name):
            return "".join(
                c.upper() if rng.random() < 0.5 else c.lower() for c in name
            )

        n = 8
        headers = []
        for i in range(n):
            h = {
                shuffle_case("X-Document-Title"): base64.b64encode(
                    f"Titel {i}".encode()).decode(),
                shuffle_case("Content-Disposition"):
                    f'attachment; filename="doc{i}.pdf"',
                shuffle_case("Last-Modified"): "2023-05-0%dT10:00:00Z" % (i + 1),
                shuffle_case("Content-Type"): "application/pdf",
            }
            headers.append(list(h.items()))
        batch = pa.table(
            {
                "url": pa.array(
                    [f"http://h0.example.org/docs/p{i}" for i in range(n)]),
                "html": pa.array([b""] * n, pa.binary()),
                "text": pa.array([f"Titel {i} body text {i}" for i in range(n)]),
                "content_type": pa.array(["application/pdf"] * n),
                "site_id": pa.array(["h0.example.org"] * n),
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "headers": pa.array(
                    headers, pa.map_(pa.string(), pa.string())),
            }
        )
        assert_engine_paths_agree(corpus_config(), batch)
        # And the cascade actually FIRED off the weird-cased headers:
        from datetime import datetime

        from ftw_crawler_ray.engine import ExtractionEngine

        engine = ExtractionEngine(corpus_config(), crawl_ts=datetime(2024, 1, 1),
                                  keep_input_columns=("url",))
        fast_out = engine(batch)
        titles = fast_out["Title"].to_pylist()
        assert titles == [f"Titel {i}" for i in range(n)]
        created = fast_out["created"].to_pylist()
        assert all(c is not None and c.month == 5 for c in created)
        assert fast_out["portal_type"].to_pylist() == ["File"] * n
