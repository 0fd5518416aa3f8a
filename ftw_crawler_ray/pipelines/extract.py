"""Flagship extract pipeline (SURVEY.md §7.0 minimum slice):

    resources (pages ⊎ url_info props) → ExtractionEngine map_batches
    → 20-column output Dataset

The 20-field schema replicates the reference's canonical config
(tests/assets/basic_config.py:62-115) over the synthetic corpus.
``crawl_ts`` is pinned (2021-01-01 UTC) so IndexingTime-derived
columns are deterministic and oracle-checkable (SURVEY.md §7.4.2).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import ray.data

from ..config import Config, Field, Site
from ..engine import ExtractionEngine
from ..extractors import (
    ConstantExtractor,
    CreatorExtractor,
    DescriptionExtractor,
    FieldMappingExtractor,
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
)
from ..sources.pages import NUM_HOSTS, frontier_batch, pages_batch, _documents

CRAWL_TS = datetime(2021, 1, 1, tzinfo=timezone.utc)

PORTAL_TYPE_MAPPING = {"text/html": "ContentPage", "application/pdf": "File"}
OBJECT_TYPE_MAPPING = {"ContentPage": "CONTENT_PAGE", "File": "FILE"}


def corpus_sites() -> list[Site]:
    return [
        Site(
            f"http://h{n}.example.org/",
            attributes={"site_area": f"h{n}.example.org"},
            crawler_site_id=f"h{n}.example.org",
        )
        for n in range(NUM_HOSTS)
    ]


def corpus_config() -> Config:
    """The canonical 20-field output schema over the synthetic corpus
    — field-for-field analog of reference basic_config.py:62-115
    (site_area is single-valued here: one area per host)."""
    return Config(
        sites=corpus_sites(),
        unique_field="UID",
        url_field="path_string",
        last_modified_field="modified",
        fields=[
            Field("allowedRolesAndUsers",
                  extractor=ConstantExtractor(["Anonymous"]), multivalued=True),
            Field("created", extractor=LastModifiedExtractor(), type_=datetime),
            Field("Creator", extractor=CreatorExtractor()),
            Field("Description", extractor=DescriptionExtractor()),
            Field("effective", extractor=IndexingTimeExtractor(), type_=datetime),
            Field("expires",
                  extractor=ConstantExtractor(datetime(2050, 12, 31)),
                  type_=datetime),
            Field("getId", extractor=SlugExtractor()),
            Field("getRemoteUrl", extractor=TargetURLExtractor()),
            Field("modified", extractor=LastModifiedExtractor(), type_=datetime),
            Field("object_type",
                  extractor=FieldMappingExtractor(
                      "portal_type", OBJECT_TYPE_MAPPING, default="File")),
            Field("path_string", extractor=URLExtractor()),
            Field("portal_type",
                  extractor=HeaderMappingExtractor(
                      "content-type", PORTAL_TYPE_MAPPING, default="File")),
            Field("SearchableText", extractor=PlainTextExtractor()),
            Field("showinsearch", extractor=ConstantExtractor(True), type_=bool),
            Field("site_area", extractor=SiteAttributeExtractor("site_area")),
            Field("snippetText", extractor=SnippetTextExtractor()),
            Field("Subject", extractor=KeywordsExtractor(), multivalued=True),
            Field("Title", extractor=TitleExtractor()),
            Field("topics", extractor=KeywordsExtractor(), multivalued=True),
            Field("UID", extractor=UIDExtractor(), required=True),
        ],
    )


def resource_batch(batch: pa.Table) -> pa.Table:
    """documents batch → fetched-resource batch: page body + sitemap
    url_info props in one row (the S5 fetch-stage output shape,
    SURVEY.md §1.6) — derived columns, no join needed for the
    synthetic corpus."""
    pages = pages_batch(batch)
    frontier = frontier_batch(batch)
    return pages.append_column("lastmod", frontier["lastmod"]).append_column(
        "target", frontier["target"]
    ).append_column("seq", frontier["seq"])


def read_resources(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    return _documents(sf_dir, replicate).map_batches(
        resource_batch, batch_format="pyarrow", batch_size=None
    )


def extract_pipeline(sf_dir: str, *, config: Config | None = None,
                     keep: tuple = ("url",), strict: bool = True,
                     batch_size=None, replicate: int = 1,
                     concurrency=None) -> ray.data.Dataset:
    """resources → engine map_batches → output Dataset (streaming).

    Stateless-task stage by default (the engine has no per-actor
    state beyond cheap construction); ``concurrency`` can pin an
    actor pool instead when the converter is expensive.
    """
    engine = ExtractionEngine(
        config or corpus_config(),
        crawl_ts=CRAWL_TS,
        keep_input_columns=keep,
        strict=strict,
    )
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return read_resources(sf_dir, replicate).map_batches(
        engine, batch_format="pyarrow", batch_size=batch_size, **kwargs
    )
