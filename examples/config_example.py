"""Example user config — the config-as-python-file surface
(loaded with ``--config examples/config_example.py`` or
``ftw_crawler_ray.config.load_config``).

A reference user ports their config by changing the import lines:
Site/Field/Config and every extractor keep their names and
signatures. The 20-field list below is the canonical output schema
the engine replicates (SURVEY.md §1.5) — field names and
extractor pairings are the spec, not a style choice.

Two things this example shows beyond the canonical schema:

- a CUSTOM extractor plugin (``WordCountExtractor``): subclass,
  implement ``extract_value(resource_info)``, use it in a ``Field``
  — identical plugin surface to the reference, and the engine's
  batch path picks it up automatically via the row-API bridge.
- production seams: swap the engine's converter for
  ``DispatchConverter(binary=TikaConverter("http://tika:9998"))`` to
  convert PDFs/office docs, and fetch through
  ``pipelines.fetch_http.HttpFetchActor`` instead of the sandbox
  corpus actor. Neither changes this config file.
"""

from datetime import datetime

from ftw_crawler_ray.config import Config, Field, Site
from ftw_crawler_ray.extractors import (
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
    TextExtractor,
    TitleExtractor,
    UIDExtractor,
    URLExtractor,
)


class WordCountExtractor(TextExtractor):
    """Custom plugin demo: whitespace word count of the converted
    plain text (an extra quality signal a training-data pipeline
    might index alongside the document). Subclassing TextExtractor
    declares WHAT the extractor consumes — the engine type-checks
    extractor bases exactly like the reference does."""

    def extract_value(self, resource_info):
        return len((resource_info.text or "").split())

PORTAL_TYPE_MAPPING = {
    "text/html": "ContentPage",
    "application/pdf": "File",
}

OBJECT_TYPE_MAPPING = {
    "ContentPage": "CONTENT_PAGE",
    "File": "FILE",
}

CONFIG = Config(
    sites=[
        Site(
            "http://h0.example.org/",
            attributes={"site_area": "Example Site"},
            sleeptime=0.1,
            crawler_site_id="h0.example.org",
        ),
        Site(
            "http://h1.example.org/",
            attributes={"site_area": "Second Site"},
            sitemap_urls=["http://h1.example.org/custom_sitemap.xml"],
        ),
    ],
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
        # custom plugin field (not part of the canonical 20 — shows
        # the user-extension surface; see WordCountExtractor above)
        Field("word_count", extractor=WordCountExtractor(), type_=int),
    ],
)
