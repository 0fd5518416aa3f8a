"""Example user config — the config-as-python-file surface
(reference tests/assets/basic_config.py:41-120 shape; loaded with
``--config examples/config_example.py`` or
``ftw_crawler_ray.config.load_config``).

A reference user ports their config by changing the import lines:
Site/Field/Config and every extractor keep their names and
signatures.
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
    TitleExtractor,
    UIDExtractor,
    URLExtractor,
)

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
    ],
)
