"""User-facing configuration surface: Config / Site / Field.

Same declaration API as the reference (configuration.py:31-101) so an
existing config file ports by changing the import line; loading uses
importlib instead of the deprecated ``imp`` (configuration.py:7-11).
``type_`` defaults to ``str`` (py3 for the reference's ``unicode``).
"""

from __future__ import annotations

import importlib.util
import os

from .exceptions import NoSuchField, SiteNotFound


class Site:
    """Crawl seed / per-host config (reference configuration.py:65-79).

    ``sleeptime`` is the politeness base delay (default 0.1 s),
    doubled on consecutive 429s and never reset (reference
    fetcher.py:60-66) — the politeness token buckets replicate that.
    """

    def __init__(self, url, attributes=None, sleeptime=0.1, sitemap_urls=None,
                 crawler_site_id=None):
        self.url = url
        self.sleeptime = sleeptime
        self.sitemap_urls = sitemap_urls
        self.crawler_site_id = crawler_site_id
        self.attributes = attributes if attributes is not None else {}
        self.config = None

    def bind(self, config):
        self.config = config


class Field:
    """Output-column declaration (reference configuration.py:82-101)."""

    def __init__(self, name, extractor, type_=str, required=False,
                 multivalued=False):
        self.name = name
        self.extractor = extractor
        self.type_ = type_
        self.required = required
        self.multivalued = multivalued
        self.config = None
        self.extractor.bind(self)

    def bind(self, config):
        self.config = config

    def __repr__(self):
        return (
            f"<Field '{self.name}' type_={self.type_.__name__} "
            f"required={self.required} multivalued={self.multivalued} "
            f"extractor={self.extractor}>"
        )


class Config:
    """Pipeline configuration (reference configuration.py:31-62).

    ``tika``/``solr``/``slack*`` kept for surface parity; the engine's
    converter is pluggable and defaults to the in-process markup
    converter (no JVM in the data path).
    """

    def __init__(self, sites, unique_field, url_field, last_modified_field,
                 fields, tika=None, solr=None, slacktoken=None,
                 slackchannel=None):
        self.sites = sites
        self.unique_field = unique_field
        self.url_field = url_field
        self.last_modified_field = last_modified_field
        self.fields = fields
        self.tika = tika
        self.solr = solr
        self.slacktoken = slacktoken
        self.slackchannel = slackchannel
        for site in self.sites:
            site.bind(self)
        for field in self.fields:
            field.bind(self)

    def get_field(self, field_name):
        for field in self.fields:
            if field.name == field_name:
                return field
        raise NoSuchField(field_name)

    def get_site(self, url):
        for site in self.sites:
            if site.url == url:
                return site
        raise SiteNotFound(f"Couldn't find site {url!r} in config!")


def load_config(path: str) -> Config:
    """Load a config-as-python-file exposing ``CONFIG`` (reference
    get_config, configuration.py:7-28, sans CLI overrides)."""
    path = os.path.abspath(path)
    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module.CONFIG
