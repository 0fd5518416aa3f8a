"""Extractor plugin surface — X1..X18 from SURVEY.md §2.3.

Same class names / semantics as the reference (extractors.py:24-469),
re-built for Python 3 on the stdlib kernels in ``functions/``. Each
extractor implements ``extract_value(resource_info)`` and raises
``NoValueExtracted`` for absent values; the batch engine
(``engine.py``) applies them column-wise inside ``map_batches``.

Determinism note: ``IndexingTimeExtractor`` is ``utcnow()`` in the
reference (extractors.py:393-396). Here it prefers the pipeline's
``crawl_ts`` parameter when set so runs are reproducible (SURVEY.md
§7.4.2), falling back to wall clock only when unset.
"""

from __future__ import annotations

import base64
from datetime import datetime, timezone

from .exceptions import NoValueExtracted
from .functions.dates import from_iso_datetime
from .functions.markup import MARKUP_TYPES, first_node_text, sniff_encoding
from .functions.textutils import (
    get_content_type,
    normalize_whitespace,
    parse_content_disposition_filename,
    safe_unicode,
    split_keywords,
)
from .functions.urlnorm import slug_from_url, uid_for_url


class Extractor:
    """Base class for all extractors (reference extractors.py:24-37)."""

    field = None

    def extract_value(self, resource_info):
        raise NotImplementedError

    def bind(self, field):
        self.field = field

    def __repr__(self):
        cls = self.__class__
        return "<{}>".format(".".join((cls.__module__, cls.__name__)))


# Type-tag base classes (reference extractors.py:40-76). They declare
# which part of the row an extractor reads — the engine uses them for
# input-column projection pruning (only read `html` when a
# TextFromMarkupExtractor is configured, etc.).
class MetadataExtractor(Extractor):
    """Reads canonicalized document metadata."""


class TextExtractor(Extractor):
    """Reads converted plain text."""


class TextFromMarkupExtractor(Extractor):
    """Reads the raw markup body."""


class URLInfoExtractor(Extractor):
    """Reads the sitemap url_info record."""


class HTTPHeaderExtractor(Extractor):
    """Reads the HTTP response headers."""


class ResourceIndependentExtractor(Extractor):
    """Needs nothing from the resource."""


class SiteConfigExtractor(Extractor):
    """Reads the Site configuration object."""


EXTRACTOR_TYPES = (
    MetadataExtractor,
    TextExtractor,
    URLInfoExtractor,
    ResourceIndependentExtractor,
    SiteConfigExtractor,
    HTTPHeaderExtractor,
    TextFromMarkupExtractor,
)


class PlainTextExtractor(TextExtractor):
    """X1 — whitespace-normalized plain text (reference :146-149)."""

    def extract_value(self, resource_info):
        return normalize_whitespace(resource_info.text)


class UIDExtractor(URLInfoExtractor):
    """X2 — md5-UUID of the url (reference :152-158)."""

    def extract_value(self, resource_info):
        return uid_for_url(resource_info.url_info["loc"])


class SlugExtractor(URLInfoExtractor):
    """X3 — slug of the url basename (reference :161-177)."""

    def extract_value(self, resource_info):
        return slug_from_url(resource_info.url_info.get("loc"))


class URLExtractor(URLInfoExtractor):
    """X4 — the url itself (reference :180-184)."""

    def extract_value(self, resource_info):
        return safe_unicode(resource_info.url_info.get("loc"))


class TargetURLExtractor(URLInfoExtractor):
    """X5 — sitemap ``target`` when present, else the url
    (reference :187-193)."""

    def extract_value(self, resource_info):
        if "target" in resource_info.url_info:
            return safe_unicode(resource_info.url_info["target"])
        return URLExtractor().extract_value(resource_info)


class XPathExtractor(TextFromMarkupExtractor, URLInfoExtractor):
    """X7 — first matching node's text content from the markup body.

    Only applies to MARKUP_TYPES content types, else NoValueExtracted
    (reference :254-256); encoding sniffed utf-8→latin1 (:236-242);
    multiple matches → first (:266-272). XPath grammar is the
    ElementTree subset (functions/markup.py) — covers the reference
    configs' expressions.
    """

    def __init__(self, xpath):
        self.xpath = xpath

    def extract_value(self, resource_info):
        if resource_info.content_type not in MARKUP_TYPES:
            raise NoValueExtracted
        body = resource_info.body
        if body is None:
            raise NoValueExtracted
        if isinstance(body, str):
            body = body.encode("utf-8")
        # Memoize per row: the Title cascade is evaluated both for the
        # Title field and inside SnippetText — parse the body once.
        cache = getattr(resource_info, "cache", None)
        key = ("xpath", self.xpath)
        if cache is not None and key in cache:
            text = cache[key]
        else:
            text = first_node_text(body, self.xpath, sniff_encoding(body))
            if cache is not None:
                cache[key] = text
        if text is None:
            raise NoValueExtracted
        return text


class TitleExtractor(MetadataExtractor, HTTPHeaderExtractor, URLInfoExtractor):
    """X6 — title cascade (reference :196-228): X-Document-Title
    header (base64) → ``//div[@id='content']/h1`` → metadata title →
    Content-Disposition filename → url slug; whitespace-normalized."""

    def _extract_title(self, resource_info):
        if "X-Document-Title" in resource_info.headers:
            header_value = resource_info.headers["X-Document-Title"]
            return base64.b64decode(header_value).decode("utf-8").strip()

        try:
            return XPathExtractor("//div[@id='content']/h1").extract_value(
                resource_info
            )
        except NoValueExtracted:
            pass

        value = (resource_info.metadata or {}).get("title")
        if value is None:
            try:
                value = FilenameExtractor().extract_value(resource_info)
            except NoValueExtracted:
                value = SlugExtractor().extract_value(resource_info)
        return value

    def extract_value(self, resource_info):
        cache = getattr(resource_info, "cache", None)
        if cache is not None and "title" in cache:
            return cache["title"]
        value = normalize_whitespace(self._extract_title(resource_info))
        if cache is not None:
            cache["title"] = value
        return value


class DescriptionExtractor(MetadataExtractor):
    """X8 (reference :288-294)."""

    def extract_value(self, resource_info):
        value = (resource_info.metadata or {}).get("description")
        if value is None:
            raise NoValueExtracted
        return safe_unicode(value)


class CreatorExtractor(MetadataExtractor):
    """X9 (reference :297-303)."""

    def extract_value(self, resource_info):
        value = (resource_info.metadata or {}).get("creator")
        if value is None:
            raise NoValueExtracted
        return safe_unicode(value)


class SnippetTextExtractor(TextExtractor, MetadataExtractor, HTTPHeaderExtractor):
    """X10 — plain text minus leading title, using Python's char-set
    ``lstrip`` exactly as the reference does (:306-327; golden cases
    test_extractors.py:375-430)."""

    def extract_value(self, resource_info):
        plain_text = normalize_whitespace(resource_info.text).strip()
        title = TitleExtractor().extract_value(resource_info).strip()
        snippet_text = plain_text
        if title is not None and snippet_text.startswith(title):
            snippet_text = snippet_text.lstrip(title)
        return safe_unicode(snippet_text)


class LastModifiedExtractor(URLInfoExtractor, HTTPHeaderExtractor):
    """X11 — lastmod cascade: sitemap lastmod → Last-Modified header →
    indexing time (reference :330-344)."""

    def extract_value(self, resource_info):
        if "lastmod" in resource_info.url_info:
            return from_iso_datetime(resource_info.url_info["lastmod"])
        if "last-modified" in resource_info.headers:
            return from_iso_datetime(resource_info.headers["last-modified"])
        return IndexingTimeExtractor().extract_value(resource_info)


class FilenameExtractor(HTTPHeaderExtractor):
    """X12 — filename from Content-Disposition (reference :347-360)."""

    def extract_value(self, resource_info):
        if "content-disposition" in resource_info.headers:
            filename = parse_content_disposition_filename(
                resource_info.headers["content-disposition"]
            )
            if filename is not None:
                return filename
        raise NoValueExtracted


class KeywordsExtractor(MetadataExtractor):
    """X13 — comma-or-whitespace separated keywords (reference
    :363-373)."""

    def extract_value(self, resource_info):
        value = (resource_info.metadata or {}).get("keywords")
        if value is None:
            raise NoValueExtracted
        return split_keywords(value)


class ConstantExtractor(ResourceIndependentExtractor):
    """X14 — literal value (reference :376-390)."""

    def __init__(self, value):
        self.value = value

    def extract_value(self, resource_info):
        value = self.value
        if isinstance(value, (bytes, str)):
            value = safe_unicode(value)
        if self.field is not None and self.field.multivalued:
            value = [safe_unicode(v) for v in self.value]
        return value


class IndexingTimeExtractor(ResourceIndependentExtractor):
    """X15 — crawl timestamp; pipeline-parameterized for determinism
    (reference :393-396 uses utcnow())."""

    def extract_value(self, resource_info):
        if resource_info.crawl_ts is not None:
            return resource_info.crawl_ts
        return datetime.now(timezone.utc)


class SiteAttributeExtractor(SiteConfigExtractor):
    """X16 — per-site attribute broadcast (reference :399-413)."""

    def __init__(self, key):
        self.key = key

    def extract_value(self, resource_info):
        if resource_info.site is None:
            raise NoValueExtracted
        value = resource_info.site.attributes.get(self.key)
        if value is None:
            raise NoValueExtracted
        return safe_unicode(value)


class HeaderMappingExtractor(HTTPHeaderExtractor):
    """X17 — header value → mapping lookup → default-or-raise
    (reference :416-442); content-type stripped of charset first."""

    def __init__(self, header_name, mapping, default=None):
        self.header_name = header_name
        self.mapping = mapping
        self.default = default

    def _default_or_raise(self):
        if self.default is not None:
            return safe_unicode(self.default)
        raise NoValueExtracted

    def extract_value(self, resource_info):
        header_value = resource_info.headers.get(self.header_name)
        if header_value is None:
            return self._default_or_raise()
        if self.header_name.lower() == "content-type":
            header_value = get_content_type(header_value)
        if header_value in self.mapping:
            return safe_unicode(self.mapping[header_value])
        return self._default_or_raise()


class FieldMappingExtractor(HTTPHeaderExtractor):
    """X18 — another field's value → mapping lookup → default-or-raise
    (reference :445-469); a column-from-column expression, not a
    join."""

    def __init__(self, field_name, mapping, default=None):
        self.field_name = field_name
        self.mapping = mapping
        self.default = default

    def _default_or_raise(self):
        if self.default is not None:
            return safe_unicode(self.default)
        raise NoValueExtracted

    def extract_value(self, resource_info):
        mapped_field = self.field.config.get_field(self.field_name)
        field_value = mapped_field.extractor.extract_value(resource_info)
        if field_value is None:
            return self._default_or_raise()
        if field_value in self.mapping:
            return safe_unicode(self.mapping[field_value])
        return self._default_or_raise()
