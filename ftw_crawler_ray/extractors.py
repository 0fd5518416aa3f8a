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
        # Reference headers are a requests CaseInsensitiveDict
        # (reference extractors.py:199) — lookups must ignore casing.
        header_value = _header_lookup(resource_info.headers, "X-Document-Title")
        if header_value is not None:
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
        # memoized per row: typically evaluated for BOTH the
        # `created` and `modified` fields of the same page
        cache = getattr(resource_info, "cache", None)
        if cache is not None and "lastmod_dt" in cache:
            return cache["lastmod_dt"]
        last_modified = _header_lookup(resource_info.headers, "Last-Modified")
        if "lastmod" in resource_info.url_info:
            value = from_iso_datetime(resource_info.url_info["lastmod"])
        elif last_modified is not None:
            value = from_iso_datetime(last_modified)
        else:
            value = IndexingTimeExtractor().extract_value(resource_info)
        if cache is not None:
            cache["lastmod_dt"] = value
        return value


class FilenameExtractor(HTTPHeaderExtractor):
    """X12 — filename from Content-Disposition (reference :347-360)."""

    def extract_value(self, resource_info):
        disposition = _header_lookup(resource_info.headers, "Content-Disposition")
        if disposition is not None:
            filename = parse_content_disposition_filename(disposition)
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
        header_value = _header_lookup(resource_info.headers, self.header_name)
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


# ---------------------------------------------------------------------------
# Vectorized batch path (SURVEY.md §2.9: plugins may implement
# ``extract_batch(ctx) -> list``; all built-ins do). ``ctx`` is the
# per-batch context dict built by the engine: column lists plus memo
# slots ("titles", "plain_norm") shared across extractors. The
# convention: a list entry of None means "no value extracted" — the
# engine applies required-default / optional-null per field exactly
# like the row path.
# ---------------------------------------------------------------------------


def _headers_at(ctx, i) -> dict:
    headers = ctx["headers"]
    return headers[i] if headers is not None and headers[i] else {}


def _header_lookup(headers: dict, name: str):
    if not headers:
        return None
    if name in headers:
        return headers[name]
    lname = name.lower()
    for k, v in headers.items():
        if k.lower() == lname:
            return v
    return None


def _metadata_at(ctx, i) -> dict:
    metadata = ctx["metadata"]
    return metadata[i] if metadata is not None and metadata[i] else {}


def _plain_norm(ctx):
    if "plain_norm" not in ctx:
        texts = ctx["texts"]
        ctx["plain_norm"] = [
            normalize_whitespace(t) if t is not None else "" for t in texts
        ]
    return ctx["plain_norm"]


def _patch(cls):
    def deco(fn):
        setattr(cls, "extract_batch", fn)
        return fn

    return deco


@_patch(PlainTextExtractor)
def _plain_text_batch(self, ctx):
    return list(_plain_norm(ctx))


@_patch(UIDExtractor)
def _uid_batch(self, ctx):
    return [uid_for_url(u) if u is not None else None for u in ctx["urls"]]


@_patch(SlugExtractor)
def _slug_batch(self, ctx):
    from .functions.urlnorm import slugs_for_urls

    return slugs_for_urls(ctx["urls"])


@_patch(URLExtractor)
def _url_batch(self, ctx):
    return list(ctx["urls"])


@_patch(TargetURLExtractor)
def _target_batch(self, ctx):
    targets = ctx["targets"]
    urls = ctx["urls"]
    if targets is None:
        return list(urls)
    return [t if t is not None else u for t, u in zip(targets, urls)]


@_patch(XPathExtractor)
def _xpath_batch(self, ctx):
    from .functions.markup import first_node_text, sniff_encoding

    out = []
    htmls = ctx["htmls"]
    ctypes = ctx["content_types"]
    for i in range(ctx["n"]):
        body = htmls[i] if htmls is not None else None
        if body is None or ctypes[i] not in MARKUP_TYPES:
            out.append(None)
            continue
        if isinstance(body, str):
            body = body.encode("utf-8")
        out.append(first_node_text(body, self.xpath, sniff_encoding(body)))
    return out


@_patch(TitleExtractor)
def _title_batch(self, ctx):
    import base64 as _b64

    if "titles" in ctx:
        return ctx["titles"]
    h1 = XPathExtractor("//div[@id='content']/h1").extract_batch(ctx)
    titles = []
    for i in range(ctx["n"]):
        headers = _headers_at(ctx, i)
        value = None
        xdoc = _header_lookup(headers, "X-Document-Title")
        if xdoc is not None:
            value = _b64.b64decode(xdoc).decode("utf-8").strip()
        elif h1[i] is not None:
            value = h1[i]
        else:
            value = _metadata_at(ctx, i).get("title")
            if value is None:
                cd = _header_lookup(headers, "content-disposition")
                if cd is not None:
                    value = parse_content_disposition_filename(cd)
                if value is None:
                    value = (
                        slug_from_url(ctx["urls"][i])
                        if ctx["urls"][i] is not None
                        else None
                    )
        titles.append(normalize_whitespace(value) if value is not None else None)
    ctx["titles"] = titles
    return titles


@_patch(SnippetTextExtractor)
def _snippet_batch(self, ctx):
    titles = TitleExtractor().extract_batch(ctx)
    plains = _plain_norm(ctx)
    out = []
    for plain, title in zip(plains, titles):
        snippet = plain.strip()
        if title is not None:
            title = title.strip()
            if title and snippet.startswith(title):
                snippet = snippet.lstrip(title)
        out.append(snippet)
    return out


@_patch(DescriptionExtractor)
def _description_batch(self, ctx):
    return [_metadata_at(ctx, i).get("description") for i in range(ctx["n"])]


@_patch(CreatorExtractor)
def _creator_batch(self, ctx):
    return [_metadata_at(ctx, i).get("creator") for i in range(ctx["n"])]


@_patch(KeywordsExtractor)
def _keywords_batch(self, ctx):
    out = []
    for i in range(ctx["n"]):
        value = _metadata_at(ctx, i).get("keywords")
        out.append(split_keywords(value) if value is not None else None)
    return out


@_patch(LastModifiedExtractor)
def _lastmod_batch(self, ctx):
    crawl_ts = ctx["crawl_ts"]
    lastmods = ctx["lastmods"]
    headers = ctx["headers"]
    out = []
    for i in range(ctx["n"]):
        lm = lastmods[i] if lastmods is not None else None
        if lm is not None:
            out.append(from_iso_datetime(lm))
            continue
        hlm = _header_lookup(_headers_at(ctx, i), "last-modified") if headers else None
        if hlm is not None:
            out.append(from_iso_datetime(hlm))
        else:
            out.append(crawl_ts if crawl_ts is not None else
                       __import__("datetime").datetime.now(
                           __import__("datetime").timezone.utc))
    return out


@_patch(FilenameExtractor)
def _filename_batch(self, ctx):
    out = []
    for i in range(ctx["n"]):
        cd = _header_lookup(_headers_at(ctx, i), "content-disposition")
        out.append(
            parse_content_disposition_filename(cd) if cd is not None else None
        )
    return out


@_patch(ConstantExtractor)
def _constant_batch(self, ctx):
    value = self.value
    if isinstance(value, (bytes, str)):
        value = safe_unicode(value)
    if self.field is not None and self.field.multivalued:
        value = [safe_unicode(v) for v in self.value]
    return [value] * ctx["n"]


@_patch(IndexingTimeExtractor)
def _indexing_time_batch(self, ctx):
    if ctx["crawl_ts"] is not None:
        return [ctx["crawl_ts"]] * ctx["n"]
    now = datetime.now(timezone.utc)
    return [now] * ctx["n"]


@_patch(SiteAttributeExtractor)
def _site_attr_batch(self, ctx):
    out = []
    for site in ctx["sites"]:
        value = site.attributes.get(self.key) if site is not None else None
        out.append(safe_unicode(value) if value is not None else None)
    return out


@_patch(HeaderMappingExtractor)
def _header_mapping_batch(self, ctx):
    default = safe_unicode(self.default) if self.default is not None else None
    is_ct = self.header_name.lower() == "content-type"
    if ctx["headers"] is None and is_ct:
        # no headers column (corpus path): the value depends only on
        # the content_type string — memoize per distinct value
        memo: dict = {}
        out = []
        for ct in ctx["content_types"]:
            if ct in memo:
                out.append(memo[ct])
                continue
            hv = get_content_type(ct)
            v = (safe_unicode(self.mapping[hv]) if hv in self.mapping
                 else default)
            memo[ct] = v
            out.append(v)
        return out
    out = []
    for i in range(ctx["n"]):
        hv = _header_lookup(_headers_at(ctx, i), self.header_name)
        if hv is None and is_ct:
            # the Content-Type header is synthesized from the
            # content_type column (fetcher.py:75 derives one from the
            # other) — same consistency rule as the row path
            hv = ctx["content_types"][i]
        if hv is None:
            out.append(default)
            continue
        if is_ct:
            hv = get_content_type(hv)
        out.append(safe_unicode(self.mapping[hv]) if hv in self.mapping else default)
    return out


@_patch(FieldMappingExtractor)
def _field_mapping_batch(self, ctx):
    mapped_field = self.field.config.get_field(self.field_name)
    vals = mapped_field.extractor.extract_batch(ctx)
    default = safe_unicode(self.default) if self.default is not None else None
    return [
        (safe_unicode(self.mapping[v]) if v in self.mapping else default)
        if v is not None
        else default
        for v in vals
    ]
