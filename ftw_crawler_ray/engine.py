"""ExtractionEngine — the flagship ``map_batches`` stage (E0).

The reference engine (extractors.py:79-143) runs per *record*: Tika
twice, then every configured Field's extractor, with required-default
/ optional-skip / type-assert semantics. Here the same semantics run
per *Arrow batch*: one callable class instance per map_batches actor
or task, one pass over the batch building all output columns.

Engine semantics replicated exactly (and pinned by tests):
- unknown extractor base type → ExtractionError (reference :97-102)
- NoValueExtracted + required → type default: epoch for datetime,
  ``type_()`` otherwise (reference :115-122)
- NoValueExtracted + optional → **null cell** (the Arrow rendering of
  the reference's key-omission, :137-140; the Solr sink drops nulls)
- extracted value type-asserted against ``Field.type_`` (:104-113)

Usage::

    engine = ExtractionEngine(config, crawl_ts=...)
    out = pages.map_batches(engine, batch_format="pyarrow",
                            batch_size=512, concurrency=8)
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

from .config import Config
from .exceptions import ExtractionError, NoValueExtracted
from .extractors import EXTRACTOR_TYPES
from .functions.dates import utc_naive
from .functions.markup import parse_html, text_content
from .functions.metadata import canonicalize_metadata
from .functions.textutils import safe_unicode
from .resource import ResourceInfo


class PassthroughConverter:
    """Default converter for the Parquet pages corpus: the table
    already carries reference-semantics plain text (`text` column) and
    optionally a metadata map — the byte-identical invariant is
    checked against exactly that text. Mirrors the reference's
    pluggable ``converter=`` seam (extractors.py:87-95) without the
    Tika JVM round-trips."""

    def extract_metadata(self, resource_info):
        return resource_info.metadata or {}

    def extract_text(self, resource_info):
        return resource_info.text or ""


class HtmlConverter(PassthroughConverter):
    """Converter that computes text + metadata from the HTML body
    itself (for corpora without a pre-extracted text column):
    ``<title>`` / ``<meta name= content=>`` → metadata; body text
    content → text. Our in-process stand-in for Tika's /meta and
    /tika endpoints (reference tika.py:23-59)."""

    def extract_metadata(self, resource_info):
        meta = dict(resource_info.metadata or {})
        body = resource_info.body
        if body:
            root = _parsed(resource_info)
            for el in root.iter("meta"):
                name = el.get("name") or el.get("property")
                if name and el.get("content") is not None:
                    meta.setdefault(name, el.get("content"))
            title_el = next(iter(root.iter("title")), None)
            if title_el is not None:
                meta.setdefault("title", text_content(title_el))
        return meta

    def extract_text(self, resource_info):
        if resource_info.text:
            return resource_info.text
        if not resource_info.body:
            return ""
        root = _parsed(resource_info)
        body_el = next(iter(root.iter("body")), root)
        return text_content(body_el)


def _parsed(resource_info):
    cache = resource_info.cache
    if "parsed_root" not in cache:
        body = resource_info.body
        if isinstance(body, str):
            body = body.encode("utf-8")
        cache["parsed_root"] = parse_html(body)
    return cache["parsed_root"]


def arrow_type_for(field) -> pa.DataType:
    """Arrow output type for a Field declaration (SURVEY.md §1.6)."""
    if issubclass(field.type_, datetime):
        base = pa.timestamp("us")
    elif issubclass(field.type_, bool):
        base = pa.bool_()
    elif issubclass(field.type_, int):
        base = pa.int64()
    elif issubclass(field.type_, float):
        base = pa.float64()
    else:
        base = pa.string()
    return pa.list_(base) if field.multivalued else base


def output_schema(config: Config) -> pa.Schema:
    return pa.schema([(f.name, arrow_type_for(f)) for f in config.fields])


def _field_default(field):
    """Required-field default (reference extractors.py:115-122)."""
    if issubclass(field.type_, datetime):
        return datetime(1970, 1, 1)
    return field.type_()


def _assert_proper_type(field, value, extractor):
    if field.multivalued:
        valid = isinstance(value, list) and all(
            isinstance(v, field.type_) for v in value
        )
    else:
        valid = isinstance(value, field.type_)
    if not valid:
        raise ExtractionError(
            "Invalid return value type '{}' for extractor {} and field {}. "
            "Return value was: {}".format(
                type(value).__name__, extractor, field, repr(value)
            )
        )


def _to_arrow_value(field, value):
    """Normalize datetimes to naive-UTC for Arrow timestamp[us]."""
    if value is None:
        return None
    if issubclass(field.type_, datetime):
        if field.multivalued:
            return [utc_naive(v) for v in value]
        return utc_naive(value)
    return value


class ExtractionEngine:
    """Callable-class batch transform: pages/resource batch in →
    configured output columns out. Construction is once per actor
    (pattern: ``map_batches(ExtractionEngine(config), ...)`` ships a
    pickled instance; heavy init like regex compilation lives in the
    kernels' module import, so per-task overhead is negligible)."""

    # Input columns consumed if present; everything else passes through
    # untouched when keep_input=True.
    URL_INFO_KEYS = ("loc", "lastmod", "changefreq", "priority", "target")

    def __init__(self, config: Config, converter=None, crawl_ts=None,
                 keep_input_columns=(), sites_by_id=None, strict=True):
        self.config = config
        self.converter = converter if converter is not None else PassthroughConverter()
        self.crawl_ts = crawl_ts
        self.keep_input_columns = tuple(keep_input_columns)
        self.sites_by_id = sites_by_id or {}
        self.strict = strict
        self._site_prefixes = sorted(
            ((s.url, s) for s in config.sites), key=lambda t: -len(t[0])
        )
        for field in config.fields:
            if not isinstance(field.extractor, EXTRACTOR_TYPES):
                cls = field.extractor.__class__
                raise ExtractionError(
                    "Unknown extractor type for '{}' - must inherit from at "
                    "least one of {}. (Current base classes: {})".format(
                        cls, EXTRACTOR_TYPES, cls.__bases__
                    )
                )
        self._schema = output_schema(config)
        # Vectorized batch path: available when every extractor ships
        # extract_batch (all built-ins do; SURVEY.md §2.9 lets plugins
        # opt in) and the converter is the passthrough one. strict=False
        # needs per-row quarantine → row path.
        self._vectorized = (
            strict
            and type(self.converter) is PassthroughConverter
            and all(hasattr(f.extractor, "extract_batch") for f in config.fields)
        )

    # -- row-view construction ------------------------------------------------
    def _site_for(self, row):
        site_id = row.get("site_id")
        if site_id is not None and site_id in self.sites_by_id:
            return self.sites_by_id[site_id]
        url = row.get("url") or row.get("loc")
        if url:
            for prefix, site in self._site_prefixes:
                if url.startswith(prefix):
                    return site
        return None

    def _row_view(self, row) -> ResourceInfo:
        url_info = {}
        loc = row.get("url") or row.get("loc")
        if loc is not None:
            url_info["loc"] = loc
        for key in self.URL_INFO_KEYS[1:]:
            val = row.get(key)
            if val is not None:
                url_info[key] = val

        headers = row.get("headers")
        if isinstance(headers, list):  # Arrow map<k,v> → list of tuples
            headers = dict(headers)
        headers = dict(headers or {})
        # The reference derives content_type FROM the response headers
        # (fetcher.py:75); our corpus carries it as a column — keep the
        # two views consistent for HTTPHeaderExtractors.
        content_type = row.get("content_type", "text/html")
        if content_type is not None and not any(
            k.lower() == "content-type" for k in headers
        ):
            headers["Content-Type"] = content_type
        metadata = row.get("metadata")
        if isinstance(metadata, list):
            metadata = dict(metadata)

        last_indexed = row.get("last_indexed")

        return ResourceInfo(
            url_info=url_info,
            content_type=content_type,
            site=self._site_for(row),
            last_indexed=last_indexed,
            headers=headers or {},
            metadata=metadata,
            text=row.get("text"),
            body=row.get("html") or row.get("body"),
            crawl_ts=self.crawl_ts,
        )

    # -- engine semantics per row --------------------------------------------
    def _extract_row(self, resource_info: ResourceInfo) -> dict:
        # Converter first, exactly like the reference engine __init__
        # (extractors.py:91-95): metadata then text.
        resource_info.metadata = canonicalize_metadata(
            self.converter.extract_metadata(resource_info)
        )
        resource_info.text = safe_unicode(self.converter.extract_text(resource_info))

        values = {}
        for field in self.config.fields:
            try:
                value = field.extractor.extract_value(resource_info)
            except NoValueExtracted:
                if field.required:
                    value = _field_default(field)
                else:
                    values[field.name] = None
                    continue
            _assert_proper_type(field, value, field.extractor)
            values[field.name] = _to_arrow_value(field, value)
        return values

    # -- vectorized batch path ----------------------------------------------
    def _sites_for_ids(self, site_ids: list, urls: list) -> list:
        """Site per row, resolved once per distinct site_id."""
        cache: dict = {}
        out = []
        for sid, url in zip(site_ids, urls):
            key = sid if sid is not None else url
            if key not in cache:
                site = None
                if sid is not None and sid in self.sites_by_id:
                    site = self.sites_by_id[sid]
                elif url:
                    for prefix, s in self._site_prefixes:
                        if url.startswith(prefix):
                            site = s
                            break
                cache[key] = site
            out.append(cache[key])
        return out

    def _batch_ctx(self, batch: pa.Table) -> dict:
        from .functions.metadata import canonicalize_metadata

        names = batch.column_names
        n = batch.num_rows

        def col(name):
            return batch[name].to_pylist() if name in names else None

        urls = col("url") or col("loc") or [None] * n
        content_types = col("content_type") or ["text/html"] * n
        headers = col("headers")
        if headers is not None:
            headers = [dict(h) if isinstance(h, list) else (h or {}) for h in headers]
        metadata = col("metadata")
        if metadata is not None:
            metadata = [
                canonicalize_metadata(dict(m) if isinstance(m, list) else m)
                if m
                else None
                for m in metadata
            ]
        site_ids = col("site_id") or [None] * n
        return {
            "n": n,
            "urls": urls,
            "lastmods": col("lastmod"),
            "targets": col("target"),
            "texts": col("text") or [None] * n,
            "htmls": col("html") or col("body"),
            "content_types": content_types,
            "headers": headers,
            "metadata": metadata,
            "sites": self._sites_for_ids(site_ids, urls),
            "crawl_ts": self.crawl_ts,
        }

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        ctx = self._batch_ctx(batch)
        arrays, names = [], []
        for name in self.keep_input_columns:
            if name in batch.column_names:
                arrays.append(batch[name])
                names.append(name)
        for field in self.config.fields:
            values = field.extractor.extract_batch(ctx)
            is_dt = issubclass(field.type_, datetime)
            default = _field_default(field) if field.required else None
            # hot loop: hoist the per-field invariants; the datetime
            # UTC-normalization and the multivalued isinstance sweep
            # only run for fields that need them (same ExtractionError
            # semantics as _assert_proper_type, reference :115-122)
            ftype, multi, extractor = field.type_, field.multivalued, field.extractor
            out = []
            if multi:
                for v in values:
                    if v is None:
                        out.append(default)
                        continue
                    if not (isinstance(v, list)
                            and all(isinstance(x, ftype) for x in v)):
                        _assert_proper_type(field, v, extractor)
                    out.append([utc_naive(x) for x in v] if is_dt else v)
            elif is_dt:
                # one-slot identity cache: constant-datetime columns
                # (IndexingTimeExtractor emits the same crawl_ts
                # object n times) convert once, not once per row
                last_in = last_out = None
                for v in values:
                    if v is None:
                        out.append(default)
                        continue
                    if v is last_in:
                        out.append(last_out)
                        continue
                    if not isinstance(v, ftype):
                        _assert_proper_type(field, v, extractor)
                    last_in, last_out = v, utc_naive(v)
                    out.append(last_out)
            else:
                for v in values:
                    if v is None:
                        out.append(default)
                        continue
                    if not isinstance(v, ftype):
                        _assert_proper_type(field, v, extractor)
                    out.append(v)
            arrays.append(pa.array(out, type=arrow_type_for(field)))
            names.append(field.name)
        return pa.table(dict(zip(names, arrays)))

    # -- the batch transform --------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._vectorized:
            return self._call_vectorized(batch)
        rows = batch.to_pylist()
        columns = {f.name: [] for f in self.config.fields}
        error_col = []
        for row in rows:
            try:
                values = self._extract_row(self._row_view(row))
                for f in self.config.fields:
                    columns[f.name].append(values[f.name])
                error_col.append(None)
            except Exception as exc:  # noqa: BLE001 - quarantine, never kill a block
                if self.strict:
                    raise
                for f in self.config.fields:
                    columns[f.name].append(None)
                error_col.append(f"{type(exc).__name__}: {exc}")

        arrays, names = [], []
        for name in self.keep_input_columns:
            if name in batch.column_names:
                arrays.append(batch[name])
                names.append(name)
        for f in self.config.fields:
            arrays.append(pa.array(columns[f.name], type=arrow_type_for(f)))
            names.append(f.name)
        if not self.strict:
            arrays.append(pa.array(error_col, type=pa.string()))
            names.append("_error")
        return pa.table(dict(zip(names, arrays)))
