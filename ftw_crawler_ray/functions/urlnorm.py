"""URL kernels — md5-UUID uid, slug, canonicalization, host hashing.

uid/slug semantics pinned against reference extractors.py:152-177 and
the golden values in test_extractors.py:515-598. Canonical-host
hashing is new (north_rule): it is the frontier shard / shuffle key
and must be stable across processes and languages (md5-based, NOT
Python ``hash()`` which is salted per process) and reproducible in
DuckDB SQL for the oracle.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from urllib.parse import unquote_plus, urlsplit

from .textutils import safe_unicode

_NON_SLUG = re.compile(r"[^a-z0-9]+")


def uid_for_url(url: str) -> str:
    """``UUID(bytes=md5(url))`` as string — the reference's document
    UID (extractors.py:152-158). Golden: 'http://example.org' →
    'dab521de-65f9-250b-4cca-7383feef67dc'.

    Formatted from the hexdigest directly: ``str(UUID(bytes=d))`` is
    exactly the 32 hex digits dash-grouped 8-4-4-4-12 (no variant-bit
    munging for the bytes= constructor), and skipping the UUID object
    halves the kernel's cost (it runs once per page)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def slugify(value: str) -> str:
    """ASCII slug: NFKD-fold diacritics, lowercase, non-alnum runs →
    single '-', trimmed.

    Reimplements the behavior the reference gets from python-slugify
    (extractors.py:163-168): 'bärengraben' → 'barengraben',
    'foo bar' → 'foo-bar' (test_extractors.py:544-598).
    """
    value = unicodedata.normalize("NFKD", value)
    value = value.encode("ascii", "ignore").decode("ascii").lower()
    return _NON_SLUG.sub("-", value).strip("-")


def slug_from_url(url: str) -> str:
    """Last path segment (rstrip '/', '' → 'index-html'),
    percent-decoded with '+'→space, slugified
    (reference extractors.py:161-177)."""
    path = urlsplit(url).path.rstrip("/")
    basename = path.split("/")[-1]
    if basename == "":
        basename = "index-html"
    basename = unquote_plus(basename)
    basename = safe_unicode(basename)
    return slugify(basename)


def slugs_for_urls(urls) -> list:
    """Vectorized ``slug_from_url`` over a batch of urls (list or
    Arrow string array); None in → None out.

    Arrow RE2/string kernels handle the plain-ASCII common case; any
    url that is non-ASCII, contains ``% + ? #`` or whitespace (the
    characters that engage percent/plus decoding, query/fragment
    splitting, or urlsplit's control-char stripping), or lacks an
    explicit ``scheme://`` falls back to the scalar function —
    output is byte-identical to ``[slug_from_url(u) for u in urls]``
    (pinned by tests/test_kernels.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = urls
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    simple = pc.and_(
        pc.string_is_ascii(arr),
        # brackets included: urlsplit RAISES on malformed IPv6
        # netlocs, and the fallback must raise identically
        pc.invert(pc.match_substring_regex(arr, r"[%+?#\s\[\]]")),
    )
    ex = pc.extract_regex(arr, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(?P<p>.*)$")
    path = pc.struct_field(ex, "p")
    fast = pc.fill_null(pc.and_(simple, pc.is_valid(path)), False)
    base = pc.replace_substring_regex(pc.utf8_rtrim(path, "/"), r"^.*/", "")
    base = pc.if_else(pc.equal(base, ""), "index-html", base)
    slug = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(base), r"[^a-z0-9]+", "-"),
        "-",
    )
    slugs = slug.to_pylist()
    mask = fast.to_pylist()
    return [
        s if f else (slug_from_url(u) if u is not None else None)
        for s, f, u in zip(slugs, mask, arr.to_pylist())
    ]


def canonical_url(url: str) -> str:
    """Dedup / purge-membership key: the reference compares URLs
    case-insensitively (sitemap.py:200-204), so canonical form is
    ``url.lower()``. Kept as its own function so a stricter
    canonicalizer (scheme default ports, sorted query) can slot in."""
    return url.lower()


def host_of(url: str) -> str:
    """Lower-cased netloc sans port and leading 'www.' — the
    politeness / frontier-ownership unit."""
    netloc = urlsplit(url).netloc.lower()
    host = netloc.rsplit("@", 1)[-1].split(":")[0]
    if host.startswith("www."):
        host = host[4:]
    return host


def host_hash(host: str) -> int:
    """Stable unsigned-63-bit hash of a canonical host string.

    First 8 bytes (big-endian) of md5, masked to 63 bits so the value
    fits Arrow int64 ≥ 0. Process-stable (unlike ``hash()``) and
    expressible in DuckDB for the oracle:
    ``(('x' || substr(md5(host),1,16))::BIT(64)::BIGINT & (2**63-1))``
    — in practice the oracle uses the hex form directly.
    """
    digest = hashlib.md5(host.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def shard_of(host: str, num_shards: int) -> int:
    """Frontier shard owning ``host`` = host_hash % num_shards; one
    host maps to exactly one shard (politeness + URL-seen locality)."""
    return host_hash(host) % num_shards
