"""String / whitespace / content-type / gzip kernels.

Semantics pinned against reference utils.py (normalize_whitespace
:98-105, get_content_type :57-66, is_gzipped :69-78, gunzip :81-85,
safe_unicode :118-121) and its tests (test_utils.py:101-116).
"""

from __future__ import annotations

import gzip
import io


def safe_unicode(value):
    """bytes → utf-8 str; everything else passes through.

    Python-3 rendering of reference utils.py:118-121 (py2 str.decode).
    """
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).decode("utf-8")
    return value


def normalize_whitespace(s) -> str:
    """Collapse any whitespace run to one space and strip the ends.

    Exactly ``' '.join(s.split())`` — the reference's definition
    (utils.py:98-105); ``str.split()`` splits on the full Unicode
    whitespace set, which differs from an ASCII ``\\s+`` regex on e.g.
    NBSP — so we keep the split/join formulation for byte-identical
    output (test_utils.py:101-116).
    """
    s = safe_unicode(s)
    return " ".join(s.split())


def lstrip_charset(text: str, prefix: str) -> str:
    """The snippet kernel: Python ``str.lstrip(prefix)`` **char-set**
    strip, applied only when ``text.startswith(prefix)``.

    This reproduces SnippetTextExtractor (reference extractors.py:
    319-327) char-for-char, including the counter-intuitive char-set
    semantics ('Bärengraben' − title 'Bären' → 'graben',
    test_extractors.py:398-430). Callers must pass whitespace-
    normalized, stripped inputs, as the reference does.
    """
    if prefix and text.startswith(prefix):
        return text.lstrip(prefix)
    return text


def get_content_type(header_value):
    """MIME type sans ``; charset=...`` suffix; None-safe
    (reference utils.py:57-66)."""
    if header_value is not None:
        return header_value.split(";")[0]
    return None


def is_gzipped(content_type, url_path: str) -> bool:
    """Gzip detection from Content-Type / url path only — NOT
    Content-Encoding (handled transparently by HTTP clients);
    reference utils.py:69-78."""
    return get_content_type(content_type) == "application/x-gzip" or url_path.endswith(
        ".gz"
    )


def gunzip(bytestring: bytes) -> bytes:
    """Decompress a gzipped bytestring (reference utils.py:81-85)."""
    with gzip.GzipFile(mode="rb", fileobj=io.BytesIO(bytestring)) as f:
        return f.read()


def split_keywords(value: str) -> list[str]:
    """Keyword tokenization: split on ',' when one is present, else on
    whitespace; strip each token (reference extractors.py:363-373,
    golden cases test_extractors.py:485-510)."""
    if "," in value:
        keywords = value.split(",")
    else:
        keywords = value.split()
    return [safe_unicode(kw.strip()) for kw in keywords]


def parse_content_disposition_filename(header_value: str):
    """``filename=`` value from a Content-Disposition header, quotes
    stripped, utf-8/replace decoded; ``None`` when absent (reference
    extractors.py:347-360)."""
    items = [i.strip() for i in header_value.split(";")]
    for item in items:
        if item.lower().startswith("filename"):
            _key, value = [token.strip() for token in item.split("=")]
            filename = value.replace('"', "")
            if isinstance(filename, bytes):  # pragma: no cover - py3 str path
                filename = filename.decode("utf-8", errors="replace")
            return filename
    return None


class CaseInsensitiveDict(dict):
    """Minimal case-insensitive string-keyed mapping.

    The reference relies on ``requests``' CaseInsensitiveDict for HTTP
    headers (extractors.py:339-340,351-352); header maps coming out of
    Arrow are plain dicts, so lookups go through this wrapper.
    """

    def __init__(self, data=None):
        super().__init__()
        self._lower = {}
        for k, v in (data or {}).items():
            self[k] = v

    def __setitem__(self, key, value):
        self._lower[key.lower()] = key
        super().__setitem__(key, value)

    def __getitem__(self, key):
        return super().__getitem__(self._lower[key.lower()])

    def __contains__(self, key):
        return key.lower() in self._lower

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default
