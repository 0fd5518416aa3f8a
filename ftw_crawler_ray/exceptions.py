"""Exception surface mirroring the reference's semantics.

Reference: /root/reference/ftw/crawler/exceptions.py. Same names so a
user of the reference can switch; raised by kernels / stages rather
than a sequential loop.
"""


class CrawlerError(Exception):
    """Base class for all engine errors."""


class NoValueExtracted(CrawlerError):
    """An extractor could not produce a value for a row.

    In the batch engine this is never propagated: it marks a null cell
    (optional field) or triggers the type's default (required field) —
    reference extractors.py:132-140 semantics, applied per column.
    """


class ExtractionError(CrawlerError):
    """Wrong extractor type or type-assertion failure (reference
    extractors.py:97-113)."""


class NoSitemapFound(CrawlerError):
    """Sitemap discovery failed for a site (reference sitemap.py:174)."""


class FetchingError(CrawlerError):
    """Non-200, non-429 fetch result (reference fetcher.py:68-70)."""


class AttemptedRedirect(FetchingError):
    """Redirects are refused — canonical URL would be ambiguous
    (reference fetcher.py:54-58)."""


class NotModified(CrawlerError):
    """Incrementality short-circuit (reference fetcher.py:49-51)."""


class NoSuchField(CrawlerError):
    """Config.get_field miss (reference configuration.py:52-56)."""


class SiteNotFound(CrawlerError):
    """Config.get_site miss (reference configuration.py:58-62)."""
