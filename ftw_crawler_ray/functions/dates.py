"""Datetime kernels — UTC normalization, ISO-8601 and HTTP dates.

Semantics pinned against reference utils.py:14-54 and
test_utils.py:58-98 (ISO round-trips, RFC1123/RFC850/asctime).
Python 3 stdlib timezone replaces pytz; dateutil parses (it is the
reference's parser too, so accepted input grammar matches).
"""

from __future__ import annotations

import calendar
from datetime import datetime, timezone
from email.utils import formatdate

import dateutil.parser

EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def to_utc(dt: datetime) -> datetime:
    """Naive → assume UTC; aware → convert to UTC
    (reference utils.py:14-23)."""
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def to_iso_datetime(dt: datetime) -> str:
    """TZ-aware ISO-8601 string in UTC, ``%Y-%m-%dT%H:%M:%S.%fZ``
    (reference utils.py:26-30)."""
    return to_utc(dt).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def from_iso_datetime(datestring: str) -> datetime:
    """Parse ISO-8601 (date-only '2014-12-31' and offset forms
    included) → aware UTC datetime (reference utils.py:33-37).

    C-level ``fromisoformat`` fast path (this runs twice per page in
    the extract hot loop); dateutil fallback keeps the reference's
    permissive grammar for non-ISO strings."""
    try:
        dt = datetime.fromisoformat(datestring)
    except ValueError:
        dt = dateutil.parser.parse(datestring)
    return to_utc(dt)


def to_http_datetime(dt: datetime) -> str:
    """RFC 2616 HTTP datetime in GMT; uses timegm (UTC), never mktime
    (local) — reference utils.py:40-46."""
    timestamp = calendar.timegm(to_utc(dt).timetuple())
    return formatdate(timestamp, usegmt=True)


def from_http_datetime(datestring: str) -> datetime:
    """Parse RFC1123 / RFC850 / asctime HTTP dates → aware UTC
    (reference utils.py:49-54; grammar cases test_utils.py:82-98)."""
    return to_utc(dateutil.parser.parse(datestring))


def utc_naive(dt: datetime) -> datetime:
    """Aware-or-naive → naive UTC (Arrow/DuckDB timestamps are
    UTC-naive; keep one convention across the engine)."""
    return to_utc(dt).replace(tzinfo=None)
