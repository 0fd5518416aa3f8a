"""Frontier priority heap (north_rule: lastmod/priority ordering).

Order within a host: priority DESC (sitemap string '1.0' > '0.5',
parsed as float, missing → 0.5 per sitemaps.org default), lastmod
DESC (missing last), seq ASC (sitemap document order — the
reference's total order, main.py:107-113, as the tie-break). The
ordering key is exposed so the DuckDB oracle can reproduce the exact
rank with a window function.
"""

from __future__ import annotations

import heapq
from datetime import datetime

_EPOCH = datetime(1970, 1, 1)


def priority_key(priority: str | None, lastmod: datetime | None, seq: int):
    """Sort key — smaller sorts first (heapq is a min-heap):
    (-priority, lastmod_missing, -lastmod_epoch_us, seq)."""
    p = 0.5 if priority is None else float(priority)
    if lastmod is None:
        missing, ts = 1, 0
    else:
        missing, ts = 0, int((lastmod - _EPOCH).total_seconds() * 1_000_000)
    return (-p, missing, -ts, seq)


class FrontierHeap:
    """Min-heap of (key, payload); pop order == crawl order."""

    def __init__(self):
        self._heap: list = []

    def push(self, priority, lastmod, seq, payload) -> None:
        heapq.heappush(self._heap, (priority_key(priority, lastmod, seq), payload))

    def pop(self):
        return heapq.heappop(self._heap)[1]

    def __len__(self):
        return len(self._heap)

    def drain(self):
        while self._heap:
            yield self.pop()
