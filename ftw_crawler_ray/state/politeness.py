"""Per-host politeness with the reference's backoff parity.

Reference semantics (fetcher.py:60-66; configuration.py:67): base
``sleeptime`` 0.1 s between requests to a host; on a 429 the crawler
sleeps then retries, and doubles ``sleeptime`` only when the retry
itself returns 429 again — the doubled value persists for the rest
of the site's crawl and is NEVER reset (SURVEY.md §7.4.4). Here that is a per-host virtual-time token
bucket: the scheduler assigns each fetch a planned offset on the
host's timeline instead of blocking a thread, so politeness costs no
worker time and the budget is reproducible (same input → same
schedule) and checkpointable.
"""

from __future__ import annotations

import json


class HostBudget:
    """One host's politeness state (virtual clock, seconds)."""

    __slots__ = ("sleeptime", "next_time")

    def __init__(self, sleeptime: float = 0.1, next_time: float = 0.0):
        self.sleeptime = sleeptime
        self.next_time = next_time

    def schedule_fetch(self, n_429: int = 0) -> float:
        """Reserve the next slot on this host's timeline; returns the
        planned start offset. ``n_429`` consecutive 429 responses add
        one sleep each at the *current* sleeptime; sleeptime doubles
        only when the retry itself 429s again (i.e. after all but the
        last 429) — exactly the reference's loop, which checks the
        NEW response's status before doubling. k consecutive 429s end
        with sleeptime·2^(k-1), not 2^k."""
        t = self.next_time
        for i in range(n_429):
            t += self.sleeptime
            if i < n_429 - 1:
                self.sleeptime *= 2
        self.next_time = t + self.sleeptime
        return t


class PolitenessState:
    """host → HostBudget map, JSON-serializable for checkpoints.

    ``overrides`` carries per-host configured sleeptimes (the
    reference's per-``Site`` sleeptime, configuration.py:67) — config,
    not state: it is NOT serialized, and a host already present in a
    loaded checkpoint keeps its persisted (possibly 429-doubled)
    sleeptime."""

    def __init__(self, default_sleeptime: float = 0.1,
                 overrides: dict[str, float] | None = None):
        self.default_sleeptime = default_sleeptime
        self.overrides = overrides or {}
        self.hosts: dict[str, HostBudget] = {}

    def budget(self, host: str) -> HostBudget:
        if host not in self.hosts:
            self.hosts[host] = HostBudget(
                self.overrides.get(host, self.default_sleeptime)
            )
        return self.hosts[host]

    def to_bytes(self) -> bytes:
        payload = {
            "default": self.default_sleeptime,
            "hosts": {
                h: [b.sleeptime, b.next_time] for h, b in sorted(self.hosts.items())
            },
        }
        return json.dumps(payload, sort_keys=True).encode("utf-8")

    @classmethod
    def from_bytes(cls, data: bytes) -> "PolitenessState":
        payload = json.loads(data.decode("utf-8"))
        obj = cls(payload["default"])
        for h, (sleeptime, next_time) in payload["hosts"].items():
            obj.hosts[h] = HostBudget(sleeptime, next_time)
        return obj
