"""Per-shard robots.txt cache (north_rule T5 — absent in the
reference, which never fetches robots).

Rules are parsed with stdlib ``urllib.robotparser`` from robots.txt
*text supplied to the cache* (in the sandbox corpus, robots bodies
are deterministic per host; in production the fetch actor fills the
cache). Serialized for checkpoints as {host: robots_txt}.
"""

from __future__ import annotations

import json
import urllib.robotparser
from urllib.parse import urlsplit


class RobotsCache:
    def __init__(self, user_agent: str = "ftw-crawler-ray"):
        self.user_agent = user_agent
        self._raw: dict[str, str] = {}
        self._parsed: dict[str, urllib.robotparser.RobotFileParser] = {}

    def put(self, host: str, robots_txt: str) -> None:
        self._raw[host] = robots_txt
        self._parsed.pop(host, None)

    def _parser(self, host: str):
        if host not in self._parsed:
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(self._raw.get(host, "").splitlines())
            self._parsed[host] = rp
        return self._parsed[host]

    def allowed(self, url: str) -> bool:
        """True when no rules are cached for the host (crawl-friendly
        default, matching the reference's no-robots behavior) or the
        cached rules allow the url's path."""
        host = urlsplit(url).netloc.lower().split(":")[0]
        if host.startswith("www."):
            host = host[4:]
        if host not in self._raw:
            return True
        return self._parser(host).can_fetch(self.user_agent, url)

    def to_bytes(self) -> bytes:
        return json.dumps(self._raw, sort_keys=True).encode("utf-8")

    @classmethod
    def from_bytes(cls, data: bytes, user_agent: str = "ftw-crawler-ray"):
        obj = cls(user_agent)
        obj._raw = json.loads(data.decode("utf-8"))
        return obj
