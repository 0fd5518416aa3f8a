"""SlackLogger — the reference's error-notification channel (S13,
reference slack.py:15-59), rebuilt on the public Slack Web API via
``requests`` instead of the ``slacker`` package (long unmaintained).

Same surface: ``SlackLogger(token)``, ``logError(ex, site, channel)``
posting the reference's exact attachment payload (danger color,
Site / Exception Type / Error Message fields) with ``link_names=1``
as the authed user. ``api_base`` is injectable so tests run against
a loopback server; the default is Slack's public endpoint.

This complements — not replaces — the engine's primary error
surface: the per-row ``_error`` quarantine column and lineage
metrics (SURVEY.md §8 S13 note). Use this when a human channel
should hear about per-site failures, exactly like the reference's
``--slacktoken``/``--slackchannel`` flags.
"""

from __future__ import annotations

import json


class SlackLogger:
    def __init__(self, slacktoken: str,
                 api_base: str = "https://slack.com/api",
                 timeout: float = 10.0):
        import requests

        self.api_base = api_base.rstrip("/")
        self.timeout = timeout
        self.session = requests.Session()
        self.session.headers["Authorization"] = f"Bearer {slacktoken}"

    # -- reference surface --------------------------------------------------
    def logError(self, ex: BaseException, site, channel: str) -> None:
        text = "Error while crawling external site indexes!"
        attdata = self.generateAttdata(ex, site)
        channel = self.checkChannel(channel)
        self.send(text, attdata, channel)

    def checkChannel(self, channel: str) -> str:
        if not channel.startswith("#"):
            channel = "#" + channel
        return channel

    def generateAttdata(self, ex: BaseException, site) -> str:
        # py3: ex.message is gone — str(ex) carries the message
        return json.dumps(
            [
                {
                    "color": "danger",
                    "fields": [
                        {"title": "Site", "value": site.url},
                        {"title": "Exception Type", "value": type(ex).__name__},
                        {"title": "Error Message", "value": str(ex)},
                    ],
                }
            ]
        )

    # -- transport ----------------------------------------------------------
    def _post(self, method: str, payload: dict) -> dict:
        resp = self.session.post(
            f"{self.api_base}/{method}", json=payload, timeout=self.timeout
        )
        return resp.json()

    def send(self, text: str, attdata: str, channel: str) -> None:
        username = self._post("auth.test", {}).get("user")
        self._post(
            "chat.postMessage",
            {
                "channel": channel,
                "text": text,
                "as_user": username,
                "link_names": 1,
                "attachments": attdata,
            },
        )
