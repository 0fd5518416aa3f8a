"""Sinks: partitioned Parquet (primary), Solr-update JSON (parity).

The reference POSTs one JSON document per page with ``commit=true``
(solr.py:35-36,70-72) — a known inefficiency (SURVEY.md §4.2). Here
the primary sink is shard-partitioned Parquet (pipelines/crawl.py);
this module keeps the Solr capability: the exact document JSON the
reference would send (datetime → ISO-8601 via the
ExtendedJSONEncoder rule, utils.py:88-95; optional-missing fields
DROPPED, not null — extractors.py:137-140), batched per block, with
a pluggable transport (no network in-sandbox: payloads land as
files; production passes an HTTP poster).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pyarrow as pa

from .functions.dates import to_iso_datetime

# Lucene special tokens (reference solr.py:16-24)
_SOLR_ESCAPE_CHARS = [
    "\\", "+", "-", "&&", "||", "!", "(", ")", "{", "}", "[", "]", "^",
    '"', "~", "*", "?", ":", "/",
]


def solr_escape(value: str) -> str:
    """Escape Lucene query special tokens (reference solr.py:16-24)."""
    for ch in _SOLR_ESCAPE_CHARS:
        value = value.replace(ch, "\\" + ch)
    return value


class ExtendedJSONEncoder(json.JSONEncoder):
    """JSON with datetime → ISO-8601 UTC (reference utils.py:88-95)."""

    def default(self, obj):
        if isinstance(obj, datetime):
            return to_iso_datetime(obj)
        return super().default(obj)


def batch_to_solr_docs(batch: pa.Table, drop_columns=("shard", "seq",
                                                      "fetch_status")) -> list[dict]:
    """Arrow batch → list of Solr documents: null cells dropped
    (key-omission semantics), datetimes ISO-encoded downstream."""
    docs = []
    for row in batch.to_pylist():
        docs.append(
            {
                k: v
                for k, v in row.items()
                if v is not None and k not in drop_columns
            }
        )
    return docs


class SolrConnector:
    """Request-building parity with the reference connector
    (solr.py:26-83); ``transport(method, url, payload)`` is injected
    — tests capture, production does HTTP."""

    def __init__(self, solr_base: str, transport=None):
        self.solr_base = solr_base.rstrip("/")
        self.transport = transport or (lambda method, url, payload: None)

    @property
    def update_url(self) -> str:
        return f"{self.solr_base}/update?commit=true"

    def index(self, docs) -> None:
        """POST documents (reference solr.py:70-72 — but batched)."""
        if isinstance(docs, dict):
            docs = [docs]
        payload = json.dumps(docs, cls=ExtendedJSONEncoder)
        self.transport("POST", self.update_url, payload)

    def delete(self, uid: str) -> None:
        payload = json.dumps({"delete": {"id": uid}})
        self.transport("POST", self.update_url, payload)

    def search_url(self, query: str, fl=None) -> str:
        url = f"{self.solr_base}/select?q={query}&wt=json"
        if fl:
            url += "&fl=" + ",".join(fl)
        return url


def write_solr_payloads(ds, out_dir: str) -> int:
    """Dataset → one Solr-update JSON payload file per block under
    ``out_dir`` (the sandbox transport). Returns docs written. A
    production run passes SolrConnector with an HTTP transport to the
    same per-block loop."""
    os.makedirs(out_dir, exist_ok=True)
    total = 0

    def write_block(batch: pa.Table) -> pa.Table:
        docs = batch_to_solr_docs(batch)
        if docs:
            uid = docs[0].get("UID", "block")
            path = os.path.join(out_dir, f"update-{uid}.json")
            with open(path, "w") as f:
                json.dump(docs, f, cls=ExtendedJSONEncoder)
        return pa.table({"n": pa.array([len(docs)], pa.int64())})

    counts = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    total = int(counts["n"].sum())
    return total


def requests_transport(timeout: float = 10.0):
    """HTTP transport for SolrConnector: one requests.Session per
    transport (build inside an actor's __init__ — sessions don't
    pickle). Module-level factory so it ships to workers."""
    import requests

    session = requests.Session()

    def transport(method, url, payload):
        return session.request(
            method, url, data=payload,
            headers={"Content-Type": "application/json"}, timeout=timeout,
        )

    return transport


class SolrIndexer:
    """Actor-pool sink stage: one connector (+ HTTP session) per
    actor, one update POST per batch (the reference commits per
    document, solr.py:35-36 + main.py:105 — batching is the Ray
    rendering; commit semantics unchanged because update_url carries
    commit=true)."""

    def __init__(self, solr_url: str, transport_factory=None):
        factory = transport_factory or requests_transport
        self.conn = SolrConnector(solr_url, transport=factory())

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch_to_solr_docs(batch)
        if docs:
            self.conn.index(docs)
        return pa.table({"n": pa.array([len(docs)], pa.int64())})


class SolrPurger:
    """Actor-pool sink stage: delete one uid per tombstone row."""

    def __init__(self, solr_url: str, transport_factory=None):
        factory = transport_factory or requests_transport
        self.conn = SolrConnector(solr_url, transport=factory())

    def __call__(self, batch: pa.Table) -> pa.Table:
        uids = batch["uid"].to_pylist()
        for uid in uids:
            self.conn.delete(uid)
        return pa.table({"n": pa.array([len(uids)], pa.int64())})
