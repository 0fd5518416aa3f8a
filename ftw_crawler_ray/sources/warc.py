"""WARC source — read web-archive files (ISO 28500, the Common
Crawl interchange format) into the engine's resource-row contract.

Parsing is stdlib-only (no warcio in this container): a streaming
record walker over the WARC structure —

    WARC/1.X CRLF
    <warc-headers> CRLF CRLF
    <Content-Length payload bytes> CRLF CRLF

``response`` records carry a full HTTP response as payload (status
line + headers + body); we surface status, content-type and body.
Multi-member gzip (.warc.gz — one gzip member per record, the Common
Crawl layout) decompresses transparently via zlib's multi-stream
loop.

Scale shape: ``read_warc`` maps one Ray task per WARC file
(``read_binary_files`` → flat parse), the standard granularity —
Common Crawl ships ~1 GiB files by the tens of thousands, so file
count IS the parallelism. Rows come out in the SAME schema the fetch
actors emit, so ``warc_to_docs`` is just read → ExtractOrQuarantine.
"""

from __future__ import annotations

import io
import zlib

import pyarrow as pa
import ray.data

from ..functions.textutils import get_content_type
from ..functions.urlnorm import host_of

CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-member gzip → concatenated plaintext (CC-style
    one-member-per-record files); plain input passes through."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(data: bytes):
    """Yield (warc_headers: dict, payload: bytes) per record."""
    stream = io.BytesIO(_gunzip_members(data))
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (CRLF, b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (CRLF, b"\n", b""):
                break
            if b":" in hline:
                k, v = hline.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        yield headers, payload


def parse_http_response(payload: bytes):
    """HTTP response payload → (status: int, headers: dict, body)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
    lines = head.split(b"\r\n") if b"\r\n" in head else head.split(b"\n")
    status = 0
    if lines and lines[0].startswith(b"HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    headers: dict[str, str] = {}
    for hline in lines[1:]:
        if b":" in hline:
            k, v = hline.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
    return status, headers, body


_WARC_ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lastmod", pa.string()),
        ("shard", pa.int32()),
        ("seq", pa.int64()),
        ("fetch_order", pa.int64()),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("content_type", pa.string()),
        ("site_id", pa.string()),
        ("doc_id", pa.int64()),
        ("fetch_status", pa.string()),
    ]
)


def warc_records_to_rows(data: bytes) -> pa.Table:
    """One WARC file's bytes → resource rows (fetch-actor schema).
    Non-response records are skipped; non-200 responses come out
    quarantined as fetch_status='fetch_error'."""
    rows = {name: [] for name in _WARC_ROW_SCHEMA.names}
    seq = 0
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        status, http_headers, body = parse_http_response(payload)
        ok = status == 200
        rows["url"].append(url)
        rows["lastmod"].append(headers.get("warc-date"))
        rows["shard"].append(0)
        rows["seq"].append(seq)
        rows["fetch_order"].append(seq)
        rows["html"].append(body if ok else None)
        rows["text"].append(None)
        rows["content_type"].append(
            get_content_type(http_headers.get("content-type")) if ok else None
        )
        rows["site_id"].append(host_of(url))
        rows["doc_id"].append(-1)
        rows["fetch_status"].append("fetched" if ok else "fetch_error")
        seq += 1
    return pa.table(rows, schema=_WARC_ROW_SCHEMA)


def read_warc(paths) -> ray.data.Dataset:
    """WARC file(s) → streaming Dataset of resource rows; one parse
    task per file."""
    files = ray.data.read_binary_files(paths)
    return files.map_batches(
        lambda t: pa.concat_tables(
            [warc_records_to_rows(b) for b in t["bytes"].to_pylist()]
        ) if t.num_rows else _WARC_ROW_SCHEMA.empty_table(),
        batch_format="pyarrow",
        batch_size=None,
    )


def warc_to_docs(paths, config=None, converter=None) -> ray.data.Dataset:
    """WARC → extracted documents: the offline twin of the live
    crawl's fetch→extract tail (same quarantine semantics)."""
    from ..engine import ExtractionEngine, HtmlConverter
    from ..pipelines.crawl import ExtractOrQuarantine
    from ..pipelines.extract import corpus_config

    engine = ExtractionEngine(
        config if config is not None else corpus_config(),
        converter=converter if converter is not None else HtmlConverter(),
        crawl_ts=None,
        keep_input_columns=("url", "shard", "seq", "fetch_status"),
        strict=True,
    )
    return read_warc(paths).map_batches(
        ExtractOrQuarantine(engine), batch_format="pyarrow", batch_size=None
    )


def synthesize_warc(records, gzip_members: bool = False) -> bytes:
    """Valid WARC bytes for tests/demos: ``records`` is a list of
    (url, status, content_type, body) tuples."""
    import gzip as _gzip

    out = []
    for url, status, ctype, body in records:
        http = (
            f"HTTP/1.1 {status} X\r\ncontent-type: {ctype}\r\n"
            f"content-length: {len(body)}\r\n\r\n"
        ).encode() + body
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + CRLF + http + CRLF + CRLF
        )
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
