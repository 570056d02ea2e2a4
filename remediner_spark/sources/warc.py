"""WARC (Web ARChive) ingestion: the Common Crawl container format.

Parses uncompressed (or gzip'd) WARC 1.0/1.1 byte streams into
response-record rows (url, warc_ts, http_status, content_length,
html) with a pure-python record walker run as mapInPandas over a
binary payload column — the same two-hop shape as the multimodal
decoders (payload stage -> parse stage). Record framing follows the
public ISO 28500 / IIPC warc-specifications: a header block
terminated by CRLFCRLF, exactly Content-Length octets of block, two
CRLFs between records; header field names are case-insensitive.

At 100 TB this is the INGEST EDGE of the pipeline: WARC segments land
as binary files, `spark.read.format("binaryFile")` (or the table
format's binary column) fans them across executors, and this stage
explodes each segment into page rows map-side — no shuffle until the
first content operator. Malformed framing raises loudly (truncated
body, missing Content-Length, bad version line): a crawler segment
that silently drops records poisons every downstream count.

The driver tables carry no WARC column, so the gate entry synthesizes
a deterministic WARC file per document (warcinfo + request records
interleaved on doc_id residues, half the files gzip'd; the response
body carries the document text as an HTTP/1.1 200 response) and the
DuckDB oracle recomputes every output column in closed form.

The reference repo has no WARC support — this belongs to the
web-scale ingestion surface the north rule adds (Common-Crawl-style
pages over Iceberg tables).
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"
_WARC_VERSIONS = ("WARC/1.0", "WARC/1.1")


def parse_warc(payload: bytes) -> list[dict]:
    """All records of one WARC stream as [{"fields": {lower-name:
    value}, "body": bytes}]. gzip streams (including the standard
    member-per-record .warc.gz layout — gzip.decompress concatenates
    members) are inflated first. Loud on any framing violation."""
    if payload[:2] == _GZIP_MAGIC:
        try:
            payload = gzip.decompress(payload)
        except (gzip.BadGzipFile, EOFError, zlib.error) as exc:
            raise ValueError(f"warc: corrupt gzip stream ({exc})") from exc
    records: list[dict] = []
    pos, n = 0, len(payload)
    while pos < n:
        while payload[pos:pos + 2] == b"\r\n":  # inter-record CRLFs
            pos += 2
        if pos >= n:
            break
        if not payload.startswith(b"WARC/", pos):
            raise ValueError(f"warc: expected version line at offset {pos}")
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("warc: unterminated header block")
        lines = payload[pos:hdr_end].decode("utf-8").split("\r\n")
        if lines[0] not in _WARC_VERSIONS:
            raise ValueError(f"warc: unsupported version {lines[0]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" not in ln:
                raise ValueError(f"warc: malformed header line {ln!r}")
            k, v = ln.split(":", 1)
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError("warc: record missing Content-Length")
        clen = int(fields["content-length"])
        body_start = hdr_end + 4
        body = payload[body_start:body_start + clen]
        if len(body) != clen:
            raise ValueError(
                f"warc: truncated record body ({len(body)} of {clen} octets)"
            )
        records.append({"fields": fields, "body": body})
        pos = body_start + clen
    return records


def _parse_http_response(block: bytes) -> tuple[int, bytes]:
    """(status code, body bytes) of an HTTP response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("warc: http block without header terminator")
    status_line = block[:sep].decode("iso-8859-1").split("\r\n")[0]
    parts = status_line.split(" ")
    if not parts[0].startswith("HTTP/") or len(parts) < 2:
        raise ValueError(f"warc: bad http status line {status_line!r}")
    return int(parts[1]), block[sep + 4:]


def response_rows(payload: bytes) -> list[tuple]:
    """(url, warc_ts, http_status, content_length, html) per RESPONSE
    record; warcinfo/request/metadata records are skipped (that is the
    WARC contract — a segment interleaves them)."""
    out = []
    for rec in parse_warc(payload):
        f = rec["fields"]
        if f.get("warc-type") != "response":
            continue
        if "warc-target-uri" not in f or "warc-date" not in f:
            raise ValueError("warc: response record missing URI/date")
        status, html = _parse_http_response(rec["body"])
        ts = datetime.fromisoformat(
            f["warc-date"].replace("Z", "+00:00")
        ).replace(tzinfo=None)
        out.append((f["warc-target-uri"], ts, status, len(html), html))
    return out


WARC_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, http_status long, "
    "content_length long, html binary"
)


def warc_ingest_stage(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas explode: one input row (doc_id, payload binary) ->
    one output row per response record. Map-side; Arrow-batched."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for url, ts, status, clen, html in response_rows(
                    bytes(payload)
                ):
                    rows.append(
                        (int(doc_id), url, ts, status, clen, html)
                    )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "url", "warc_ts", "http_status",
                         "content_length", "html"],
            )
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return docs_with_payload.mapInPandas(fn, WARC_SCHEMA)


# ------------------------------------------------------------- gate

_WARC_EPOCH = datetime(2024, 1, 1)


def synth_url(doc_id: int) -> str:
    return f"https://warc.example{doc_id % 5}.com/page/{doc_id}"


def encode_warc_bytes(doc_id: int, text: str) -> bytes:
    """One deterministic WARC file per document: optionally a warcinfo
    record (doc_id%5==0) and a request record (doc_id%3==0) before the
    response record, so parsing exercises type filtering; half the
    files (doc_id%2==0) are gzip'd. The response body is the document
    text as an HTTP/1.1 200 response."""
    url = synth_url(doc_id)
    date = (_WARC_EPOCH + timedelta(seconds=doc_id)).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    body = text.encode()
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body

    def record(wtype: str, content: bytes, extra: tuple = ()) -> bytes:
        hdrs = [
            "WARC/1.0",
            f"WARC-Type: {wtype}",
            f"WARC-Date: {date}",
            f"WARC-Record-ID: <urn:uuid:{doc_id:032x}>",
            *extra,
            f"Content-Length: {len(content)}",
        ]
        return "\r\n".join(hdrs).encode() + b"\r\n\r\n" + content + b"\r\n\r\n"

    out = b""
    if doc_id % 5 == 0:
        out += record("warcinfo", b"software: synthcrawler/1.0\r\n")
    if doc_id % 3 == 0:
        req = f"GET /page/{doc_id} HTTP/1.1\r\nHost: h\r\n\r\n".encode()
        out += record("request", req, (f"WARC-Target-URI: {url}",))
    out += record(
        "response",
        http,
        (
            f"WARC-Target-URI: {url}",
            "Content-Type: application/http; msgtype=response",
        ),
    )
    if doc_id % 2 == 0:
        return gzip.compress(out, mtime=0)
    return out


def with_warc_payload(docs: DataFrame) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_warc_bytes(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        fn, "doc_id long, payload binary"
    )


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize -> parse -> page rows; html binary projected away
    for the gate (its length is checked as content_length; byte
    equality with the source text is pinned by tests/test_warc.py)."""
    # parallelism floor (sources/scan.py): the synthesize+parse chain
    # is two Python stages whose work would otherwise run in ONE
    # worker over the single-row-group input file
    from .scan import scan_parquet

    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return warc_ingest_stage(with_warc_payload(docs)).select(
        "doc_id", "url", "warc_ts", "http_status", "content_length"
    )


SQL_WARC_INGEST = """
SELECT doc_id,
       'https://warc.example' || CAST(doc_id % 5 AS VARCHAR)
         || '.com/page/' || CAST(doc_id AS VARCHAR) AS url,
       TIMESTAMP '2024-01-01 00:00:00'
         + doc_id * INTERVAL 1 SECOND AS warc_ts,
       CAST(200 AS BIGINT) AS http_status,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length
FROM documents"""


QUERIES = {"warc_ingest": q_warc_ingest}
ORACLES = {"warc_ingest": SQL_WARC_INGEST}
