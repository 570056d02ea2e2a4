"""WARC ingestion: framing, type filtering, gzip, loud failures."""

from __future__ import annotations

import gzip

import pytest

from remediner_spark.sources.warc import (
    encode_warc_bytes,
    parse_warc,
    response_rows,
    synth_url,
)


def test_roundtrip_and_type_filtering():
    """doc_id 30 hits every residue: warcinfo + request + response in
    one gzip'd file; only the response surfaces, bytes exact."""
    text = "hello <b>world</b> page"
    payload = encode_warc_bytes(30, text)
    assert payload[:2] == b"\x1f\x8b"  # 30 % 2 == 0 -> gzip'd
    recs = parse_warc(payload)
    assert [r["fields"]["warc-type"] for r in recs] == [
        "warcinfo", "request", "response"
    ]
    rows = response_rows(payload)
    assert len(rows) == 1
    url, ts, status, clen, html = rows[0]
    assert url == synth_url(30)
    assert (ts.year, ts.minute, ts.second) == (2024, 0, 30)
    assert status == 200
    assert html == text.encode() and clen == len(html)

    # uncompressed file without the optional records
    rows = response_rows(encode_warc_bytes(1, "x"))
    assert len(rows) == 1 and rows[0][4] == b"x"


def test_header_names_case_insensitive():
    http = b"HTTP/1.1 301 Moved\r\nLocation: /b\r\n\r\nredirect-body"
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"WARC-TARGET-URI: https://ex.com/a\r\n"
        b"Warc-Date: 2024-02-03T04:05:06Z\r\n"
        + f"CONTENT-LENGTH: {len(http)}\r\n".encode()
        + b"\r\n" + http + b"\r\n\r\n"
    )
    rows = response_rows(raw)
    assert len(rows) == 1
    url, ts, status, clen, html = rows[0]
    assert url == "https://ex.com/a"
    assert status == 301
    assert html == b"redirect-body"
    assert (ts.month, ts.hour) == (2, 4)


def test_framing_violations_are_loud():
    good = encode_warc_bytes(1, "abc")  # uncompressed

    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOPE/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="unsupported version"):
        parse_warc(good.replace(b"WARC/1.0", b"WARC/9.9", 1))
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        )
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-12])  # cut into the response body
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n")
    with pytest.raises(ValueError, match="malformed header"):
        parse_warc(
            b"WARC/1.0\r\nNoColonHere\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        )
    # response record without a target URI
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 20\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nx"
    )
    with pytest.raises(ValueError, match="URI"):
        response_rows(bad + b"\r\n\r\n")


def test_multi_member_gzip_stream():
    """The standard .warc.gz layout: one gzip MEMBER per record,
    concatenated — decompression must span members."""
    a = encode_warc_bytes(1, "first")  # odd ids -> uncompressed parts
    b = encode_warc_bytes(3, "second")
    stream = gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0)
    rows = response_rows(stream)
    assert [r[4] for r in rows] == [b"first", b"second"]


def test_warc_ingest_stage_spark(spark):
    from pyspark.sql import functions as F

    from remediner_spark.sources.warc import (
        warc_ingest_stage,
        with_warc_payload,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    rows = warc_ingest_stage(with_warc_payload(docs))
    # one response row per document; html bytes == source text bytes
    joined = rows.join(docs, "doc_id").select(
        "doc_id",
        (F.col("html") == F.encode("text", "UTF-8")).alias("eq"),
        "http_status",
    )
    got = joined.toPandas()
    assert len(got) == 500
    assert got["eq"].all()
    assert (got["http_status"] == 200).all()


def test_warc_corruption_never_escapes():
    """Truncations and random byte corruption of a WARC stream either
    parse (WARC has no checksums, so content flips can be silently
    valid) or raise ValueError — never an untyped exception or hang."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from remediner_spark.sources.warc import parse_warc, response_rows

    plain = encode_warc_bytes(3, "some page body text")  # uncompressed
    gz = encode_warc_bytes(4, "another page")  # gzip'd

    @settings(max_examples=150, deadline=None)
    @given(st.data())
    def run(data):
        payload = data.draw(st.sampled_from([plain, gz]))
        mode = data.draw(st.sampled_from(["cut", "flip"]))
        bad = bytearray(payload)
        if mode == "cut":
            bad = bad[: data.draw(st.integers(0, len(bad) - 1))]
        else:
            i = data.draw(st.integers(0, len(bad) - 1))
            bad[i] ^= 1 << data.draw(st.integers(0, 7))
        try:
            recs = parse_warc(bytes(bad))
            assert len(recs) <= 3
            response_rows(bytes(bad))
        except ValueError:
            pass  # the only acceptable failure type

    run()
