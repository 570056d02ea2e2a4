"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas UDFs over mapInPandas.
The decode libraries (PIL/ffmpeg/torchaudio) are not present in this
environment, so the decode step is a clearly-marked deterministic
stub (`_fake_decode`) / NotImplementedError for real codecs — the
Spark-side plumbing (schema, batching, UDF signature) is real and
tested. The synthetic payload is the utf-8 encoding of the document
text, which keeps the metadata oracle SQL-expressible.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, channels long, "
    "checksum long"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (synthetic: utf-8 of text)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives a fake
    (width, height, channels) from the byte length. A real deployment
    replaces this with PIL/libvips inside the same UDF."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, 3


def real_decode(payload: bytes):
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg, not available in this "
        "environment; use _fake_decode for plumbing tests"
    )


def decode_stage(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract stage (Arrow batches)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "checksum": [
                        zlib.crc32(p) for p in pdf["payload"]
                    ],
                }
            )

    return docs_with_payload.mapInPandas(fn, DECODE_SCHEMA)


def q_mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return decode_stage(with_payload(docs)).drop("checksum")


# checksum (crc32) is not DuckDB-expressible; the oracle covers the
# rest of the decode metadata exactly.
SQL_MM_DECODE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       (octet_length(encode(text)) % 640) + 1 AS width,
       (octet_length(encode(text)) % 480) + 1 AS height,
       CAST(3 AS BIGINT) AS channels
FROM documents"""


QUERIES = {"mm_decode_stub": q_mm_decode_stub}
ORACLES = {"mm_decode_stub": SQL_MM_DECODE}
