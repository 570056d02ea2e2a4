"""Streaming ingest == batch output; incremental files are picked up."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from remediner_spark.operators.ner import extract_triples_stage
from remediner_spark.operators.text import filter_language
from remediner_spark.sources.corpus import generate_pages
from remediner_spark.streaming import stream_triples


@pytest.fixture(scope="module")
def tagger_bc(spark):
    from remediner_spark.plans.pipeline import default_tagger_bc

    return default_tagger_bc(spark)


def _write_pages_split(tmp_path, n_pages=120):
    pages, _ = generate_pages(n_pages)
    d = tmp_path / "pages_stream"
    os.makedirs(d, exist_ok=True)
    # three files arriving "over time"
    for i, chunk in enumerate(
        [pages.iloc[:40], pages.iloc[40:80], pages.iloc[80:]]
    ):
        chunk.to_parquet(d / f"part-{i}.parquet", index=False)
    return str(d), pages


def test_streaming_matches_batch(spark, tmp_path, tagger_bc):
    pages_dir, pages_pdf = _write_pages_split(tmp_path)
    out = str(tmp_path / "triples_stream")
    ckpt = str(tmp_path / "ckpt")

    q = stream_triples(spark, pages_dir, out, ckpt, tagger_bc)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["url", "sent_idx", "subj", "obj"])
        .reset_index(drop=True)
    )
    batch = (
        extract_triples_stage(
            filter_language(spark.read.parquet(pages_dir)), tagger_bc
        )
        .toPandas()
        .sort_values(["url", "sent_idx", "subj", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "sent_idx", "subj", "pred", "obj"]],
        batch[["url", "sent_idx", "subj", "pred", "obj"]],
    )
    assert len(got) > 0


def test_streaming_incremental_resume(spark, tmp_path, tagger_bc):
    pages_dir, pages_pdf = _write_pages_split(tmp_path, 60)
    out = str(tmp_path / "triples_inc")
    ckpt = str(tmp_path / "ckpt_inc")

    q = stream_triples(spark, pages_dir, out, ckpt, tagger_bc)
    q.awaitTermination(120)
    n_first = spark.read.parquet(out).count()

    # a new file lands; a second available-now run drains only the delta
    extra, _ = generate_pages(200)
    extra.iloc[150:].to_parquet(
        os.path.join(pages_dir, "part-late.parquet"), index=False
    )
    q2 = stream_triples(spark, pages_dir, out, ckpt, tagger_bc)
    q2.awaitTermination(120)
    n_second = spark.read.parquet(out).count()
    assert n_second >= n_first
