"""Watermarked windowed streaming aggregation vs batch computation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from remediner_spark.operators.ner import extract_triples_stage
from remediner_spark.operators.text import filter_language
from remediner_spark.sources.corpus import generate_pages
from remediner_spark.streaming import stream_windowed_triple_counts


@pytest.fixture(scope="module")
def tagger_bc(spark):
    from remediner_spark.plans.pipeline import default_tagger_bc

    return default_tagger_bc(spark)


def test_windowed_counts_match_batch_for_closed_windows(
    spark, tmp_path, tagger_bc
):
    pages, _ = generate_pages(300)  # warc_ts spans 300 seconds
    d = tmp_path / "pages"
    os.makedirs(d)
    pages.iloc[:150].to_parquet(d / "p0.parquet", index=False)
    pages.iloc[150:].to_parquet(d / "p1.parquet", index=False)
    out = str(tmp_path / "win_counts")
    ckpt = str(tmp_path / "ckpt")

    q = stream_windowed_triple_counts(
        spark, str(d), out, ckpt, tagger_bc,
        window="1 minute", watermark="30 seconds",
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).toPandas()
    # append mode emits only finalized windows: some but not all
    assert 0 < got["window_start"].nunique() < 6

    batch = (
        extract_triples_stage(
            filter_language(spark.read.parquet(str(d))), tagger_bc
        )
        .groupBy(F.window("warc_ts", "1 minute").alias("w"), F.col("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "pred", "n")
        .toPandas()
    )
    merged = got.merge(
        batch, on=["window_start", "pred"], suffixes=("_stream", "_batch")
    )
    assert len(merged) == len(got)  # every emitted window exists in batch
    assert (merged["n_stream"] == merged["n_batch"]).all()
