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


def test_sliding_window_counts_match_batch_for_closed_windows(
    spark, tmp_path
):
    """Hopping windows (1 min window / 30 s slide) over a staged event
    stream: every finalized window emitted by append mode must carry
    the same count as the batch sliding aggregation."""
    import pandas as pd

    from remediner_spark.streaming import stream_sliding_event_counts

    n = 300
    events = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": (
                pd.Timestamp("2024-03-01T00:00:00")
                + pd.to_timedelta(range(n), unit="s")
            ).astype("datetime64[us]"),
            "event_type": [
                ["click", "view", "purchase"][i % 3] for i in range(n)
            ],
        }
    )
    d = tmp_path / "events"
    os.makedirs(d)
    events.iloc[:150].to_parquet(d / "e0.parquet", index=False)
    events.iloc[150:].to_parquet(d / "e1.parquet", index=False)
    out = str(tmp_path / "slide_counts")

    q = stream_sliding_event_counts(
        spark, str(d), out, str(tmp_path / "ckpt_slide"),
        window_s=60, slide_s=30, watermark="30 seconds",
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).toPandas()
    assert 0 < got["window_start"].nunique() < 12  # some closed, not all

    batch = (
        spark.read.parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.window("ts", "60 seconds", "30 seconds").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .toPandas()
    )
    merged = got.merge(
        batch, on=["window_start", "event_type"],
        suffixes=("_stream", "_batch"),
    )
    assert len(merged) == len(got)
    assert (merged["n_stream"] == merged["n_batch"]).all()
    # hopping: batch rows ~2x the distinct slide buckets (each event
    # in exactly 2 windows)
    assert batch["window_start"].nunique() > got["window_start"].nunique()
