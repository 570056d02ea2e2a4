"""Resumable checkpoint contract: resume == single run; skip committed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from remediner_spark.operators.ner import extract_triples_stage
from remediner_spark.operators.text import filter_language
from remediner_spark.plans.checkpoint import (
    committed_buckets,
    read_manifest,
    run_stage,
    with_bucket,
)


@pytest.fixture()
def english_pages(spark, corpus_dir):
    return filter_language(spark.read.parquet(f"{corpus_dir}/pages.parquet"))


@pytest.fixture()
def tagger_bc(spark):
    from remediner_spark.plans.pipeline import default_tagger_bc

    return default_tagger_bc(spark)


def triples_transform(tagger_bc):
    def t(df):
        return extract_triples_stage(df, tagger_bc)

    return t


def _sorted(df):
    return (
        df.select("url", "sent_idx", "subj", "pred", "obj")
        .toPandas()
        .sort_values(["url", "sent_idx", "subj", "obj"])
        .reset_index(drop=True)
    )


def test_resume_equals_single_run(spark, english_pages, tagger_bc, tmp_path):
    n_buckets = 8
    # single full run
    full_dir = str(tmp_path / "full")
    full = run_stage(
        spark, "triples", english_pages, triples_transform(tagger_bc),
        full_dir, n_buckets,
    )
    full_p = _sorted(full)

    # interrupted run: first process only half the buckets…
    resumed_dir = str(tmp_path / "resumed")
    bucketed = with_bucket(english_pages, n_buckets)
    first_half = bucketed.filter(F.col("_bucket") < 4).drop("_bucket")
    run_stage(
        spark, "triples", first_half, triples_transform(tagger_bc),
        resumed_dir, n_buckets,
    )
    committed_first = committed_buckets(resumed_dir, "triples")
    assert 0 < len(committed_first) <= 4

    # …then resume with the complete input
    resumed = run_stage(
        spark, "triples", english_pages, triples_transform(tagger_bc),
        resumed_dir, n_buckets,
    )
    resumed_p = _sorted(resumed)
    assert committed_buckets(resumed_dir, "triples") == committed_buckets(
        full_dir, "triples"
    )
    import pandas as pd

    pd.testing.assert_frame_equal(full_p, resumed_p)


def test_committed_buckets_skipped(spark, english_pages, tagger_bc, tmp_path):
    calls = {"n": 0}

    def counting_transform(df):
        calls["n"] += 1
        return extract_triples_stage(df, tagger_bc)

    d = str(tmp_path / "ckpt")
    run_stage(spark, "triples", english_pages, counting_transform, d, 8)
    assert calls["n"] == 1
    out2 = run_stage(spark, "triples", english_pages, counting_transform, d, 8)
    # nothing pending -> transform not invoked again
    assert calls["n"] == 1
    assert out2.count() > 0


def test_manifest_lineage_fields(spark, english_pages, tagger_bc, tmp_path):
    d = str(tmp_path / "ckpt")
    run_stage(spark, "triples", english_pages, triples_transform(tagger_bc), d, 8)
    records = read_manifest(d, "triples")
    assert len(records) > 0
    for rec in records:
        assert rec["status"] == "committed"
        assert rec["rows_in"] > 0
        assert rec["url_min"] <= rec["url_max"]
        assert rec["stage"] == "triples"
        assert "wall_sec" in rec and "ts" in rec
    assert os.path.exists(os.path.join(d, "triples"))
