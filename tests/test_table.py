"""Iceberg-style table format: snapshots, time travel, pruning."""

from __future__ import annotations

import pytest

from remediner_spark.sources.corpus import generate_pages
from remediner_spark.sources.table import (
    pruned_file_count,
    read_table,
    table_snapshots,
    write_table,
)


@pytest.fixture()
def pages_pdf():
    pages, _ = generate_pages(120)
    return pages


def test_append_and_time_travel(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(pages_pdf.iloc[:50])
    df2 = spark.createDataFrame(pages_pdf.iloc[50:])
    s1 = write_table(df1, path, mode="append", partition_by=["lang"])
    s2 = write_table(df2, path, mode="append", partition_by=["lang"])
    assert s1["snapshot_id"] == 1 and s2["snapshot_id"] == 2
    assert read_table(spark, path).count() == 120
    # time travel: snapshot 1 still sees only the first batch
    assert read_table(spark, path, snapshot_id=1).count() == 50


def test_overwrite_keeps_history(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(spark.createDataFrame(pages_pdf.iloc[:50]), path)
    write_table(
        spark.createDataFrame(pages_pdf.iloc[50:80]), path, mode="overwrite"
    )
    assert read_table(spark, path).count() == 30
    assert read_table(spark, path, snapshot_id=1).count() == 50
    snaps = table_snapshots(path)
    assert [s["mode"] for s in snaps] == ["append", "overwrite"]


def test_partition_pruning_from_manifest(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(
        spark.createDataFrame(pages_pdf), path, partition_by=["lang"]
    )
    selected, total = pruned_file_count(path, {"lang": "de"})
    assert 0 < selected < total
    df = read_table(spark, path, partition_filter={"lang": "de"})
    got = df.toPandas()
    want = pages_pdf[pages_pdf["lang"] == "de"]
    assert len(got) == len(want)
    # partition column recovered on read
    assert set(got["lang"]) == {"de"}


def test_schema_mismatch_rejected(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(spark.createDataFrame(pages_pdf), path)
    bad = spark.createDataFrame(pages_pdf.drop(columns=["lang"]))
    with pytest.raises(ValueError, match="schema mismatch"):
        write_table(bad, path)


def test_empty_filter_returns_empty_with_schema(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(
        spark.createDataFrame(pages_pdf), path, partition_by=["lang"]
    )
    df = read_table(spark, path, partition_filter={"lang": "xx"})
    assert df.count() == 0
    assert "url" in df.columns
