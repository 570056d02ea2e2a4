"""Bucketed table layout: co-located joins without a shuffle.

At 100 TB the biggest repeated cost of the KG build is re-shuffling
the same keys (doc_id / url / entity_id) for every join. Spark's
bucketed tables pre-partition AND pre-sort the data by the join key at
write time; a join between two tables bucketed the same way compiles
to a SortMergeJoin with NO Exchange on either side — the shuffle is
paid once at ingest, then amortized over every downstream join.

``write_bucketed`` is the ingest-side helper; the no-Exchange property
is pinned by tests/test_plans.py::test_bucketed_join_no_shuffle.
(bucketBy requires the session catalog — saveAsTable, not raw parquet
paths; readers use spark.table().)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted catalog table on ``key``."""
    w = df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
