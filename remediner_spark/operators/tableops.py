"""Oracle-gated reads over the Iceberg-style table format.

The table format (sources/table.py) is exercised by unit tests, but
these two entries put its row-level semantics under the SAME
cross-engine hash gate as every other operator: a deterministic table
is materialized ONCE per sf (side-file pattern, like the IVF
centroids), mutated through the merge-on-read write paths, and the
``read_table`` scan — equality-delete anti-joins, predicate-delete
complements, field-id projection after rename/widen — must reproduce
exactly what DuckDB computes relationally from the source parquet.

* ``table_mor_read``: sorted table -> MoR upsert (equality-delete) ->
  MoR range delete (metadata drop + predicate delete) -> read.
* ``table_evolution_read``: int column -> widen to long -> rename ->
  append past-int-range row -> read through the field-id mapping.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLEOPS_VERSION = 1

# MoR scenario constants (shared by the Spark build and the SQL oracle)
UPD_EVERY = 50  # every doc_id % 50 == 0 gets n_chars := -1 via MoR upsert
DEL_LO, DEL_HI = 100, 199  # then DELETE WHERE doc_id BETWEEN 100 AND 199
WIDE_SENTINEL = 1 << 40  # appended after int->long widening


def _cache_dir(kind: str, sf_dir: str) -> str:
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        repo, ".kg_oracle", f"table_{kind}_v{TABLEOPS_VERSION}_{sf_name}"
    )


def _build_once(out: str, build) -> str:
    """Materialize into a tmp dir, atomically rename into place; a
    concurrent loser just discards its tmp (content is deterministic,
    so whichever build wins is correct). The manifest stores absolute
    file paths, so they are retargeted from the tmp prefix before the
    rename."""
    if os.path.exists(os.path.join(out, "_metadata", "snapshots.json")):
        return out
    tmp = f"{out}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    build(tmp)
    sf = os.path.join(tmp, "_metadata", "snapshots.json")
    with open(sf) as fh:
        content = fh.read()
    with open(sf, "w") as fh:
        fh.write(content.replace(tmp, out))
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _ensure_mor_table(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.table import delete_range, upsert_rows, write_table

    def build(path: str) -> None:
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "n_chars")
        )
        write_table(docs.repartition(8), path, sort_by=["doc_id"])
        updates = docs.filter(F.col("doc_id") % UPD_EVERY == 0).select(
            "doc_id", F.lit(-1).cast("long").alias("n_chars")
        )
        upsert_rows(spark, path, updates, ["doc_id"], strategy="mor")
        delete_range(spark, path, "doc_id", DEL_LO, DEL_HI, strategy="mor")

    return _build_once(_cache_dir("mor", sf_dir), build)


def q_table_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read scan: the equality-delete (upsert keys) and the
    predicate-delete (range) apply at read time against untouched data
    files; rows must equal the relational recomputation exactly."""
    from ..sources.table import read_table

    path = _ensure_mor_table(spark, sf_dir)
    return read_table(spark, path).select(
        "doc_id", F.col("n_chars").alias("val")
    )


SQL_TABLE_MOR_READ = f"""
SELECT doc_id,
       CASE WHEN doc_id % {UPD_EVERY} = 0 THEN CAST(-1 AS BIGINT)
            ELSE n_chars END AS val
FROM documents
WHERE doc_id NOT BETWEEN {DEL_LO} AND {DEL_HI}"""


def _ensure_evolution_table(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.table import rename_column, widen_column, write_table

    def build(path: str) -> None:
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.col("n_chars").cast("int").alias("n")
        )
        write_table(base.repartition(4), path, sort_by=["doc_id"])
        widen_column(path, "n", "long")
        rename_column(path, "n", "text_len")
        extra = spark.createDataFrame(
            [(-1, WIDE_SENTINEL)], "doc_id long, text_len long"
        )
        write_table(extra, path, mode="append")

    return _build_once(_cache_dir("evo", sf_dir), build)


def q_table_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-id evolution scan: pre-evolution int files read through
    the widen cast and the rename mapping; the post-evolution append
    carries a value only the widened type can hold."""
    from ..sources.table import read_table

    path = _ensure_evolution_table(spark, sf_dir)
    return read_table(spark, path).select("doc_id", "text_len")


SQL_TABLE_EVOLUTION_READ = f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS text_len FROM documents
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST({WIDE_SENTINEL} AS BIGINT)"""


QUERIES = {
    "table_mor_read": q_table_mor_read,
    "table_evolution_read": q_table_evolution_read,
}

ORACLES = {
    "table_mor_read": SQL_TABLE_MOR_READ,
    "table_evolution_read": SQL_TABLE_EVOLUTION_READ,
}
