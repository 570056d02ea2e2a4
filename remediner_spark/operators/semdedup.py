"""SemDeDup: semantic deduplication via embedding clustering.

The Abbas et al. 2023 recipe (used to shrink LAION/web corpora):
k-means-cluster the embedding space, then compare pairs ONLY within a
cluster — cosine above a threshold marks a semantic duplicate, and
one representative per duplicate group survives. Clustering makes the
quadratic step tractable: pairwise work is bounded per cluster, never
corpus-wide (the paper's point; all-pairs cosine at corpus scale is
impossible).

Spark shape:
* cluster assignment — map-side argmin over broadcast centroid
  literals (the IVF quantizer, operators/ivf.py: same seeded fit,
  same 9dp-rounded sequential d2, same materialized-centroid oracle
  contract).
* within-cluster pairs — a self-join that shuffles on cell id only;
  at 100 TB NLIST scales with the corpus (the paper runs 50k clusters
  for LAION) so per-cell candidate sets stay bounded; a degenerate
  hot cell would take the minhash_pairs star-link cap (same
  output-skew class — see operators/dedup.py bucket_cap).
* keeper rule — greedy min-id: a vector is dropped iff a
  smaller-id vector in its cell is cosine-similar; dup_of names the
  smallest such keeper. Deterministic and exactly mirrorable in SQL.
  (The paper keeps the member with LOWEST centroid similarity to
  maximize diversity — one ORDER BY swap away; min-id is kept here so
  the verdict is a pure function of the pair set.)

Exact cross-engine by the ivf discipline: sequential left-to-right
float sums, 9dp d2 rounding before argmin, 6dp cosine rounding before
the threshold compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ivf import _D2_DP, _d2_cell_structs, centroids_path, ensure_centroids
from .similarity import _as_double, _cosine

SEM_T = 0.45  # same margin rationale as dedup.COS_T at sf0.01


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    centers = ensure_centroids(spark, emb)
    from pyspark.storagelevel import StorageLevel

    # both sides of the cell self-join + the final verdict select
    # read `assigned`; persist so assignment (NLIST d2 aggregates per
    # row) runs once. Bounded (n_vecs x dim doubles), spillable,
    # released via session.cache_scope — the minhash band contract.
    assigned = emb.withColumn(
        "cell",
        F.array_min(_d2_cell_structs(F.col("v"), centers))["cell"]
        .cast("long"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            F.round(_cosine(F.col("a.v"), F.col("b.v")), 6) >= SEM_T
        )
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def sql_semdedup() -> str:
    d2 = (
        f"round(list_sum(list_transform(range(1, len(e.v) + 1), "
        f"i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))), {_D2_DP})"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT cell, c FROM read_parquet('{centroids_path()}')),
dist AS (
  SELECT e.vec_id, e.v, c.cell, {d2} AS d2
  FROM e CROSS JOIN cent c),
assigned AS (
  SELECT vec_id, v, CAST(cell AS BIGINT) AS cell FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM dist) WHERE rn = 1),
dup AS (
  SELECT b.vec_id, min(a.vec_id) AS dup_of
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {SEM_T}
  GROUP BY b.vec_id)
SELECT s.vec_id, s.cell, d.dup_of IS NULL AS keep, d.dup_of
FROM assigned s LEFT JOIN dup d USING (vec_id)"""


QUERIES = {"dedup_semantic": q_semdedup}


def oracles() -> dict[str, str]:
    """Lazy like ivf.oracles(): the SQL embeds the centroid side-file
    path but must not touch the filesystem at import time."""
    return {"dedup_semantic": sql_semdedup()}
