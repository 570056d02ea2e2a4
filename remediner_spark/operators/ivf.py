"""IVF-style approximate nearest neighbor: k-means coarse quantizer.

The second ANN scale path (alongside the hyperplane-LSH variant in
operators/similarity.py): a seeded Spark-ML KMeans partitions the
embedding space into nlist cells; a query scans only its own cell
(optionally nprobe nearest cells). At 100 TB scale the assignment is a
map-side transform against broadcast centroids and the search join
shuffles on cell id — candidate sets shrink by ~nlist vs brute force.

The k-means TRAINING is not SQL-expressible, but the SEARCH phase is:
the fitted centroids are materialized to a parquet side file when the
query runs, and the DuckDB oracle re-derives cell assignment (argmin
squared distance), probe-cell selection, candidate generation, cosine
ranking, and top-k relationally from that file + the embeddings view.
So the gate hash-verifies everything downstream of the learned
centroids; k-means quality itself is gated by the recall@k test
against the brute-force baseline (tests/test_ivf.py). The side file is
written fresh by the Spark query and read by the oracle in the same
gate run (the gate executes the pair together, so they always see the
same centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import N_QUERIES, TOP_K, _as_double, _cosine

NLIST = 16
NPROBE = 4
_SEED = 13


def centroids_path() -> str:
    import os

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    os.makedirs(os.path.join(repo, ".kg_oracle"), exist_ok=True)
    return os.path.join(repo, ".kg_oracle", "ivf_centroids.parquet")


def _with_cells(spark: SparkSession, emb: DataFrame):
    """Assign each vector to its nearest of NLIST k-means centroids;
    returns (assigned_df, centers) where assigned has `cell`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn("features", array_to_vector(F.col("v")))
    model = KMeans(k=NLIST, seed=_SEED, featuresCol="features").fit(feat)
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "cell")
        .drop("features")
    )
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centers


def _query_probe_cells(centers: list[list[float]], qv: list[float]) -> list[int]:
    """nprobe nearest cells for one query vector (driver-side math)."""
    import numpy as np

    c = np.array(centers)
    q = np.array(qv)
    d = ((c - q) ** 2).sum(axis=1)
    return [int(i) for i in d.argsort()[:NPROBE]]


def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbors per query, searching only the query's NPROBE
    nearest k-means cells."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    assigned, centers = _with_cells(spark, emb)
    # materialize the learned centroids so the DuckDB oracle can
    # re-derive the whole search phase relationally (module docstring)
    import pandas as pd

    pd.DataFrame(
        {"cell": list(range(len(centers))), "c": centers}
    ).to_parquet(centroids_path(), index=False)
    assigned = assigned.cache()
    queries = assigned.filter(F.col("vec_id") < N_QUERIES)
    # probe-cell table: (query vec_id, cell) — tiny, broadcastable
    q_rows = queries.select("vec_id", "v").collect()
    probe = spark.createDataFrame(
        [
            (int(r["vec_id"]), cell)
            for r in q_rows
            for cell in _query_probe_cells(centers, r["v"])
        ],
        "query_id long, cell int",
    )
    candidates = (
        F.broadcast(probe)
        .join(assigned.alias("e"), "cell")
        .filter(F.col("query_id") != F.col("e.vec_id"))
        .select("query_id", F.col("e.vec_id").alias("neighbor_id"),
                F.col("e.v").alias("nv"))
    )
    q_side = queries.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = candidates.join(F.broadcast(q_side), "query_id").select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("qv"), F.col("nv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sql_sim_topk_ivf() -> str:
    """Search phase over the materialized centroids. Assignment and
    probe selection order by (squared distance, cell) — the same
    first-min tie-break as Spark ML's argmin and numpy argsort."""
    d2 = (
        "list_sum(list_transform(range(1, len(e.v) + 1), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT cell, c FROM read_parquet('{centroids_path()}')),
dist AS (
  SELECT e.vec_id, e.v, c.cell, {d2} AS d2
  FROM e CROSS JOIN cent c),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM dist) WHERE rn = 1),
probe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM dist WHERE vec_id < {N_QUERIES}) WHERE rn <= {NPROBE}),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, a.v), 6) AS cosine
  FROM probe p
  JOIN assigned a ON a.cell = p.cell AND a.vec_id != p.query_id
  JOIN assigned q ON q.vec_id = p.query_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, cosine FROM ranked
WHERE rank <= {TOP_K}"""


QUERIES = {"sim_topk_ivf": q_sim_topk_ivf}
# the search phase IS SQL-expressible given the materialized centroids
ORACLES: dict[str, str] = {"sim_topk_ivf": sql_sim_topk_ivf()}
