"""IVF-style approximate nearest neighbor: k-means coarse quantizer.

The second ANN scale path (alongside the hyperplane-LSH variant in
operators/similarity.py): a seeded Spark-ML KMeans partitions the
embedding space into nlist cells; a query scans only its own cell
(optionally nprobe nearest cells). At 100 TB scale the assignment is a
map-side transform against broadcast centroids and the search join
shuffles on cell id — candidate sets shrink by ~nlist vs brute force.

k-means is not SQL-expressible, so this operator is rows-only for the
driver's oracle gate; its quality gate is the recall@k test against
the brute-force baseline (tests/test_ivf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import N_QUERIES, TOP_K, _as_double, _cosine

NLIST = 16
NPROBE = 4
_SEED = 13


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


QUERIES = {"sim_topk_ivf": q_sim_topk_ivf}
ORACLES: dict[str, str] = {}  # rows-only: k-means is not SQL-expressible
