"""Similarity search over embeddings(vec_id, embedding, label).

* brute-force cosine top-k — the exactness baseline (cross join +
  window rank); at scale this is the per-bucket verifier, not the
  global path.
* random-hyperplane LSH — seeded hyperplanes (driver-side numpy,
  embedded as literals so the DuckDB oracle reproduces them bit-for-
  bit) bucket vectors by sign signature; ANN search then scans only
  the query's bucket. This is the 100 TB path: signature computation
  is map-side, the bucket join shuffles signature-sized keys only.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOP_K = 5
N_QUERIES = 5  # vec_id < 5 act as the query set
N_PLANES = 8
DIM = 64
_SEED = 7


def _hyperplanes() -> list[list[float]]:
    rng = np.random.RandomState(_SEED)
    return [
        [round(float(x), 6) for x in rng.randn(DIM)] for _ in range(N_PLANES)
    ]


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine(a, b):
    return F.round(
        _dot(a, b)
        / (
            F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
            * F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
        ),
        6,
    )


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    pairs = (
        queries.alias("q")
        .join(emb.alias("e"), F.col("q.vec_id") != F.col("e.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("e.vec_id").alias("neighbor_id"),
            _cosine(F.col("q.v"), F.col("e.v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


SQL_SIM_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, n.v), 6) AS cosine
  FROM e q JOIN e n ON q.vec_id != n.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= {TOP_K}"""


def _signature_expr(v_col):
    planes = _hyperplanes()
    sig = None
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(v_col, lit_plane) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        sig = bit if sig is None else sig + bit
    return sig.cast("int")


def _signature_sql(v_col: str) -> str:
    planes = _hyperplanes()
    terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({v_col}, {arr}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    return (
        emb.select(_signature_expr(F.col("v")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


SQL_SIM_LSH_BUCKETS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT {_signature_sql('v')} AS bucket, count(*) AS n_vectors
FROM e GROUP BY 1"""


def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: rank neighbors only within the query's LSH bucket."""
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    sig = emb.withColumn("bucket", _signature_expr(F.col("v")))
    queries = sig.filter(F.col("vec_id") < N_QUERIES)
    pairs = (
        queries.alias("q")
        .join(
            sig.alias("e"),
            (F.col("q.bucket") == F.col("e.bucket"))
            & (F.col("q.vec_id") != F.col("e.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("e.vec_id").alias("neighbor_id"),
            _cosine(F.col("q.v"), F.col("e.v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


SQL_SIM_TOPK_LSH = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, {_signature_sql('v')} AS bucket FROM e),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, n.v), 6) AS cosine
  FROM sig q JOIN sig n
    ON q.bucket = n.bucket AND q.vec_id != n.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= {TOP_K}"""


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (the 4x memory lever for
    ANN at scale: int8 codes + one float scale per vector). Map-only:
    scale = max|v| / 127, q_i = round(v_i * 127 / max|v|). Output
    carries the codes as CSV (the gate canonicalizer can't hash list
    columns) plus exact integer stats pinning the whole code vector.
    Rounding: Spark HALF_UP and DuckDB's C round agree away-from-zero;
    a component landing within 1 ulp of a .5 boundary is the same
    documented residual as the IVF d2 discipline (ivf._round_half_up).
    """
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    maxabs = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    with_m = emb.withColumn("maxabs", maxabs).filter(F.col("maxabs") > 0)
    q = F.transform(
        F.col("v"),
        lambda x: F.round(x * 127 / F.col("maxabs"), 0).cast("int"),
    )
    return with_m.select(
        "vec_id",
        F.round(F.col("maxabs") / 127, 9).alias("scale"),
        F.concat_ws(",", q.cast("array<string>")).alias("q_csv"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("qsum"),
        F.array_min(q).cast("long").alias("qmin"),
        F.array_max(q).cast("long").alias("qmax"),
    )


SQL_EMBED_QUANTIZE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
m AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS maxabs
  FROM e),
q AS (
  SELECT vec_id, maxabs,
         list_transform(v, x -> CAST(round(x * 127 / maxabs, 0) AS INT)) AS qv
  FROM m WHERE maxabs > 0)
SELECT vec_id, round(maxabs / 127, 9) AS scale,
       array_to_string(qv, ',') AS q_csv,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS qsum,
       CAST(list_aggregate(qv, 'min') AS BIGINT) AS qmin,
       CAST(list_aggregate(qv, 'max') AS BIGINT) AS qmax
FROM q"""


QUERIES = {
    "sim_topk_bruteforce": q_sim_topk_bruteforce,
    "sim_lsh_buckets": q_sim_lsh_buckets,
    "sim_topk_lsh": q_sim_topk_lsh,
    "embed_quantize": q_embed_quantize,
}

ORACLES = {
    "sim_topk_bruteforce": SQL_SIM_TOPK,
    "sim_lsh_buckets": SQL_SIM_LSH_BUCKETS,
    "sim_topk_lsh": SQL_SIM_TOPK_LSH,
    "embed_quantize": SQL_EMBED_QUANTIZE,
}
