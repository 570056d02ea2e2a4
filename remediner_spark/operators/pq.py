"""Product quantization: the memory-compression ANN path.

Completes the similarity family (brute force -> hyperplane-LSH ->
IVF -> PQ): at 100 TB the embedding table itself is the bottleneck —
a 64-dim float32 vector is 256 bytes, its PQ code is M_SUB bytes — so
the scan side of ANN search reads codes, not vectors, and ranks by
asymmetric distance (ADC): the exact distance from the query to each
code's centroid, summed over subspaces.

Training (one seeded Spark-ML KMeans per subspace over the sliced
vectors) is not SQL-expressible; everything after it is, so the
fitted codebooks are materialized to a parquet side file (atomic
tmp+rename — the IVF centroids pattern, operators/ivf.py) and the
DuckDB oracles re-derive encoding and ADC search relationally.

Cross-engine exactness discipline (same as IVF):
* every per-subspace squared distance accumulates strictly
  left-to-right over dimensions and rounds to 9dp BEFORE any argmin;
* the ADC total is the FIXED left-associative sum of the M_SUB
  rounded partials (never an order-free aggregate over floats);
* ties break to the lower code / neighbor id.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ivf import _D2_DP, _round_half_up
from .similarity import N_QUERIES, TOP_K, _as_double

M_SUB = 4  # subspaces
SUB_DIM = 16  # dims per subspace (DIM = 64)
K_CODES = 16  # centroids per subspace codebook
_SEED = 29


def codebooks_path() -> str:
    import os

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo, ".kg_oracle", "pq_codebooks.parquet")


# process-local memo keyed by sf_dir: the fit is deterministic
# (seeded, fixed data), and the two PQ gate entries plus repeated
# bench legs would otherwise re-run 4 KMeans fits each
_BOOKS_CACHE: dict[str, list] = {}


def _fit_codebooks(
    spark: SparkSession, emb: DataFrame, cache_key: str | None = None
) -> list[list[list[float]]]:
    """codebooks[sub][code] = centroid (list of SUB_DIM floats)."""
    if cache_key is not None and cache_key in _BOOKS_CACHE:
        return _BOOKS_CACHE[cache_key]
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    books = []
    for m in range(M_SUB):
        sub = emb.select(
            array_to_vector(
                F.slice(F.col("v"), m * SUB_DIM + 1, SUB_DIM)
            ).alias("features")
        )
        model = KMeans(
            k=K_CODES, seed=_SEED + m, featuresCol="features"
        ).fit(sub)
        books.append(
            [list(map(float, c)) for c in model.clusterCenters()]
        )
    if cache_key is not None:
        _BOOKS_CACHE[cache_key] = books
    return books


def _materialize_codebooks(books) -> str:
    import os
    import tempfile

    import pandas as pd

    path = codebooks_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = [
        (m, k, books[m][k])
        for m in range(M_SUB)
        for k in range(K_CODES)
    ]
    pdf = pd.DataFrame(rows, columns=["sub", "code", "c"])
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path), suffix=".parquet"
    )
    os.close(fd)
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def _sub_d2(sub_v: Column, center: list[float]) -> Column:
    lit_c = F.array(*[F.lit(float(x)) for x in center])
    return F.round(
        F.aggregate(
            F.zip_with(sub_v, lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        _D2_DP,
    )


def _code_expr(v_col: Column, books, m: int) -> Column:
    """argmin code for subspace ``m`` — lexicographic min over
    (rounded d2, code) structs, ties to the lower code."""
    sub_v = F.slice(v_col, m * SUB_DIM + 1, SUB_DIM)
    structs = [
        F.struct(
            _sub_d2(sub_v, books[m][k]).alias("d2"),
            F.lit(k).alias("code"),
        )
        for k in range(K_CODES)
    ]
    return F.array_min(F.array(*structs))["code"].cast("long")


def _emb(
    spark: SparkSession, sf_dir: str, floor: bool = False
) -> DataFrame:
    """Embeddings frame. ``floor=False`` (default) keeps the raw scan
    layout — REQUIRED for the k-means FIT inputs: the seeded fit's
    init sampling is partitioning/order-sensitive, so the fit must
    always see the pristine scan (bench.py's fit legs call
    ``_emb(spark, sf_dir)`` and stay bit-identical across rounds).
    ``floor=True`` applies the scan-parallelism floor (sources/scan.py)
    for the heavy map-side consumers (encode, assignment, search)."""
    reader = scan_parquet if floor else (
        lambda sp, p: sp.read.parquet(p)
    )
    return reader(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )


def q_embed_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding: every vector compresses to M_SUB codebook indices
    (256 bytes -> 4 bytes here). Map-only against broadcast codebook
    literals — the 100 TB shape: the fitted codebooks are tiny and
    ride the closure; no shuffle anywhere."""
    books = _fit_codebooks(spark, _emb(spark, sf_dir), cache_key=sf_dir)
    _materialize_codebooks(books)
    emb = _emb(spark, sf_dir, floor=True)
    return emb.select(
        "vec_id",
        *[
            _code_expr(F.col("v"), books, m).alias(f"code_{m}")
            for m in range(M_SUB)
        ],
    )


def _query_vectors(emb: DataFrame) -> list[tuple[int, list[float]]]:
    rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v")
        .collect()
    )  # bounded: N_QUERIES rows — the constant-size query set only
    return sorted((int(r["vec_id"]), list(r["v"])) for r in rows)


def _partial_table(books, qv: list[float]) -> list[list[float]]:
    """pd[m][k]: 9dp-rounded sequential d2 from the query's m-th
    subvector to codebook centroid k — bitwise identical to the Spark
    aggregate and the DuckDB list_sum derivations (IVF discipline)."""
    out = []
    for m in range(M_SUB):
        sub_q = qv[m * SUB_DIM : (m + 1) * SUB_DIM]
        row = []
        for k in range(K_CODES):
            acc = 0.0
            for a, b in zip(sub_q, books[m][k]):
                acc += (a - b) * (a - b)
            row.append(_round_half_up(acc))
        out.append(row)
    return out


SHORTLIST = 50  # ADC candidates per query before the exact rerank


def q_sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search, production shape: an ADC SHORTLIST over the codes
    (the scan touches only vec_id + M_SUB byte-sized codes; per-query
    partial tables are plan literals), then an EXACT cosine rerank of
    the shortlist against the full vectors — the coarse-filter +
    exact-verify composition every PQ deployment runs (and the same
    shape as the banded-LSH + exact-cosine dedup verify). At 100 TB
    the full-vector reads drop from N to queries x SHORTLIST."""
    # fit on the pristine scan (partitioning/order-sensitive init);
    # the query-vector collect is a 5-row pushdown read, also plain.
    # The heavy encode pass and the rerank vector fetch take the
    # scan-parallelism floor.
    books = _fit_codebooks(spark, _emb(spark, sf_dir), cache_key=sf_dir)
    _materialize_codebooks(books)
    emb = _emb(spark, sf_dir, floor=True)
    coded = emb.select(
        "vec_id",
        *[
            _code_expr(F.col("v"), books, m).alias(f"code_{m}")
            for m in range(M_SUB)
        ],
    )
    per_query = []
    for qid, qv in _query_vectors(_emb(spark, sf_dir)):
        pd_t = _partial_table(books, qv)
        dist = None
        for m in range(M_SUB):
            lit_row = F.array(*[F.lit(x) for x in pd_t[m]])
            term = F.element_at(
                lit_row, (F.col(f"code_{m}") + 1).cast("int")
            )
            dist = term if dist is None else dist + term
        per_query.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                dist.alias("adc_d2"),
            )
        )
    pairs = (
        coded.select(
            "vec_id", F.explode(F.array(*per_query)).alias("q")
        )
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("q.adc_d2").alias("adc_d2"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    shortlist = pairs.withColumn(
        "_adc_rank", F.row_number().over(w_adc)
    ).filter(F.col("_adc_rank") <= SHORTLIST)

    from .similarity import _cosine

    qvecs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    nvecs = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    )
    reranked = (
        shortlist.join(F.broadcast(qvecs), "query_id")
        .join(nvecs, "neighbor_id")
        .withColumn("cosine", _cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _sql_codes_cte() -> str:
    d2 = (
        f"round(list_sum(list_transform(range(1, {SUB_DIM} + 1), "
        f"i -> (e.v[cb.sub * {SUB_DIM} + i] - cb.c[i]) * "
        f"(e.v[cb.sub * {SUB_DIM} + i] - cb.c[i]))), {_D2_DP})"
    )
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT sub, code, c FROM read_parquet('{codebooks_path()}')),
sd AS (SELECT e.vec_id, cb.sub, cb.code, {d2} AS d2
       FROM e CROSS JOIN cb),
best AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
    FROM sd) WHERE rn = 1),
codes AS (
  SELECT vec_id,
         max(CASE WHEN sub = 0 THEN code END) AS code_0,
         max(CASE WHEN sub = 1 THEN code END) AS code_1,
         max(CASE WHEN sub = 2 THEN code END) AS code_2,
         max(CASE WHEN sub = 3 THEN code END) AS code_3
  FROM best GROUP BY vec_id)"""


def sql_embed_pq_quantize() -> str:
    return f"""
WITH {_sql_codes_cte()}
SELECT vec_id, CAST(code_0 AS BIGINT) AS code_0,
       CAST(code_1 AS BIGINT) AS code_1,
       CAST(code_2 AS BIGINT) AS code_2,
       CAST(code_3 AS BIGINT) AS code_3
FROM codes"""


def sql_sim_topk_pq() -> str:
    joins = "\n".join(
        f"  JOIN pd p{m} ON p{m}.sub = {m} AND p{m}.code = c.code_{m} "
        f"AND p{m}.query_id = p0.query_id"
        if m
        else "  JOIN pd p0 ON p0.sub = 0 AND p0.code = c.code_0"
        for m in range(M_SUB)
    )
    total = " + ".join(f"p{m}.pd" for m in range(M_SUB))
    return f"""
WITH {_sql_codes_cte()},
pd AS (SELECT vec_id AS query_id, sub, code, d2 AS pd
       FROM sd WHERE vec_id < {N_QUERIES}),
dist AS (
  SELECT p0.query_id, c.vec_id AS neighbor_id, {total} AS adc_d2
  FROM codes c
{joins}
  WHERE c.vec_id != p0.query_id),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS arn
    FROM dist) WHERE arn <= {SHORTLIST}),
rerank AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_cosine_similarity(q.v, n.v), 6) AS cosine
  FROM shortlist s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e n ON n.vec_id = s.neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM rerank)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {TOP_K}"""


QUERIES = {
    "embed_pq_quantize": q_embed_pq_quantize,
    "sim_topk_pq": q_sim_topk_pq,
}


def oracles() -> dict[str, str]:
    """Built lazily (not at import): the oracle embeds the codebook
    side-file path but must not touch the filesystem at import."""
    return {
        "embed_pq_quantize": sql_embed_pq_quantize(),
        "sim_topk_pq": sql_sim_topk_pq(),
    }
