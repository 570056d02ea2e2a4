"""Full-text retrieval over the documents table: BM25 top-k.

The curation-side search path of a training-data pipeline (probe the
corpus for topical slices, audit what a filter kept). Shape at scale:

* postings build — one shuffle keyed (doc_id, term) with map-side
  partial counts; document length rides the key (functionally
  dependent), so no second pass.
* document-frequency agg — vocabulary-grain, map-side partial.
* scoring — the query table is broadcast (queries are user-sized,
  never corpus-sized), so scoring is MAP-SIDE over the postings; only
  postings matching a query term reach the (qid, doc) aggregation.
* top-k — rank-filter per query partition, which Spark 4 compiles to
  WindowGroupLimit (per-partition running top-k, no full sort).

Cross-engine determinism: the idf is the RATIONAL Robertson form
(N - df + 0.5) / (df + 0.5), cross-multiplied to integers — the
classic log() idf is a transcendental whose last ulp is libm-specific
and could flip ranks between Spark and DuckDB (same reasoning as
text_keywords' tf/df score). Every per-term score is an identical
IEEE expression tree over integers rounded to 9dp, and the per-doc
sum is a position-ordered LEFT FOLD over terms (CLAUDE.md invariant),
so the 6dp final score is bit-identical in both engines.

The gate derives its queries from the corpus itself (rarest-first
df-ranked terms, 3 per query) so the entry is self-contained; a
deployment would substitute a user query table — the plan is
unchanged.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
N_QUERIES = 5
TERMS_PER_QUERY = 3


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) — dl rides the group key (constant per
    doc) so document length needs no join-back."""
    tok = docs.select(
        "doc_id",
        F.size("ws").alias("dl"),
        F.explode("ws").alias("term"),
    )
    return tok.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("ws")).alias("t")
    ).collect()[0]
    n_docs, total_tokens = int(stats["n"]), int(stats["t"])
    avgdl = total_tokens / n_docs  # IEEE double division, both engines

    post = _postings(docs)
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # gate query synthesis: rarest-first df ranking, 3 terms per query
    n_terms = N_QUERIES * TERMS_PER_QUERY
    ranked = dfreq.orderBy(F.col("df").asc(), F.col("term").asc()).limit(
        n_terms
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("df").asc(), F.col("term").asc())
    )
    qterms = ranked.select(
        F.floor((rn - F.lit(1)) / F.lit(TERMS_PER_QUERY))
        .cast("int")
        .alias("qid"),
        "term",
        "df",
    )

    idf = (
        F.lit(2) * F.lit(n_docs) - F.lit(2) * F.col("df") + F.lit(1)
    ) / (F.lit(2) * F.col("df") + F.lit(1))
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0)
        - F.lit(BM25_B)
        + F.lit(BM25_B) * (F.col("dl") / F.lit(avgdl))
    )
    s = F.round(
        idf * ((F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom), 9
    ).alias("s")
    scored = post.join(F.broadcast(qterms), "term").select(
        "qid", "doc_id", "term", s
    )

    per_doc = scored.groupBy("qid", "doc_id").agg(
        F.collect_list(F.struct("term", "s")).alias("ss")
    )
    fold = F.aggregate(
        F.array_sort("ss"), F.lit(0.0), lambda acc, x: acc + x["s"]
    )
    sc = per_doc.select(
        "qid",
        "doc_id",
        F.size("ss").cast("long").alias("n_terms"),
        F.round(fold, 6).alias("score"),
    )
    rank = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
    )
    return (
        sc.withColumn("rank", rank.cast("int"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("qid", "doc_id", "rank", "score", "n_terms")
    )


SQL_SEARCH_BM25 = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
n AS (SELECT count(*) AS n_docs, sum(len(ws)) AS total_tokens FROM t),
tok AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM t),
post AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
qt AS (
  SELECT CAST(floor((rn - 1) / {TERMS_PER_QUERY}) AS INT) AS qid,
         term, df
  FROM (SELECT term, df,
               row_number() OVER (ORDER BY df ASC, term ASC) AS rn
        FROM dfreq)
  WHERE rn <= {N_QUERIES * TERMS_PER_QUERY}),
avg AS (SELECT CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS avgdl, n_docs FROM n),
s AS (
  SELECT qt.qid, post.doc_id, post.term,
         round(((2 * avg.n_docs - 2 * qt.df + 1)
                / (2 * qt.df + 1))
               * ((post.tf * CAST({BM25_K1 + 1.0!r} AS DOUBLE))
                  / (post.tf + CAST({BM25_K1!r} AS DOUBLE)
                     * (CAST(1.0 AS DOUBLE)
                        - CAST({BM25_B!r} AS DOUBLE)
                        + CAST({BM25_B!r} AS DOUBLE)
                          * (post.dl / avg.avgdl)))),
               9) AS s
  FROM post JOIN qt USING (term) CROSS JOIN avg),
agg AS (
  SELECT qid, doc_id, list(s ORDER BY term) AS ss
  FROM s GROUP BY 1, 2),
sc AS (
  SELECT qid, doc_id, CAST(len(ss) AS BIGINT) AS n_terms,
         round(list_reduce(ss, (a, b) -> a + b), 6) AS score
  FROM agg)
SELECT qid, doc_id, rank, score, n_terms
FROM (SELECT *, CAST(row_number() OVER (
        PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INT)
        AS rank FROM sc)
WHERE rank <= {BM25_TOP_K}"""


QUERIES = {
    "search_bm25": q_search_bm25,
}

ORACLES = {
    "search_bm25": SQL_SEARCH_BM25,
}
