"""Connected components via iterative min-label propagation.

The clustering primitive behind M8's residual canonicalization
(SURVEY.md: "connected components via iterative self-join") and
near-duplicate cluster collapse: given an undirected pair list, every
vertex converges to the minimum vertex id reachable from it.

Scale notes: each iteration is one join + one aggregation (shuffle on
vertex id); iteration count is the graph diameter (near-dup graphs are
shallow — typically <=5). `localCheckpoint` truncates the lineage each
round so plans don't grow with iterations. For billion-edge graphs the
same loop runs with large-small iteration pruning (only changed labels
re-join); that refinement is noted, not needed at this scale.

The DuckDB oracle expresses the same fixpoint as a recursive CTE
(transitive closure -> min reachable id), so the iterative Spark
result is exactly checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """pairs(src, dst) -> (vertex, component) where component is the
    min vertex id in the connected component. Vertices are those
    appearing in pairs."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("vertex"))
        .dropDuplicates()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.a, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def q_dedup_components(spark, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: components over the exact n-gram
    Jaccard pair list (dedup.q_dedup_ngram_jaccard)."""
    from .dedup import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    return connected_components(pairs, "doc_a", "doc_b").withColumnRenamed(
        "vertex", "doc_id"
    )


def sql_dedup_components() -> str:
    from .dedup import sql_jaccard_ctes

    return f"""
WITH RECURSIVE {sql_jaccard_ctes()},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jpairs
  UNION
  SELECT doc_b, doc_a FROM jpairs),
reach(v, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.v)
SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v"""


def q_dedup_keep_canonical(spark, sf_dir: str) -> DataFrame:
    """The dedup DECISION: every document maps to the canonical keeper
    of its near-dup cluster (min doc_id per component; singletons keep
    themselves) with a drop flag — the table a training-data pipeline
    anti-joins against the corpus. Components are cluster-local ids, so
    the keeper join is a shuffle on component id; singletons never
    enter the pair list and are appended map-side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    comp = q_dedup_components(spark, sf_dir)
    keeper = comp.groupBy("component").agg(
        F.min("doc_id").alias("keep_doc_id")
    )
    clustered = comp.join(keeper, "component").select(
        "doc_id", "keep_doc_id"
    )
    return (
        docs.join(clustered, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("keep_doc_id"), F.col("doc_id")).alias(
                "keep_doc_id"
            ),
        )
        .withColumn("is_duplicate", F.col("doc_id") != F.col("keep_doc_id"))
    )


def sql_dedup_keep_canonical() -> str:
    from .dedup import sql_jaccard_ctes

    return f"""
WITH RECURSIVE {sql_jaccard_ctes()},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jpairs
  UNION
  SELECT doc_b, doc_a FROM jpairs),
reach(v, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.v),
comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
keeper AS (
  SELECT component, min(doc_id) AS keep_doc_id FROM comp GROUP BY component)
SELECT d.doc_id,
       coalesce(k.keep_doc_id, d.doc_id) AS keep_doc_id,
       coalesce(k.keep_doc_id, d.doc_id) != d.doc_id AS is_duplicate
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
LEFT JOIN keeper k ON k.component = c.component"""


QUERIES = {
    "dedup_components": q_dedup_components,
    "dedup_keep_canonical": q_dedup_keep_canonical,
}
ORACLES = {
    "dedup_components": sql_dedup_components(),
    "dedup_keep_canonical": sql_dedup_keep_canonical(),
}
