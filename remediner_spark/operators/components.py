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


QUERIES = {"dedup_components": q_dedup_components}
ORACLES = {"dedup_components": sql_dedup_components()}
