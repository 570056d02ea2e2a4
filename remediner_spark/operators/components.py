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

from ..sources.scan import scan_parquet

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
    appearing in pairs.

    Min-label propagation: O(diameter) rounds — right for the shallow
    near-dup/alias graphs this engine builds. RAISES RuntimeError when
    max_iter rounds pass without reaching the fixpoint (an unconverged
    result silently mislabels components — the round-3 verdict's
    failure mode); for deep graphs (long alias chains) use
    connected_components_star, which converges in O(log n) rounds."""
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
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still changing): the graph's diameter "
        "exceeds max_iter — raise it, or use connected_components_star "
        "(O(log n) rounds) for deep graphs"
    )


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).dropDuplicates()


def _large_star(sym: DataFrame) -> DataFrame:
    """(u,v) symmetric -> {(v, m(u)) : v in N(u), v > u} where
    m(u) = min(N(u) + {u}); connects every larger neighbor to the
    local minimum."""
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("u", "_mn").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large->small, then per node u connect all its
    smaller neighbors (and u itself) to m(u) = min of them."""
    d = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        d.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
    )
    return out.filter(F.col("u") != F.col("v")).dropDuplicates()


def connected_components_star(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): each round is two join+agg passes and the edge set
    contracts toward a star forest in O(log n) rounds — independent of
    graph DIAMETER, so billion-edge alias chains converge where label
    propagation would need diameter rounds. Same output contract as
    connected_components (min vertex id per component); raises on
    non-convergence rather than returning silently-wrong labels."""
    e0 = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .dropDuplicates()
        .localCheckpoint()
    )
    vertices = (
        e0.select(F.col("u").alias("vertex"))
        .unionByName(e0.select(F.col("v").alias("vertex")))
        .dropDuplicates()
        .localCheckpoint()
    )
    edges = e0.filter(F.col("u") != F.col("v"))
    prev = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(_symmetrize(edges))).localCheckpoint()
        if prev is not None:
            # small_star output is canonical (child > root), so set
            # equality is an exact convergence test; the sets shrink
            # geometrically, keeping both anti-joins cheap
            changed = (
                edges.exceptAll(prev).count() + prev.exceptAll(edges).count()
            )
            if changed == 0:
                roots = edges.select(
                    F.col("u").alias("vertex"), F.col("v").alias("component")
                )
                return vertices.join(roots, "vertex", "left").select(
                    "vertex",
                    F.coalesce("component", "vertex").alias("component"),
                )
        prev = edges
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} "
        "rounds — pathological input (star rounds are O(log n); "
        "check for NaN/null vertex ids)"
    )


def q_dedup_components(spark, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: components over the exact n-gram
    Jaccard pair list (dedup.q_dedup_ngram_jaccard), via the
    O(log n)-round star algorithm (the scale path; the DuckDB
    recursive-CTE oracle pins it to the same fixpoint as the
    label-propagation formulation)."""
    from .dedup import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    return connected_components_star(
        pairs, "doc_a", "doc_b"
    ).withColumnRenamed("vertex", "doc_id")


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
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id")
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


# ---- fixed-point PageRank over the near-dup graph -------------------
#
# Iterative rank propagation is the second classic iterative graph
# primitive after components. Floating-point PageRank is NOT
# cross-engine reproducible (aggregation order changes the last ulp),
# so ranks are fixed-point integers: contribution = r // deg and
# new_r = BASE + (85 * sum) // 100 use only integer division and
# integer sums — commutative and exact in both engines, making the
# whole iteration hash-checkable. Iterations are a driver loop in
# Spark (shuffle on dst per round) and unrolled CTEs in DuckDB
# (aggregation is not allowed inside a recursive CTE term).

PR_SCALE = 1_000_000
PR_ITERS = 3
PR_BASE = (15 * PR_SCALE) // 100


def pagerank_fixed_point(
    edges: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """edges(src, dst) -> (node, rank_fp): integer fixed-point
    PageRank after `iters` rounds, damping 0.85, start rank PR_SCALE."""
    edges = edges.localCheckpoint()
    # the node set is a loop constant: checkpoint it once instead of
    # re-running the distinct from the edge checkpoint in every
    # round's plan (pre-joining deg into the edge list was also tried:
    # the extra edge-grain materialization cost more than the cheap
    # per-round broadcast deg join it replaced)
    nodes = (
        edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("r", F.lit(PR_SCALE).cast("long"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div deg").alias("c"))
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (
                    F.lit(PR_BASE)
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint()  # truncate lineage per round
        )
    return ranks.select("node", F.col("r").alias("rank_fp"))


def q_graph_pagerank(spark, sf_dir: str) -> DataFrame:
    """Document importance within near-dup clusters: PageRank over the
    undirected exact-Jaccard pair graph."""
    from .dedup import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return pagerank_fixed_point(edges).withColumnRenamed("node", "doc_id")


def sql_graph_pagerank() -> str:
    from .dedup import sql_jaccard_ctes

    steps = []
    for i in range(PR_ITERS):
        steps.append(f"""
s{i + 1} AS (
  SELECT e.dst, sum(r{i}.r // od.deg) AS s
  FROM edges e
  JOIN r{i} ON r{i}.node = e.src
  JOIN od ON od.src = e.src
  GROUP BY e.dst),
r{i + 1} AS (
  SELECT n.node,
         CAST({PR_BASE} + (85 * coalesce(s{i + 1}.s, 0)) // 100 AS BIGINT)
           AS r
  FROM nodes n LEFT JOIN s{i + 1} ON s{i + 1}.dst = n.node)""")
    return f"""
WITH {sql_jaccard_ctes()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jpairs
  UNION ALL
  SELECT doc_b, doc_a FROM jpairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
od AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{",".join(steps)}
SELECT node AS doc_id, r AS rank_fp FROM r{PR_ITERS}"""


# k-hop BFS bounds: 3 hops from the 8 lowest-id participating docs
KHOP_K = 3
KHOP_SOURCES = 8


def q_graph_khop(spark, sf_dir: str) -> DataFrame:
    """Minimum hop distance (<= KHOP_K) from a source set over the
    undirected near-dup graph — the neighborhood-expansion query a
    graph consumer runs around entities of interest. K FIXED rounds of
    frontier-join (frontier deduped to node grain each round, so work
    is nodes-touched, never walk-count); the per-(src,node) minimum
    falls out of one final aggregation. At 10^12 docs each round is
    one shuffle on the frontier key and the frontier is bounded by the
    k-hop neighborhood, not the graph."""
    from .dedup import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).dropDuplicates()
    # deterministic non-empty source set: the lowest participating ids
    srcs = (
        edges.select(F.col("doc_a").alias("src"))
        .distinct()
        .orderBy("src")
        .limit(KHOP_SOURCES)
    )
    reach = srcs.select(
        "src", F.col("src").alias("node"), F.lit(0).alias("dist")
    )
    frontier = reach
    for d in range(1, KHOP_K + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["doc_a"])
            .select(
                "src",
                F.col("doc_b").alias("node"),
                F.lit(d).alias("dist"),
            )
            .dropDuplicates(["src", "node"])
        )
        reach = reach.unionByName(nxt)
        frontier = nxt
    return reach.groupBy("src", "node").agg(
        F.min("dist").cast("long").alias("dist")
    )


def sql_graph_khop() -> str:
    from .dedup import sql_jaccard_ctes

    return f"""
WITH RECURSIVE {sql_jaccard_ctes()},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jpairs
  UNION
  SELECT doc_b, doc_a FROM jpairs),
srcs AS (
  SELECT DISTINCT a AS src FROM edges ORDER BY src
  LIMIT {KHOP_SOURCES}),
walk(src, node, dist) AS (
  SELECT src, src, 0 FROM srcs
  UNION
  SELECT w.src, e.b, w.dist + 1
  FROM walk w JOIN edges e ON e.a = w.node
  WHERE w.dist < {KHOP_K})
SELECT src, node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY src, node"""


QUERIES = {
    "dedup_components": q_dedup_components,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "graph_pagerank_neardup": q_graph_pagerank,
    "graph_khop_neardup": q_graph_khop,
}
ORACLES = {
    "dedup_components": sql_dedup_components(),
    "dedup_keep_canonical": sql_dedup_keep_canonical(),
    "graph_pagerank_neardup": sql_graph_pagerank(),
    "graph_khop_neardup": sql_graph_khop(),
}
