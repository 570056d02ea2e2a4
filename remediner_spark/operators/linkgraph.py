"""Web link-graph construction over the crawl: href extraction, edge
aggregation, PageRank over the document graph.

Not in the reference (its input is pre-sentence ADE rows); this is the
web-graph dimension the north rule's Common-Crawl-style corpus
carries: every large-scale crawl pipeline extracts outlinks (for
frontier scheduling, host reputation, spam scoring) and ranks pages
over the induced graph.

Scale shape at 10^12 docs:
* extraction is PURE JVM — ``regexp_extract_all`` over the html
  column inside whole-stage codegen, no Python hop, map-only;
* edge aggregation shuffles on (src, dst) with map-side partial
  counts — edge-grain, the unavoidable minimum;
* PageRank reuses components.pagerank_fixed_point: integer fixed-point
  arithmetic (cross-engine exact), per-round localCheckpoint lineage
  truncation, join-on-src + groupBy-dst rounds — O(E) per round.

Oracle: DuckDB runs the IDENTICAL extraction (decode(blob) +
regexp_extract_all group 1) and the same fixed-point rounds as
iterative CTEs, so values match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import PR_ITERS, PR_BASE, PR_SCALE, pagerank_fixed_point

# group 1 of the href attribute; the same pattern string runs in both
# engines (Spark regexp_extract_all and DuckDB regexp_extract_all)
HREF_PATTERN = 'href="([^"]+)"'

_INTERNAL_PREFIX = "https://example.org/doc/"


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """pages(url, html) -> (src_url, dst_url), one row per href
    OCCURRENCE (multiplicity preserved — edge weights come from
    counting). JVM-only: decode + regexp_extract_all + explode."""
    return pages.select(
        F.col("url").alias("src_url"),
        F.explode(
            F.expr(
                "regexp_extract_all(decode(html, 'UTF-8'), "
                f"'{HREF_PATTERN}', 1)"
            )
        ).alias("dst_url"),
    )


def link_graph(pages: DataFrame) -> DataFrame:
    """Weighted edge list (src_url, dst_url, n_links)."""
    return (
        extract_outlinks(pages)
        .groupBy("src_url", "dst_url")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def _fixture_pages(spark: SparkSession) -> DataFrame:
    from ..sources.kg_fixture import ensure_kg_fixture

    d = ensure_kg_fixture()
    return spark.read.parquet(f"{d}/linked_pages.parquet")


def q_web_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return link_graph(_fixture_pages(spark))


def sql_web_link_graph() -> str:
    from ..sources.kg_fixture import ensure_kg_fixture

    d = ensure_kg_fixture()
    return f"""
SELECT src_url, dst_url, count(*) AS n_links FROM (
  SELECT p.url AS src_url,
         unnest(regexp_extract_all(decode(p.html), '{HREF_PATTERN}', 1))
           AS dst_url
  FROM read_parquet('{d}/linked_pages.parquet') p)
GROUP BY src_url, dst_url"""


def q_web_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the INTERNAL document graph (crawl-local edges;
    external asset hosts are sinks the crawl doesn't rank)."""
    edges = extract_outlinks(_fixture_pages(spark)).where(
        F.col("dst_url").startswith(_INTERNAL_PREFIX)
    ).select(F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
    return pagerank_fixed_point(edges).withColumnRenamed("node", "url")


def sql_web_link_pagerank() -> str:
    from ..sources.kg_fixture import ensure_kg_fixture

    d = ensure_kg_fixture()
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
WITH hrefs AS (
  SELECT p.url AS src,
         unnest(regexp_extract_all(decode(p.html), '{HREF_PATTERN}', 1))
           AS dst
  FROM read_parquet('{d}/linked_pages.parquet') p),
edges AS (
  SELECT src, dst FROM hrefs
  WHERE dst LIKE '{_INTERNAL_PREFIX}%'),
nodes AS (SELECT DISTINCT src AS node FROM edges),
od AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{",".join(steps)}
SELECT node AS url, r AS rank_fp FROM r{PR_ITERS}"""


QUERIES = {
    "web_link_graph": q_web_link_graph,
    "web_link_pagerank": q_web_link_pagerank,
}


def oracles() -> dict[str, str]:
    return {
        "web_link_graph": sql_web_link_graph(),
        "web_link_pagerank": sql_web_link_pagerank(),
    }
