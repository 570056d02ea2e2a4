"""Sitemap-protocol ingestion: render per-shard sitemap XML for the
crawl corpus, then parse it back to typed (shard, loc, lastmod,
priority) records — the discovery surface next to robots.txt that
every crawler consumes before scheduling fetches.

The sitemaps.org protocol caps one sitemap file at 50,000 URLs; large
sites shard and publish a sitemap index. The fixture mirrors that:
pages are sharded by doc sequence (SITEMAP_SHARD per file), each
shard's ``<urlset>`` document is assembled from sorted ``<url>``
entries, and the PARSER — the product under test — recovers the
records with the same lazy-quantified block regex in both engines.
Generation is fixture synthesis (the corpus ships no sitemap file);
the parse is the real work, exactly the synth-from-doc_id pattern the
WARC/robots/multimodal gates use.

Scale shape at 10^12 docs: entry rendering is map-only JVM string
concat; the per-shard assembly shuffles on the shard key with
protocol-bounded group size (<= 50k entries — the spec's own cap, so
no group can blow up); parsing is map-only ``regexp_extract_all`` +
explode inside codegen, no Python hop. The DuckDB oracle renders and
parses the identical strings (string_agg ORDER BY / list sort,
regexp_extract_all), so values match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# entries per sitemap file (the protocol cap is 50k; the fixture uses
# a small shard so multiple shards actually materialize at 400 pages)
SITEMAP_SHARD = 50

_BLOCK_RE = "<url>(.*?)</url>"


def render_sitemaps(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts) -> (shard, xml): one ``<urlset>`` document
    per shard of SITEMAP_SHARD docs, entries sorted — all JVM exprs."""
    ent = pages.select(
        (
            F.regexp_extract("url", r"doc/(\d+)$", 1).cast("int")
            / F.lit(SITEMAP_SHARD)
        ).cast("int").alias("shard"),
        F.concat(
            F.lit("<url><loc>"),
            F.col("url"),
            F.lit("</loc><lastmod>"),
            F.date_format("warc_ts", "yyyy-MM-dd"),
            F.lit("</lastmod><priority>0."),
            (F.length("url") % 10).cast("string"),
            F.lit("</priority></url>"),
        ).alias("entry"),
    )
    return ent.groupBy("shard").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws("", F.sort_array(F.collect_list("entry"))),
            F.lit("</urlset>"),
        ).alias("xml")
    )


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(shard, xml) -> typed url records: explode ``<url>`` blocks,
    then extract loc/lastmod/priority per block — map-only codegen."""
    blocks = sitemaps.select(
        "shard",
        F.explode(
            F.expr(f"regexp_extract_all(xml, '{_BLOCK_RE}', 1)")
        ).alias("b"),
    )
    return blocks.select(
        "shard",
        F.regexp_extract("b", "<loc>([^<]+)</loc>", 1).alias("loc"),
        F.regexp_extract("b", "<lastmod>([^<]+)</lastmod>", 1).alias(
            "lastmod"
        ),
        F.regexp_extract("b", "<priority>([^<]+)</priority>", 1).alias(
            "priority"
        ),
    )


def q_sitemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .kg_fixture import ensure_kg_fixture

    d = ensure_kg_fixture()
    pages = spark.read.parquet(f"{d}/pages.parquet").select("url", "warc_ts")
    return parse_sitemaps(render_sitemaps(pages))


def sql_sitemap_ingest() -> str:
    from .kg_fixture import ensure_kg_fixture

    d = ensure_kg_fixture()
    return f"""
WITH pages AS (
  SELECT url, warc_ts FROM read_parquet('{d}/pages.parquet')),
ent AS (
  SELECT CAST(regexp_extract(url, 'doc/(\\d+)$', 1) AS INT)
           // {SITEMAP_SHARD} AS shard,
         '<url><loc>' || url || '</loc><lastmod>'
           || strftime(warc_ts, '%Y-%m-%d')
           || '</lastmod><priority>0.'
           || CAST(length(url) % 10 AS VARCHAR)
           || '</priority></url>' AS entry
  FROM pages),
xml AS (
  SELECT shard,
         '<urlset>' || string_agg(entry, '' ORDER BY entry)
           || '</urlset>' AS doc
  FROM ent GROUP BY shard),
blocks AS (
  SELECT shard, unnest(regexp_extract_all(doc, '{_BLOCK_RE}', 1)) AS b
  FROM xml)
SELECT shard,
       regexp_extract(b, '<loc>([^<]+)</loc>', 1) AS loc,
       regexp_extract(b, '<lastmod>([^<]+)</lastmod>', 1) AS lastmod,
       regexp_extract(b, '<priority>([^<]+)</priority>', 1) AS priority
FROM blocks"""


QUERIES = {"sitemap_ingest": q_sitemap_ingest}


def oracles() -> dict[str, str]:
    return {"sitemap_ingest": sql_sitemap_ingest()}
