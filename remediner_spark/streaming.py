"""Structured Streaming ingest variant of the triple-extraction stage.

The north rule prescribes a batch pipeline with resumable checkpoints
(SURVEY.md §1.2), but a continuously-crawled corpus lands as a growing
directory of page files; this module runs the SAME fused extraction
stage incrementally: ``readStream`` over the pages directory ->
mapInPandas (identical code object as batch — Spark streams support
arbitrary stateless transforms) -> parquet sink with its own streaming
checkpoint. `Trigger.AvailableNow` drains the backlog and stops, which
both bounds test runtime and models scheduled micro-batch catch-up
runs on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.ner import extract_triples_stage


def stream_pages(
    spark: SparkSession, pages_dir: str, schema=None
) -> DataFrame:
    """File-source stream over a directory of pages parquet files."""
    if schema is None:
        schema = spark.read.parquet(pages_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )


def stream_windowed_triple_counts(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    tagger_bc,
    window: str = "1 hour",
    watermark: str = "2 hours",
    lang: str = "en",
):
    """Stateful streaming: triples per predicate per event-time window.

    Watermarked on `warc_ts` (crawl time) so late-arriving pages update
    open windows until the watermark passes, then state is dropped —
    the standard late-data contract. `update` mode emits changed
    windows per micro-batch; the parquet-compatible sink here is the
    append-on-close variant, so output lands once a window finalizes.
    """
    pages = stream_pages(spark, pages_dir).filter(F.col("lang") == lang)
    triples = extract_triples_stage(pages, tagger_bc)
    counts = (
        triples.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "pred", "n")
    )
    return (
        counts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def stream_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    tagger_bc,
    lang: str = "en",
):
    """Start an available-now streaming query: pages dir -> triples
    parquet. Returns the StreamingQuery (await with .awaitTermination())."""
    pages = stream_pages(spark, pages_dir).filter(F.col("lang") == lang)
    triples = extract_triples_stage(pages, tagger_bc)
    return (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
