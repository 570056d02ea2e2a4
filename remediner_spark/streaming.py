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


def stream_dedup_first_seen(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    horizon: str = "24 hours",
):
    """Custom stateful operator (applyInPandasWithState): cross-batch
    first-seen URL dedup for a continuously-crawled corpus.

    A crawler re-fetches urls; the KG ingest wants exactly one page
    row per url even when re-fetches land in later micro-batches.
    Emission is FIRST-OBSERVED: the row emitted is the event-time
    earliest fetch *within the micro-batch that first sees the url*;
    re-fetches in later batches are suppressed whatever their
    timestamp (append sinks cannot retract, so a strictly
    event-time-earliest variant would buffer in state and emit on
    watermark timeout, trading a horizon of latency — not done here).
    Per-url state (a seen flag) lives in the streaming state store,
    restored from the checkpoint across restarts.

    Scale contract: state is bounded by the event-time horizon, not by
    total distinct urls — EventTimeTimeout drops a url's state once
    the watermark passes its last fetch + horizon (re-fetches arriving
    later than the horizon are treated as new pages, the standard
    late-data trade). At 10^12 docs the state store holds only the
    horizon's url window.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    horizon_ms = 24 * 3600 * 1000 if horizon == "24 hours" else None
    if horizon_ms is None:
        n, unit = horizon.split()
        horizon_ms = int(n) * {"hours": 3600_000, "minutes": 60_000}[unit]

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        best = None
        max_ts = None
        for pdf in pdfs:
            row = pdf.loc[pdf["warc_ts"].idxmin()]
            hi = pdf["warc_ts"].max()
            if best is None or row["warc_ts"] < best["warc_ts"]:
                best = row
            if max_ts is None or hi > max_ts:
                max_ts = hi
        seen = state.exists
        state.update((1,))
        # the timeout must be strictly beyond the current watermark:
        # a backlog batch whose max event time already trails the
        # watermark by more than the horizon would otherwise raise and
        # crash-loop the query on restart
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(
                int(pd.Timestamp(max_ts).value // 1_000_000) + horizon_ms,
                wm + 1,
            )
        )
        if seen or best is None:
            return  # url already emitted in an earlier micro-batch
        yield pd.DataFrame(
            [
                {
                    "url": key[0],
                    "warc_ts": best["warc_ts"],
                    "lang": best["lang"],
                }
            ]
        )

    pages = (
        stream_pages(spark, pages_dir)
        # watermarks require TIMESTAMP (with timezone); pandas-written
        # parquet often carries TIMESTAMP_NTZ — normalize first
        .select(
            "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "lang"
        )
        .withWatermark("warc_ts", horizon)
    )
    deduped = pages.groupBy("url").applyInPandasWithState(
        fn,
        outputStructType="url string, warc_ts timestamp, lang string",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
