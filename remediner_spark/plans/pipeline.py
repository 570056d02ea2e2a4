"""End-to-end KG construction pipeline (SURVEY.md §3.4).

    pages scan -> filter(lang) -> Arrow-UDF extract (byte-identity) ->
    fused segment/NER/RE triple extraction -> entity linking
    (broadcast dict + LSH) -> salted canonicalization -> nodes/edges

Stages optionally run through plans.checkpoint.run_stage for
per-partition resumability with lineage + metrics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import build_edges, build_nodes, link_triples
from ..operators.linking import link_mentions, mentions_from_triples
from ..operators.ner import (
    GazetteerTagger,
    extract_triples_stage,
    with_inverse_triples,
)
from ..operators.text import filter_language, with_extracted_text
from .checkpoint import run_stage


def default_tagger_bc(spark: SparkSession):
    from ..sources.corpus import drug_lexicon, effect_lexicon

    return spark.sparkContext.broadcast(
        GazetteerTagger(drug_lexicon(), effect_lexicon())
    )


def run_pipeline(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    tagger_bc=None,
    checkpoint: bool = True,
    n_buckets: int = 32,
) -> dict:
    """Full run; returns metrics dict. Writes triples/nodes/edges
    parquet under out_dir; checkpoint manifests beside them."""
    tagger_bc = tagger_bc or default_tagger_bc(spark)
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    english = filter_language(pages)

    def extract_transform(df: DataFrame) -> DataFrame:
        extracted = (
            with_extracted_text(df)
            .withColumn(
                "extract_ok", F.col("extracted_text") == F.col("text")
            )
            .drop("text")
            .withColumnRenamed("extracted_text", "text")
        )
        return extract_triples_stage(
            extracted.drop("extract_ok"), tagger_bc
        )

    if checkpoint:
        triples = run_stage(
            spark, "triples", english, extract_transform, out_dir, n_buckets
        )
    else:
        triples = extract_transform(english)

    dictionary = spark.read.parquet(
        os.path.join(corpus_dir, "entity_dictionary.parquet")
    )
    mentions = mentions_from_triples(triples)
    linked = link_mentions(mentions, dictionary)
    nodes = build_nodes(linked)
    edges = build_edges(link_triples(triples, linked))

    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))
    edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges"))
    all_triples = with_inverse_triples(triples)
    all_triples.write.mode("overwrite").partitionBy("pred").parquet(
        os.path.join(out_dir, "triples_out")
    )

    link_counts = {
        r["link_method"]: r["n"]
        for r in linked.groupBy("link_method")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "n_triples": spark.read.parquet(os.path.join(out_dir, "triples_out")).count(),
        "n_nodes": spark.read.parquet(os.path.join(out_dir, "nodes")).count(),
        "n_edges": spark.read.parquet(os.path.join(out_dir, "edges")).count(),
        "link_counts": link_counts,
    }
