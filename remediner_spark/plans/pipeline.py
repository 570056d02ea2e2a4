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

from ..operators.graph import build_edges, link_triples
from ..operators.linking import mentions_from_triples
from ..operators.ner import (
    GazetteerTagger,
    extract_triples_stage,
    with_inverse_triples,
)
from ..operators.text import filter_language
from .checkpoint import run_stage


def default_tagger_bc(spark: SparkSession):
    from ..sources.corpus import drug_lexicon, effect_lexicon, typo_surface

    # the gazetteer stands in for the trained NER model, which
    # generalizes to noisy surfaces — include the corpus's typo class
    # in the model vocabulary (they are NOT dictionary aliases, so they
    # exercise the LSH linking path end-to-end)
    drugs = drug_lexicon()
    drugs = drugs + [typo_surface(d) for d in drugs]
    return spark.sparkContext.broadcast(
        GazetteerTagger(drugs, effect_lexicon())
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
        # html->text extraction fused into the same Python stage; the
        # byte-identity invariant is a separate audit action
        # (operators.text.extraction_mismatch_count, run by job.py)
        return extract_triples_stage(df, tagger_bc, extract_html=True)

    if checkpoint:
        triples = run_stage(
            spark, "triples", english, extract_transform, out_dir, n_buckets
        )
    else:
        triples = extract_transform(english)

    dictionary = spark.read.parquet(
        os.path.join(corpus_dir, "entity_dictionary.parquet")
    )
    # `triples` branches several ways (surfaces, mentions, id-join,
    # count): without materialization each branch re-executes the
    # upstream plan — for an unchecked-pointed run that's the whole
    # Python extraction stage again (measured 5x wall in build_graph
    # before caching). Linking caches at VOCABULARY grain only
    # (link_surfaces) and is broadcast back per consumer — the
    # mention-grain linked table is never materialized.
    if not checkpoint:  # checkpointed triples are already parquet-backed
        triples = triples.cache()
    from ..operators.linking import (
        attach_surface_links,
        link_surfaces,
        normalized_surface,
    )

    mentions = mentions_from_triples(triples)
    surfaces = (
        mentions.withColumn("surface_norm", normalized_surface("surface"))
        .select("surface_norm", "entity_type")
        .dropDuplicates()
    )
    surface_links = link_surfaces(surfaces, dictionary).cache()
    linked = attach_surface_links(mentions, surface_links)
    from ..operators.graph import nodes_from_edges

    edges = build_edges(link_triples(triples, surface_links)).cache()
    nodes = nodes_from_edges(edges, surface_links)

    # graph tables land in the Iceberg-style format (snapshot history,
    # manifest-planned reads, partition pruning) — sources/table.py
    from ..sources.table import write_table

    write_table(nodes, os.path.join(out_dir, "nodes"), mode="overwrite")
    write_table(edges, os.path.join(out_dir, "edges"), mode="overwrite")
    all_triples = with_inverse_triples(triples)
    write_table(
        all_triples,
        os.path.join(out_dir, "triples_out"),
        mode="overwrite",
        partition_by=["pred"],
    )

    link_counts = {
        r["link_method"]: r["n"]
        for r in linked.groupBy("link_method")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    from ..sources.table import read_table

    return {
        "n_triples": read_table(spark, os.path.join(out_dir, "triples_out")).count(),
        "n_nodes": read_table(spark, os.path.join(out_dir, "nodes")).count(),
        "n_edges": read_table(spark, os.path.join(out_dir, "edges")).count(),
        "link_counts": link_counts,
    }
