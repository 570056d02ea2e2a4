"""Physical-plan properties that must hold at scale (pushdown, pruning,
broadcast, top-k limit) — the cheap in-CI slice of tools/explain_audit."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lang_filter_pushed_to_scan(spark):
    from remediner_spark.operators.relational import q_r13_word_explode

    plan = plan_of(q_r13_word_explode(spark, SF))
    assert "EqualTo(lang,en)" in plan


def test_scan_column_pruned(spark):
    from remediner_spark.operators.textstats import q_text_tokens

    plan = plan_of(q_text_tokens(spark, SF))
    read_schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ][0]
    assert "text" in read_schema and "source" not in read_schema


def test_dim_join_broadcasts(spark):
    from remediner_spark.operators.relational import q_join_broadcast_dims

    plan = plan_of(q_join_broadcast_dims(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_window_group_limit(spark):
    from remediner_spark.operators.relational import q_window_topk

    plan = plan_of(q_window_topk(spark, SF))
    assert "WindowGroupLimit" in plan


def test_fused_stage_prunes_html(spark, corpus_dir):
    from remediner_spark.operators.ner import extract_triples_stage
    from remediner_spark.operators.text import filter_language
    from remediner_spark.plans.pipeline import default_tagger_bc

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    df = extract_triples_stage(filter_language(pages), default_tagger_bc(spark))
    read_schema = [
        ln for ln in plan_of(df).splitlines() if "ReadSchema" in ln
    ][0]
    assert "html" not in read_schema
    assert "text" in read_schema

def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed+sorted on the key compile
    to a SortMergeJoin with NO Exchange on either side — the 100 TB
    amortize-the-shuffle-at-ingest layout (sources/bucketed.py)."""
    from remediner_spark.sources.bucketed import read_bucketed, write_bucketed

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_bucketed(
        docs.select("doc_id", "text"), "t_docs_a", "doc_id",
        path=str(tmp_path / "a"),
    )
    write_bucketed(
        docs.select("doc_id", "lang"), "t_docs_b", "doc_id",
        path=str(tmp_path / "b"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join strategy decision (broadcast would trivially
        # avoid the Exchange without proving bucket co-location)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "t_docs_a").join(
            read_bucketed(spark, "t_docs_b"), "doc_id"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_docs_a")
        spark.sql("DROP TABLE IF EXISTS t_docs_b")


def test_graph_edges_single_extraction_pass(spark, corpus_dir):
    """The surface-first graph formulation must run the Python
    extraction stage EXACTLY once in the edge plan (one fused pass:
    extraction -> salted surface-pair agg), never once per consumer —
    the multi-pass regression this round removed. The plan must also
    carry no InMemoryRelation below the aggregation (triples are
    streamed, not cached)."""
    from remediner_spark.operators.graph import build_graph
    from remediner_spark.operators.ner import extract_triples_stage
    from remediner_spark.operators.text import filter_language
    from remediner_spark.plans.pipeline import default_tagger_bc
    from remediner_spark.sources.corpus import generate_entity_dictionary

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    triples = extract_triples_stage(
        filter_language(pages), default_tagger_bc(spark)
    )
    dictionary = spark.createDataFrame(generate_entity_dictionary())
    nodes, edges = build_graph(triples, dictionary)
    plan = plan_of(edges)
    # formatted explain re-prints cached subtrees inside every
    # InMemoryRelation, so count UNIQUE operator ids, not text hits
    import re

    ids = set(re.findall(r"^\((\d+)\) MapInPandas", plan, re.MULTILINE))
    assert len(ids) == 1, plan[:2000]


def test_cache_scope_releases_everything(spark):
    """session.cache_scope drops SQL caches and raw RDD persists on
    exit — the unpersist discipline bench.py applies between queries."""
    from remediner_spark.session import cache_scope, release_caches

    release_caches(spark)  # clean slate
    with cache_scope(spark):
        df = spark.range(100).cache()
        df.count()
        rdd = spark.sparkContext.parallelize(range(10)).persist()
        rdd.count()
        assert len(list(
            spark.sparkContext._jsc.getPersistentRDDs().keys()
        )) >= 1
    assert list(spark.sparkContext._jsc.getPersistentRDDs().keys()) == []


def test_link_surfaces_single_winner_aggregation(spark):
    """Regression pin for the r5 linking plan: winner selection is ONE
    aggregation — no Window node (the old dropDuplicates + row_number
    pair cost two vocabulary-grain shuffles and a sort)."""
    import pandas as pd

    from remediner_spark.operators.linking import link_surfaces
    from remediner_spark.sources.corpus import generate_entity_dictionary

    surfaces = spark.createDataFrame(
        pd.DataFrame(
            {"surface_norm": [f"s{i}" for i in range(20)],
             "entity_type": ["DRUG"] * 10 + ["EFFECT"] * 10}
        )
    )
    dictionary = spark.createDataFrame(generate_entity_dictionary())
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        link_surfaces(surfaces, dictionary).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    # struct-min compiles to SortAggregate (still partial+final — one
    # exchange), never a Window sort
    assert "SortAggregate" in plan
