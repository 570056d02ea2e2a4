"""Streaming KG edge maintenance (streaming.stream_edge_weights):
foreachBatch MERGE into the Iceberg-style table. Checks:

* final table state == the batch edge aggregation over the same pages
  (multiple micro-batches force real cross-batch merges),
* one snapshot per merged micro-batch (time travel across batches),
* manifest pruning: a single-bucket filter opens only that bucket's
  files,
* replayed batch ids are no-ops (the exactly-once guard).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from remediner_spark.operators.ner import extract_triples_stage
from remediner_spark.operators.text import filter_language
from remediner_spark.sources.corpus import generate_pages
from remediner_spark.sources.table import (
    pruned_file_count,
    read_table,
    table_snapshots,
)
from remediner_spark.streaming import stream_edge_weights

N_BUCKETS = 4


@pytest.fixture(scope="module")
def tagger_bc(spark):
    from remediner_spark.plans.pipeline import default_tagger_bc

    return default_tagger_bc(spark)


def _write_pages_split(tmp_path, n_pages=120):
    pages, _ = generate_pages(n_pages)
    d = tmp_path / "pages_stream"
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(
        [pages.iloc[:40], pages.iloc[40:80], pages.iloc[80:]]
    ):
        chunk.to_parquet(d / f"part-{i}.parquet", index=False)
    return str(d), pages


def test_stream_edges_match_batch(spark, tmp_path, tagger_bc):
    pages_dir, _ = _write_pages_split(tmp_path)
    table = str(tmp_path / "edges_table")
    ckpt = str(tmp_path / "ckpt_edges")

    q = stream_edge_weights(
        spark, pages_dir, table, ckpt, tagger_bc, n_buckets=N_BUCKETS
    )
    q.awaitTermination(120)

    # stream_pages caps files per trigger at 8 >= 3 files, but the
    # source may still split into multiple micro-batches; at least one
    # snapshot must exist and the LAST snapshot is the full state
    snaps = table_snapshots(table)
    assert len(snaps) >= 1
    # one merge file per touched bucket per commit (r5 fix: the agg's
    # shuffle fan-out used to land ~32 tiny files per bucket, and every
    # later batch paid their footer reads + scan planning)
    from remediner_spark.sources.table import _load_snapshots, _snap_files

    per_bucket: dict[str, int] = {}
    for f in _snap_files(table, _load_snapshots(table)[-1]):
        b = f["partition"]["bucket"]
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert max(per_bucket.values()) == 1

    got = (
        read_table(spark, table)
        .select("subj", "pred", "obj", "weight", "first_seen")
        .toPandas()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    pages_df = filter_language(spark.read.parquet(pages_dir))
    want = (
        extract_triples_stage(pages_df, tagger_bc)
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).alias("weight"),
            F.min("warc_ts").alias("first_seen"),
        )
        .toPandas()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    got["weight"] = got["weight"].astype("int64")
    want["weight"] = want["weight"].astype("int64")
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)

    # manifest pruning: one bucket's filter selects a strict subset
    sel, total = pruned_file_count(table, {"bucket": 0})
    assert 0 < sel < total

    # restart: re-running against the same checkpoint with an
    # exhausted source produces no new batches and therefore no new
    # snapshots; the (scope, batch_id) marker rides in the snapshots
    from remediner_spark.sources.table import _load_snapshots, _snap_files

    last_props = _load_snapshots(table)[-1]["properties"]
    assert last_props["scope"] == ckpt and last_props["batch_id"] >= 0
    n_snaps = len(table_snapshots(table))
    q2 = stream_edge_weights(
        spark, pages_dir, table, ckpt, tagger_bc, n_buckets=N_BUCKETS
    )
    q2.awaitTermination(120)
    assert len(table_snapshots(table)) == n_snaps
    assert _load_snapshots(table)[-1]["properties"] == last_props


def test_replayed_batch_id_is_noop(spark, tmp_path, tagger_bc):
    """Direct exactly-once semantics, driven through the factored
    merge function: a redelivery (same scope, same batch_id) is a
    no-op; a DIFFERENT stream instance (new scope) is new data and
    merges — the guard must never eat a legitimate new stream."""
    from remediner_spark.streaming import edge_merge_fn

    pages_dir, _ = _write_pages_split(tmp_path, n_pages=40)
    table = str(tmp_path / "edges_replay")
    pages_df = filter_language(spark.read.parquet(pages_dir))
    batch = extract_triples_stage(pages_df, tagger_bc)

    merge_a = edge_merge_fn(spark, table, scope="ckpt-a", n_buckets=N_BUCKETS)
    merge_a(batch, 0)
    once = read_table(spark, table).agg(F.sum("weight")).collect()[0][0]
    merge_a(batch, 0)  # redelivered micro-batch
    assert (
        read_table(spark, table).agg(F.sum("weight")).collect()[0][0] == once
    )
    # a different stream instance's batch 0 is NEW data
    merge_b = edge_merge_fn(spark, table, scope="ckpt-b", n_buckets=N_BUCKETS)
    merge_b(batch, 0)
    assert (
        read_table(spark, table).agg(F.sum("weight")).collect()[0][0]
        == 2 * once
    )
    # and scope-a's guard survives scope-b's interleaved commits
    merge_a(batch, 0)
    assert (
        read_table(spark, table).agg(F.sum("weight")).collect()[0][0]
        == 2 * once
    )


def test_stream_linked_mentions_match_batch(spark, tmp_path, tagger_bc):
    """Streaming exact dict-linking == the batch linker's dict stage
    (same helper) with synthetic ids for residuals."""
    import pandas as pd

    from remediner_spark.operators.graph import synthetic_entity_id
    from remediner_spark.operators.linking import (
        exact_dict_link,
        mentions_from_triples,
    )
    from remediner_spark.sources.corpus import generate_entity_dictionary
    from remediner_spark.streaming import stream_linked_mentions

    pages_dir, _ = _write_pages_split(tmp_path, n_pages=80)
    dictionary = spark.createDataFrame(generate_entity_dictionary())
    out = str(tmp_path / "linked_stream")
    ckpt = str(tmp_path / "ckpt_linked")
    q = stream_linked_mentions(
        spark, pages_dir, dictionary, out, ckpt, tagger_bc
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["url", "sent_idx", "surface_norm", "entity_type"])
        .reset_index(drop=True)
    )
    pages_df = filter_language(spark.read.parquet(pages_dir))
    exact = exact_dict_link(
        mentions_from_triples(extract_triples_stage(pages_df, tagger_bc)),
        dictionary,
    )
    want = (
        exact.select(
            "url", "warc_ts", "sent_idx", "surface_norm", "entity_type",
            F.coalesce(
                F.col("canonical_id"),
                synthetic_entity_id(
                    F.col("surface_norm"), F.col("entity_type")
                ),
            ).alias("entity_id"),
            F.coalesce(
                F.col("canonical_name"), F.col("surface_norm")
            ).alias("node_name"),
            F.when(F.col("canonical_id").isNotNull(), F.lit("dict"))
            .otherwise(F.lit("unlinked"))
            .alias("link_method"),
        )
        .toPandas()
        .sort_values(["url", "sent_idx", "surface_norm", "entity_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert set(got["link_method"]) == {"dict", "unlinked"}
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_stream_lsh_linking_equals_batch(spark, tmp_path, tagger_bc):
    """Per-micro-batch dict+MinHash-LSH linking (foreachBatch) must
    equal ONE batch run of the same linker over all pages, row for
    row — the linking decision is a pure function of (surface,
    static dictionary), so batch membership can't change any row."""
    import pandas as pd

    from remediner_spark.operators.graph import with_entity_ids
    from remediner_spark.operators.linking import (
        link_mentions,
        mentions_from_triples,
    )
    from remediner_spark.sources.corpus import generate_entity_dictionary
    from remediner_spark.streaming import (
        _LINKED_COLS,
        stream_linked_mentions_lsh,
    )

    pages_dir, _ = _write_pages_split(tmp_path, n_pages=80)
    dictionary = spark.createDataFrame(generate_entity_dictionary())
    out = str(tmp_path / "linked_lsh_stream")
    ckpt = str(tmp_path / "ckpt_linked_lsh")
    q = stream_linked_mentions_lsh(
        spark, pages_dir, dictionary, out, ckpt, tagger_bc
    )
    q.awaitTermination(180)

    key = ["url", "sent_idx", "surface_norm", "entity_type"]
    got = (
        spark.read.parquet(out)
        .select(*_LINKED_COLS)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pages_df = filter_language(spark.read.parquet(pages_dir))
    want = (
        with_entity_ids(
            link_mentions(
                mentions_from_triples(
                    extract_triples_stage(pages_df, tagger_bc)
                ),
                dictionary,
            )
        )
        .select(*_LINKED_COLS)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    # the typo surfaces exercise the LSH path in this corpus
    assert "lsh" in set(got["link_method"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
