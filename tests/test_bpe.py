"""BPE trainer unit pins: greedy non-overlap merge semantics and a
tiny end-to-end train on a crafted corpus with a hand-derived answer.

The sf corpora have a small fixed vocabulary that may never exercise
the left==right run case, so pin it here explicitly: "aaaa" under
rule (a,a) must become [aa, aa] (positions 1-2 and 3-4), never an
overlapping triple.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from remediner_spark.operators.bpe import _merge_expr, train_bpe


def _apply(spark, left, right, syms):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    out = df.select(_merge_expr(left, right)(F.col("syms")).alias("m"))
    return out.collect()[0]["m"]


def test_merge_greedy_left_to_right(spark):
    assert _apply(spark, "a", "b", ["a", "b", "c", "a", "b"]) == [
        "ab",
        "c",
        "ab",
    ]


def test_merge_overlap_run_left_eq_right(spark):
    # greedy keeps odd positions of the run: aaaa -> [aa, aa],
    # aaaaa -> [aa, aa, a]
    assert _apply(spark, "a", "a", ["a"] * 4) == ["aa", "aa"]
    assert _apply(spark, "a", "a", ["a"] * 5) == ["aa", "aa", "a"]


def test_merge_no_rematch_of_merged_token(spark):
    # after (a,b)->ab, a following b must NOT merge again ([ab, b]
    # stays): the rule matches symbols, not the merged token
    assert _apply(spark, "a", "b", ["a", "b", "b"]) == ["ab", "b"]


def test_merge_noop_and_singleton(spark):
    assert _apply(spark, "x", "y", ["a", "b"]) == ["a", "b"]
    assert _apply(spark, "a", "b", ["a"]) == ["a"]


def test_train_bpe_hand_derived(spark, tmp_path):
    # corpus: "low low lower" x2 + "aaaa"
    # vocab: low:4, lower:2, aaaa:1
    # step0 pairs: (l,o):6 (o,w):6 (w,e):2 (e,r):2 (a,a):3
    #   tie (l,o) vs (o,w) -> lexicographic: (l,o) wins, weight 6
    # step1: (lo,w):6 wins
    # step2: (a,a):3 -> aaaa becomes [aa, aa] (greedy)
    import pandas as pd

    d = tmp_path / "bpecorpus"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["low low lower", "low low lower", "aaaa"],
        }
    ).to_parquet(d / "documents.parquet")
    rules, final = train_bpe(spark, str(d), k=3)
    assert [(l, r, w) for _, l, r, w in rules] == [
        ("l", "o", 6),
        ("lo", "w", 6),
        ("a", "a", 3),
    ]
    toks = {
        row["word"]: row["syms"]
        for row in final.collect()
    }
    final.unpersist()
    assert toks["low"] == ["low"]
    assert toks["lower"] == ["low", "e", "r"]
    assert toks["aaaa"] == ["aa", "aa"]


def test_bpe_doc_tokens_hand_derived(spark, tmp_path):
    import pandas as pd

    from remediner_spark.operators.bpe import q_bpe_doc_tokens

    d = tmp_path / "bpecorpus2"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["low low lower", "low low lower", "aaaa"],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in q_bpe_doc_tokens(spark, str(d), k=3).collect()
    }
    # low=[low](1), lower=[low,e,r](3), aaaa=[aa,aa](2)
    assert rows == {1: (3, 5), 2: (3, 5), 3: (1, 2)}
