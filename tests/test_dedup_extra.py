"""Bloom decontamination guarantees + span-coverage sanity."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _need_testdata():
    import os

    if not os.path.exists(f"{SF_DIR}/documents.parquet"):
        pytest.skip("driver testdata not present")


def test_bloom_flags_superset_of_exact(spark):
    """No false negatives by construction: every doc the exact
    decontaminate flags must be flagged by the Bloom variant (the
    reverse can differ — those are the bounded false positives)."""
    from remediner_spark.operators.traindata import (
        q_decontaminate,
        q_decontaminate_bloom,
    )

    exact = q_decontaminate(spark, SF_DIR).toPandas().set_index("doc_id")
    bloom = (
        q_decontaminate_bloom(spark, SF_DIR).toPandas().set_index("doc_id")
    )
    assert set(exact.index) == set(bloom.index)
    joined = exact.join(bloom, lsuffix="_e", rsuffix="_b")
    fn = joined[joined["contaminated_e"] & ~joined["contaminated_b"]]
    assert len(fn) == 0, f"bloom false negatives: {fn.index.tolist()[:5]}"
    # and per-gram counts can only grow (every exact hit is a bloom hit)
    assert (joined["n_bloom_hits"] >= joined["n_hits"]).all()
    # sanity: the exact path flags something at this SF
    assert joined["contaminated_e"].any()


def test_span_coverage_bounds_and_known_dups(spark):
    """dup_kgrams <= total_kgrams everywhere; the corpus's built-in
    near-duplicates must show substantial span coverage; and a doc
    shorter than K words reports zero grams."""
    from remediner_spark.operators.dedup import (
        SPAN_K,
        q_dedup_ngram_jaccard,
        q_dedup_span_coverage,
    )

    cov = q_dedup_span_coverage(spark, SF_DIR).toPandas()
    assert (cov["dup_kgrams"] <= cov["total_kgrams"]).all()
    assert (cov["dup_kgrams"] >= 0).all()
    ndocs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(cov) == ndocs

    # near-dup pairs (word-3-gram jaccard >= 0.6) share long spans:
    # their span coverage at K=8 must be > 0
    pairs = q_dedup_ngram_jaccard(spark, SF_DIR).toPandas()
    if len(pairs):
        dup_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])
        by_id = cov.set_index("doc_id")
        frac = [
            by_id.loc[d, "dup_kgrams"] / max(by_id.loc[d, "total_kgrams"], 1)
            for d in dup_ids
        ]
        assert sum(f > 0 for f in frac) == len(frac)
    # short-doc guard: build one directly
    import pandas as pd

    from remediner_spark.operators.dedup import q_dedup_span_coverage as q

    short = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["one two three", "a b c d e f g h i"]}
    )
    d = str(pytest.importorskip("tempfile").mkdtemp())
    spark.createDataFrame(short).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = q(spark, d).toPandas().set_index("doc_id")
    assert out.loc[1, "total_kgrams"] == 0  # 3 words < K=8
    assert out.loc[2, "total_kgrams"] == 9 - SPAN_K + 1
    assert (out["dup_kgrams"] == 0).all()


def test_minhash_bucket_cap_star_links_hot_bucket(spark):
    """bucket_cap (the 100 TB hot-bucket guard): a boilerplate cluster
    collapses from all-pairs to an O(K) star reaching every member
    (same connected component downstream); buckets at or under the cap
    keep exact all-pairs candidates."""
    import pandas as pd
    from pyspark.sql import functions as F

    from remediner_spark.operators.dedup import (
        _shingles_expr,
        minhash_pairs,
    )

    boiler = (
        "subscribe to our newsletter for updates terms of service "
        "privacy policy all rights reserved"
    )
    n_hot = 12
    rows = [(i, boiler) for i in range(n_hot)] + [
        (100 + i,
         f"unique document number {i} about topic {i * 7} with "
         f"distinct content tail {i * 13}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).select("doc_id", _shingles_expr(F.col("text")).alias("sh"))

    uncapped = minhash_pairs(docs).toPandas()
    capped = minhash_pairs(docs, bucket_cap=4).toPandas()

    hot_unc = uncapped[(uncapped.doc_a < n_hot) & (uncapped.doc_b < n_hot)]
    hot_cap = capped[(capped.doc_a < n_hot) & (capped.doc_b < n_hot)]
    assert len(hot_unc) == n_hot * (n_hot - 1) // 2
    # star: every non-hub hot doc linked to the hub (min doc_id = 0)
    assert sorted(map(tuple, hot_cap.values.tolist())) == [
        (0, b) for b in range(1, n_hot)
    ]
    # cold pairs identical under the cap
    cold_unc = uncapped[(uncapped.doc_a >= n_hot) | (uncapped.doc_b >= n_hot)]
    cold_cap = capped[(capped.doc_a >= n_hot) | (capped.doc_b >= n_hot)]
    assert sorted(map(tuple, cold_unc.values.tolist())) == sorted(
        map(tuple, cold_cap.values.tolist())
    )


def test_url_canonicalization_semantics(spark):
    """Canonical-URL dedup key: case folds, default port strips,
    fragment drops, tracking params go, surviving params sort,
    trailing slash trims (root '/' preserved) — and distinct canonical
    forms collapse the synthetic variant space."""
    import pandas as pd
    from pyspark.sql import functions as F

    from remediner_spark.operators.textstats import canonical_url_expr

    cases = {
        "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#f":
            "https://www.ex.com/a/b?a=1&b=2",
        "https://www.ex.com/a/b?a=1&b=2": "https://www.ex.com/a/b?a=1&b=2",
        "http://EX.com:80/": "http://ex.com/",
        "http://ex.com:8080/x": "http://ex.com:8080/x",  # non-default kept
        "https://ex.com:80/x": "https://ex.com:80/x",  # 80 not https default
        "http://ex.com/x?gclid=1&fbclid=2": "http://ex.com/x",
        "https://ex.com/x/": "https://ex.com/x",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"url": list(cases)})
    ).select("url", canonical_url_expr(F.col("url")).alias("canon"))
    got = {r["url"]: r["canon"] for r in df.collect()}
    assert got == cases

    # the gate query's synthetic variants actually collapse
    from remediner_spark.operators.textstats import q_url_canonicalize

    out = q_url_canonicalize(spark, "/root/testdata/sf0.001")
    n_raw = out.select("url_raw").distinct().count()
    n_canon = out.select("url_canon").distinct().count()
    assert n_canon < n_raw


def test_lm_score_discriminates_gibberish(spark, tmp_path):
    """The bigram-LM quality signal actually discriminates: documents
    with consistent word ORDER outscore shuffles of the very same
    words (unigram stats identical by construction — only the bigram
    structure separates them)."""
    import pandas as pd

    from remediner_spark.operators.textstats import q_text_lm_score

    rng = __import__("random").Random(5)
    sent = ("the quick brown fox jumps over the lazy dog near the old "
            "stone bridge").split()
    rows = []
    for i in range(80):  # in-distribution: rotations keep bigram order
        k = i % len(sent)
        words = (sent[k:] + sent[:k]) * 4
        rows.append((i, " ".join(words), "en", "real", 0))
    for i in range(20):  # gibberish: same words, shuffled
        words = (sent * 4)[:]
        rng.shuffle(words)
        rows.append((10_000 + i, " ".join(words), "en", "gib", 0))
    docs = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path)
    docs.to_parquet(f"{d}/documents.parquet", index=False)
    out = q_text_lm_score(spark, d).toPandas()
    real = out[out.doc_id < 10_000]["avg_p"]
    fake = out[out.doc_id >= 10_000]["avg_p"]
    assert len(real) == 80 and len(fake) == 20
    assert fake.max() < 0.5 * real.min()
    assert ((out["avg_p"] > 0) & (out["avg_p"] <= 1)).all()


def test_dedup_paragraph_semantics(spark, tmp_path):
    """Boilerplate paragraphs survive only at their global first
    occurrence; unique paragraphs all survive; reassembly preserves
    in-document order."""
    import pandas as pd

    from remediner_spark.operators.dedup import (
        BOILER_A,
        PARA_W,
        q_dedup_paragraph,
    )

    # 6 docs x 36 words = 3 paragraphs each; vocab disjoint per doc so
    # every non-boilerplate paragraph is globally unique
    rows = []
    for d in range(6):
        words = [f"w{d}x{j}" for j in range(3 * PARA_W)]
        rows.append((d, " ".join(words), "en", "s", 0))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    out = (
        q_dedup_paragraph(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out["n_total"] == 3).all()
    # boilerplate A hits (d+i)%4==0, B hits (d+i)%9==0: doc 0 keeps
    # both (first occurrence), later docs lose repeats
    assert out.loc[0, "n_kept"] == 3
    total_boiler_kept = sum(
        r.count(BOILER_A) for r in out["text_dedup"]
    )
    assert total_boiler_kept == 1  # global first occurrence only
    assert (out["n_kept"] <= out["n_total"]).all()
    assert (out["n_kept"] < 3).any()  # some doc actually lost a para
    # order preserved: doc 5 has no boilerplate slots at i where
    # (5+i)%4==0 -> i=3 (out of range); (5+i)%9==0 -> i=4 (out of
    # range): all three unique paras survive in original order
    assert out.loc[5, "text_dedup"] == " ".join(
        f"w5x{j}" for j in range(3 * PARA_W)
    )
    assert out.loc[5, "n_kept"] == 3


def test_heavy_hitters_exact_vs_full_count(spark):
    """The two-round TPUT result must equal the brute-force full
    groupBy top-k exactly (same words, same counts, same order) — the
    certificate claims exactness, so we hold it to it."""
    import pyspark.sql.functions as F

    from remediner_spark.operators.traindata import (
        HH_K,
        q_topk_heavy_hitters,
    )

    got = q_topk_heavy_hitters(spark, SF_DIR).toPandas()
    full = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(HH_K)
        .toPandas()
    )
    assert len(got) == HH_K
    assert got["word"].tolist() == full["word"].tolist()
    assert got["cnt"].tolist() == full["cnt"].tolist()


def test_heavy_hitters_certificate_raises_on_flat_counts(spark, tmp_path):
    """A uniform-count vocabulary defeats any local-top-M candidate
    set (the (M+1)-th local count ties the k-th global count), and the
    operator must REFUSE — raise the certificate error — rather than
    return a silently arbitrary top-k."""
    import pandas as pd
    import pytest as _pytest

    from remediner_spark.operators.traindata import q_topk_heavy_hitters

    # 200 words, each confined to one doc with exactly 10 copies: every
    # word's global count is 10 no matter how the scan partitions.
    rows = [
        (i, " ".join([f"w{i:03d}"] * 10), "en", "s", 0) for i in range(200)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    with _pytest.raises(ValueError, match="certificate"):
        q_topk_heavy_hitters(spark, str(tmp_path))


def test_dedup_incremental_verdicts(spark, tmp_path):
    """Hand corpus: batch (src0) has an exact dup, a near dup, a
    unique doc, and a normalized-only match (lower+trim) of an index
    doc; exact wins precedence over near-dup and match_doc_id is the
    smallest matching index doc."""
    import pandas as pd

    from remediner_spark.operators.dedup import q_dedup_incremental

    words = [f"w{i}" for i in range(20)]
    base = " ".join(words)                      # 20 words, 18 3-grams
    near_b = " ".join(words[:-1] + ["NEARY"])   # J vs base = 15/21 >= 3/5
    near_i = " ".join(words[:-1] + ["NEARX"])
    uniq = " ".join(f"unique{i}" for i in range(20))
    d = tmp_path / "inc"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 10, 11],
            "source": ["src0"] * 4 + ["src1", "src2"],
            "text": [
                base,                    # 1: exact dup of 10
                near_b,                  # 2: near dup of 10 and 11
                uniq,                    # 3: keep
                "  " + base.upper() + " ",  # 4: exact after lower+trim
                base,                    # 10: index
                near_i,                  # 11: index
            ],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {
        r["doc_id"]: (r["verdict"], r["match_doc_id"])
        for r in q_dedup_incremental(spark, str(d)).collect()
    }
    assert rows[1] == ("exact", 10)
    assert rows[2] == ("near_dup", 10)
    assert rows[3] == ("keep", None)
    assert rows[4] == ("exact", 10)
    assert set(rows) == {1, 2, 3, 4}


class TestFreqCMS:
    def test_overcount_never_negative_and_collisions_exercised(self, spark):
        """CMS guarantee: est >= true for every probe (min over rows of
        bucket counts can only overcount); with CMS_W=16 at sf0.001 the
        corpus vocabulary collides, so at least one probe overcounts —
        the sketch is exercised, not vacuous."""
        from remediner_spark.operators.traindata import q_freq_cms

        rows = q_freq_cms(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 20
        assert all(r["overcount"] >= 0 for r in rows)
        assert all(r["cms_est"] == r["true_count"] + r["overcount"]
                   for r in rows)
        assert any(r["overcount"] > 0 for r in rows)

    def test_estimate_matches_driver_recomputation(self, spark):
        """The Spark estimate equals a from-scratch driver CMS built
        with the same hash family (independent derivation)."""
        import hashlib
        from collections import Counter

        import duckdb

        from remediner_spark.operators.traindata import (
            CMS_D, CMS_W, q_freq_cms,
        )

        con = duckdb.connect()
        texts = [t[0] for t in con.execute(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()]
        words = [w for t in texts for w in t.split(" ")]

        def bucket(r, w):
            h = int(hashlib.md5(f"cms{r}|{w}".encode()).hexdigest()[:8], 16)
            return h % CMS_W

        cells = Counter()
        for w in words:
            for r in range(CMS_D):
                cells[(r, bucket(r, w))] += 1

        def est(w):
            return min(cells[(r, bucket(r, w))] for r in range(CMS_D))

        for row in q_freq_cms(spark, "/root/testdata/sf0.001").collect():
            assert row["cms_est"] == est(row["word"]), row["word"]
