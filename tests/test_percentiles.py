"""Percentiles: the approx sketch path is bounded against the exact
rank-selection path (|rank(approx) - target_rank| <= n/accuracy)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    import os

    if not os.path.exists(f"{SF_DIR}/events.parquet"):
        pytest.skip("driver testdata not present")
    return spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()


def test_approx_certificate_all_within_bound(spark):
    from remediner_spark.operators.relational import (
        PCTS,
        q_event_percentiles_approx,
    )

    out = q_event_percentiles_approx(spark, SF_DIR).toPandas()
    n_types = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type").distinct().count()
    )
    assert len(out) == n_types * len(PCTS)
    assert out["within_bound"].all()


def test_approx_rank_error_vs_exact(spark, events):
    """Driver-side re-check of the same guarantee with pandas as the
    referee: the element percentile_approx returns must sit within
    n/accuracy ranks of the exact path's floor((n-1)*p/100) target."""
    from remediner_spark.operators.relational import (
        APPROX_PCT_ACCURACY,
        PCTS,
        q_event_percentiles_approx,
    )

    # re-run the SKETCH only (grab the raw approx values via the same
    # aggregate the operator uses)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ap = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value",
                F.array(*[F.lit(p / 100.0) for p in PCTS]),
                F.lit(APPROX_PCT_ACCURACY),
            ).alias("vals")
        )
        .toPandas()
    )
    for _, row in ap.iterrows():
        vals = sorted(
            events.loc[events["event_type"] == row["event_type"], "value"]
        )
        n = len(vals)
        tol = n // APPROX_PCT_ACCURACY + 2
        for p, v in zip(PCTS, row["vals"]):
            target = (n - 1) * p // 100
            r_lo = sum(1 for x in vals if x < v)
            r_hi = sum(1 for x in vals if x <= v) - 1
            assert r_lo - tol <= target <= r_hi + tol, (
                row["event_type"], p, v, target, r_lo, r_hi, tol,
            )
    # and the certificate the gate checks agrees
    out = q_event_percentiles_approx(spark, SF_DIR).toPandas()
    assert out["within_bound"].all()
