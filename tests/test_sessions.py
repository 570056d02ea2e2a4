"""Session boundary semantics: pins the empirical Spark behavior the
sessionize_native oracle is built on — session_window MERGES an event
landing at exactly prev + gap (a new session needs the gap STRICTLY
exceeded), matching q_sessionize's lag `>` rule."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_session_window_merges_exact_gap(spark):
    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",
            "2024-01-01 00:30:00",  # exactly the 30-min gap -> merged
            "2024-01-01 01:00:00.000001",  # 1us past the gap -> new
        ],
        format="ISO8601",
    ).astype("datetime64[us]")
    df = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 1, 1], "ts": ts})
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("session_window.start")
        .collect()
    )
    assert [r["n"] for r in sessions] == [2, 1]
