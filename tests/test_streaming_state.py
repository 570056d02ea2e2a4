"""Custom stateful streaming operator (applyInPandasWithState):
cross-batch first-seen URL dedup.

Checks the three contracts that matter:
* within-batch dedup picks the earliest fetch per url,
* state survives a QUERY RESTART via the checkpoint (a re-fetch
  arriving in a later availableNow run is suppressed),
* the final output equals the batch groupBy(url).min(warc_ts) answer
  over everything ingested — which holds here because re-fetches
  arrive in later batches with LATER timestamps (the operator's
  contract is first-OBSERVED: an out-of-order earlier re-fetch in a
  later batch stays suppressed; see the operator docstring).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest


def _naive(ts_series: pd.Series) -> pd.Series:
    """tz-aware (UTC) or naive timestamps -> naive us — compares the
    instant regardless of the parquet timestamp representation."""
    s = pd.to_datetime(ts_series)
    if getattr(s.dt, "tz", None) is not None:
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    return s.astype("datetime64[us]")


def _pages_pdf(rows):
    return pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
            "lang": ["en"] * len(rows),
        }
    )


@pytest.mark.slow
def test_stateful_first_seen_dedup(spark, tmp_path):
    from remediner_spark.streaming import stream_dedup_first_seen

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    # batch 1: A twice (different ts) + B
    _pages_pdf(
        [
            ("A", "2024-01-01T10:00:00"),
            ("A", "2024-01-01T09:00:00"),
            ("B", "2024-01-01T11:00:00"),
        ]
    ).to_parquet(f"{pages_dir}/f1.parquet", index=False)
    # batch 2 (same run, second file): B re-fetch + C
    _pages_pdf(
        [
            ("B", "2024-01-01T12:00:00"),
            ("C", "2024-01-01T12:30:00"),
        ]
    ).to_parquet(f"{pages_dir}/f2.parquet", index=False)

    q = stream_dedup_first_seen(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got = pd.read_parquet(out_dir).sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == ["A", "B", "C"]
    # TIMESTAMP_MICROS parquet (session default since the data-skipping
    # feature; INT96 carries no stats) reads back tz-aware — compare
    # the INSTANT, not the string representation
    assert _naive(got["warc_ts"]).iloc[0] == pd.Timestamp("2024-01-01 09:00:00")

    # restart with new files: A re-fetched (must be suppressed by
    # checkpointed state), D new
    _pages_pdf(
        [
            ("A", "2024-01-01T13:00:00"),
            ("D", "2024-01-01T13:30:00"),
        ]
    ).to_parquet(f"{pages_dir}/f3.parquet", index=False)
    q2 = stream_dedup_first_seen(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    got = pd.read_parquet(out_dir).sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == ["A", "B", "C", "D"]

    # stream == batch: earliest fetch per url over everything ingested
    batch = (
        pd.read_parquet(pages_dir)
        .groupby("url", as_index=False)["warc_ts"]
        .min()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got["warc_ts"] = _naive(got["warc_ts"])
    batch["warc_ts"] = _naive(batch["warc_ts"])
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts"]], batch[["url", "warc_ts"]]
    )
