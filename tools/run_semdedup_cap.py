"""SemDeDup production-cap evidence (r7 verdict #7).

CELL_CAP=60 is gate-scale; this measures the guard at a PRODUCTION
cap on a degenerate-cell synthetic: one k-means cell holding K
near-identical vectors (what a near-duplicate-saturated crawl
produces) plus a uniform cold tail. Two K values per mode show the
growth law directly:

* capped (cap=10_000, the production sizing named in the module
  docstring): the hot cell star-links — candidate volume K-1, wall
  ~flat as K doubles;
* uncapped: candidate volume K(K-1)/2, wall grows ~4x as K doubles
  (run at smaller K — extrapolated to the capped runs' K=40k the
  uncapped pair count is 800M / ~23 min at the measured 580k pairs/s, the r6 JVM-kill class; the
  cap turns that into a 4 s leg).

The synthetic bypasses the k-means fit (semdedup_over_cells) — the
fit writes the SHARED oracle centroids side file, and the cell
structure is the controlled variable here anyway.

Usage: python tools/run_semdedup_cap.py
Writes BENCH/semdedup_cap.json and prints a markdown table for
SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64  # the testdata embedding width
N_COLD_CELLS = 50
COLD_SIZE = 50
PROD_CAP = 10_000


def synth_assigned(spark, k_hot: int):
    """assigned(vec_id, v, cell): cell 0 holds k_hot near-identical
    unit-ish vectors (pairwise cosine ~1 — every pair passes the
    threshold, so the timed work includes the verdict agg, not just
    enumeration); cells 1..N_COLD_CELLS hold hash-random vectors."""
    from pyspark.sql import functions as F

    n = k_hot + N_COLD_CELLS * COLD_SIZE
    base = spark.range(n)
    is_hot = F.col("id") < k_hot

    def elem(j):
        h = (
            F.pmod(
                F.xxhash64(F.concat_ws("_", F.col("id"), j)), F.lit(1000)
            ).cast("double")
            / 1000.0
        )
        return F.when(
            is_hot, F.when(j == 1, F.lit(1.0)).otherwise(h * 0.001)
        ).otherwise(h)

    return base.select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(DIM)), elem).alias("v"),
        F.when(is_hot, F.lit(0))
        .otherwise((F.col("id") % N_COLD_CELLS) + 1)
        .cast("long")
        .alias("cell"),
    )


def main() -> int:
    from remediner_spark.operators.semdedup import semdedup_over_cells
    from remediner_spark.session import get_spark, release_caches

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="semdedup-cap", cores=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    # uncapped legs get ONE timed run (the signal is 10-100x, not
    # +-10%, and a min-of-2 would double a multi-minute quadratic leg)
    legs = [
        ("capped", PROD_CAP, 20_000, 2),
        ("capped", PROD_CAP, 40_000, 2),
        ("uncapped", None, 2_000, 1),
        ("uncapped", None, 4_000, 1),
        ("uncapped", None, 8_000, 1),
    ]
    rows = []
    for mode, cap, k, n_runs in legs:
        assigned = synth_assigned(spark, k)

        def run():
            # count() alone would let Catalyst ELIMINATE the verdict
            # left-join (dup is unique on the join key and no columns
            # are referenced) and skip the pair work entirely —
            # measured 512M pairs "in 0.47s" before this filter.
            # Counting dropped rows forces the dup subtree to execute.
            semdedup_over_cells(assigned, cell_cap=cap).where(
                "NOT keep"
            ).count()

        run()  # warmup
        release_caches(spark)
        wall = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            run()
            wall = min(wall, time.time() - t0)
            release_caches(spark)
        hot_pairs = (k - 1) if cap is not None else k * (k - 1) // 2
        rows.append(
            {
                "mode": mode,
                "cell_cap": cap,
                "hot_k": k,
                "hot_candidates": hot_pairs,
                "wall_sec": round(wall, 2),
            }
        )
        print(f"# {mode} cap={cap} K={k}: {wall:.2f}s "
              f"({hot_pairs} hot-cell candidates)", file=sys.stderr)

    out = {
        "dim": DIM,
        "cold_cells": N_COLD_CELLS,
        "cold_size": COLD_SIZE,
        "cores": cores,
        "runs": rows,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "semdedup_cap.json"), "w") as f:
        json.dump(out, f, indent=1)

    print("| mode | cell_cap | hot K | hot candidates | wall (s) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['mode']} | {r['cell_cap']} | {r['hot_k']:,} "
            f"| {r['hot_candidates']:,} | {r['wall_sec']} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
