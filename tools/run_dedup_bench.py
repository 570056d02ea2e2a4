"""Dedup-family wall decomposition (r6 verdict item 4).

The r6 judge measured the dedup family 1.19-1.33x slower than r5's
driver-verified walls on a host carrying residual load (loadavg 2.2,
one burst retry) and asked for a clean decision: noise or real
regression. This tool re-times exactly those legs with bench.py's
protocol (same sf dir, local[32], warmup + min-of-k, release_caches
between EVERY leg, burst guard + probe evidence) on an idle-guarded
host and writes BENCH/dedup_decomp.json with the r5 reference walls
and ratios, so the decision is a committed artifact.

Usage: python tools/run_dedup_bench.py [k] [leg ...]
    k: min-of-k (default 4); legs: subset to run (default: all; a leg
    may repeat — e.g. `dedup_exact ... dedup_exact` measures the
    session-warmup ordering artifact, recorded as `<name>#2`).
Writes BENCH/dedup_decomp.json only on a full (no-subset) run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (helpers: _BestLeg, _BurstGuard, _wait_for_idle)

# r5 driver-verified walls (BENCH_r05.json) — the comparison baseline
R5_WALLS = {
    "dedup_exact": 0.217,
    "dedup_ngram_jaccard": 3.882,
    "dedup_minhash_lsh": 2.344,
    "dedup_simhash": 1.711,
    "dedup_span_coverage": 1.832,
    "decontaminate_bloom": 2.919,
}
# r6 new legs: no r5 baseline, timed for the forward series
EXTRA = ["dedup_incremental"]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    subset = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench._wait_for_idle()

    import __spark_entry__ as entrymod
    from remediner_spark.session import get_spark, release_caches

    spark = get_spark(app_name="dedup-bench", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    guard = bench._BurstGuard()

    out: dict = {
        "sf_dir": sf_dir, "cores": cores, "k": k,
        "probe_base": round(guard.base, 4),
        "loadavg_start": round(os.getloadavg()[0], 2),
        "legs": {},
    }
    seen: dict[str, int] = {}
    for name in subset or (list(R5_WALLS) + EXTRA):
        seen[name] = seen.get(name, 0) + 1
        label = name if seen[name] == 1 else f"{name}#{seen[name]}"

        def run_query() -> None:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()

        run_query()  # warmup
        release_caches(spark)
        best = bench._BestLeg()
        legs = k
        while legs:
            best.run(run_query)
            release_caches(spark)
            legs -= 1
            if not legs and guard.corrupted(label):
                legs = 1
        rec = {
            "wall": round(best.wall, 3),
            "cpu": round(best.cpu, 3),
            "host_other": round(best.other, 3),
            "probe": guard.probes.get(label),
        }
        if name in R5_WALLS:
            rec["r5_wall"] = R5_WALLS[name]
            rec["vs_r5"] = round(best.wall / R5_WALLS[name], 3)
        out["legs"][label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)

    out["burst_retries"] = guard.retries
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    if not subset:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/dedup_decomp.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({n: r.get("vs_r5", r["wall"])
                      for n, r in out["legs"].items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
