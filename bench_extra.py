"""Per-query isolation harness (optimization guide §1.4) — NOT the
driver's bench. bench.py is frozen for measurement; this file exists so
optimization rounds can time individual declared queries with the noop
sink, dump `.explain("formatted")` plans, and compare before/after
without touching the frozen harness.

Usage:
    python bench_extra.py q1 q2 ...            # time queries at $SPARK_GRAFT_SF_DIR
    SPARK_GRAFT_EXPLAIN_DIR=plans/r09 python bench_extra.py --explain-only q1 ...

Env: SPARK_GRAFT_SF_DIR (default sf1.0), SPARK_GRAFT_CPUS,
SPARK_GRAFT_EXTRA_RUNS (timed runs per query, default 2).
Prints one JSON line {name: best_sec, ...} at the end.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain_only = "--explain-only" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_EXTRA_RUNS", "2"))
    explain_dir = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR")

    import __spark_entry__ as entrymod
    from remediner_spark.session import get_spark, release_caches

    spark = get_spark(
        app_name="bench-extra", cores=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args or sorted(qs)
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain(mode="formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
            release_caches(spark)
        if explain_only:
            continue
        spark.sparkContext.setJobDescription(name)

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warmup
        release_caches(spark)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
            release_caches(spark)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
