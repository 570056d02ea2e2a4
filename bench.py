"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set: the KG pipeline (triple extraction over the synthetic
medical corpus — the engine's reason to exist), the heavy dedup/
similarity operators, and a representative relational mix. The
`metric` is triples/sec of the KG extraction stage (BASELINE.md:13).

Usage:
    python bench.py                  # sf0.1, 32 cores
    SPARK_GRAFT_CPUS=8 python bench.py   # scaling-efficiency runs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "m1_gazetteer_ner",
    "m6_triple_assembly",
    "m9_edge_agg_salted",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_langid",
    "text_fingerprint",
    "sim_topk_bruteforce",
    "join_semi_anti",
    "agg_two_phase",
    "window_topk",
]

# pages for the KG corpus run, scaled to the sf ladder
_CORPUS_PAGES = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    n_pages = _CORPUS_PAGES.get(sf_name, 100_000)

    import __spark_entry__ as entrymod
    from remediner_spark.operators.ner import extract_triples_stage
    from remediner_spark.operators.text import filter_language
    from remediner_spark.plans.pipeline import default_tagger_bc
    from remediner_spark.session import get_spark
    from remediner_spark.sources.corpus import generate_pages

    spark = get_spark(
        app_name="remediner-bench", cores=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- KG pipeline throughput (the headline metric) ---
    pages_pdf, _ = generate_pages(n_pages)
    pages = spark.createDataFrame(pages_pdf).repartition(cores * 2).cache()
    pages.count()  # materialize input out of the timed section
    tagger_bc = default_tagger_bc(spark)
    t0 = time.time()
    n_triples = extract_triples_stage(filter_language(pages), tagger_bc).count()
    kg_sec = time.time() - t0
    triples_per_sec = n_triples / kg_sec if kg_sec else 0.0

    # --- per-query timings over the provided tables ---
    queries = entrymod.queries()
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        q_times[name] = round(time.time() - t0, 3)
    q_times["kg_triple_extraction"] = round(kg_sec, 3)

    result = {
        "metric": "triples_per_sec",
        "value": round(triples_per_sec, 1),
        "unit": "sec",
        "queries": q_times,
        "sf": sf_name,
        "cores": cores,
        "n_pages": n_pages,
        "n_triples": n_triples,
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
