"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (KG triple extraction + pairing over the
                sf0.001 documents table through the real UDF chain).
queries()     — one entry per implemented operator from SURVEY.md §2 +
                the training-data pipeline block (dedup / similarity /
                text analysis / multimodal).
oracle_sql()  — matching DuckDB SQL for every SQL-expressible operator;
                non-SQL-expressible ops (the byte-parity Python-regex
                kernels and the end-to-end KG pipeline over the
                synthetic medical corpus) are rows-only by design and
                covered by the pytest differential/parity suites.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make remediner_spark importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executor Python workers via addPyFile.

    Driver-side sys.path does not reach executor workers: when the
    caller's cwd isn't the repo, mapInPandas closures referencing
    remediner_spark fail to unpickle on workers. addPyFile on the live
    SparkContext fixes that session-locally (the spark-submit path uses
    --py-files instead; see tools/package.sh)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(
        tempfile.gettempdir(), "remediner_spark_entry_auto.zip"
    )
    pkg = os.path.join(_REPO, "remediner_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    zf.write(full, os.path.relpath(full, _REPO))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)


def _wrap(fn: Callable) -> Callable:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: gazetteer NER -> mention reconstruction -> positional
    relation pairing -> CAUSES triples, over sf0.001 documents."""
    from remediner_spark.operators.docpipe import q_m6_triples_docs

    _ensure_shipped(spark)
    return q_m6_triples_docs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from remediner_spark.operators import (
        bpe,
        components,
        dedup,
        docpipe,
        ivf,
        linkgraph,
        multimodal,
        olap,
        pii,
        pq,
        relational,
        search,
        semdedup,
        similarity,
        tableops,
        textstats,
        traindata,
    )
    from remediner_spark.plans import kg_gate
    from remediner_spark.sources import cdx, robots, sitemap, warc

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # Registration order is deliberate (r8 verdict #4): the driver's
    # correctness gate samples the FIRST 50 dict entries, and through
    # r8 that slice only ever covered the relational/docpipe/textstats
    # head — the web-graph, table-format, streaming, multimodal and
    # olap families had never received a driver-verified row. The
    # never-sampled families now register first; the previously
    # verified head moves behind them. The entry SET and each entry's
    # oracle SQL are unchanged — only dict order rotates.
    out.update(linkgraph.QUERIES)
    out.update(kg_gate.QUERIES)
    out.update(tableops.QUERIES)
    out.update(warc.QUERIES)
    out.update(robots.QUERIES)
    out.update(cdx.QUERIES)
    out.update(sitemap.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(olap.QUERIES)
    out.update(traindata.QUERIES)
    out.update(similarity.QUERIES)
    out.update(semdedup.QUERIES)
    out.update(search.QUERIES)
    out.update(dedup.QUERIES)
    out.update(textstats.QUERIES)
    out.update(docpipe.QUERIES)
    out.update(pq.QUERIES)
    out.update(ivf.QUERIES)
    out.update(components.QUERIES)
    out.update(bpe.QUERIES)
    out.update(pii.QUERIES)
    out.update(relational.QUERIES)
    # every callable ships the package to executors first (cwd-proof)
    return {name: _wrap(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    from remediner_spark.operators import (
        bpe,
        components,
        dedup,
        docpipe,
        ivf,
        linkgraph,
        multimodal,
        olap,
        pii,
        pq,
        relational,
        search,
        semdedup,
        similarity,
        tableops,
        textstats,
        traindata,
    )
    from remediner_spark.plans import kg_gate
    from remediner_spark.sources import cdx, robots, sitemap, warc

    out: dict[str, str] = {}
    # mirror queries()'s rotated registration order (r8 verdict #4)
    out.update(linkgraph.oracles())
    # end-to-end KG pipeline over the materialized corpus fixture: the
    # oracle reads the pandas-gold triples parquet and re-derives
    # linking/nodes/edges relationally in DuckDB (plans/kg_gate.py)
    out.update(kg_gate.oracles())
    out.update(tableops.ORACLES)
    out.update(warc.ORACLES)
    out.update(robots.ORACLES)
    out.update(cdx.oracles())
    out.update(sitemap.oracles())
    out.update(multimodal.ORACLES)
    out.update(olap.ORACLES)
    out.update(traindata.ORACLES)
    out.update(similarity.ORACLES)
    out.update(semdedup.oracles())
    out.update(search.ORACLES)
    out.update(dedup.ORACLES)
    out.update(textstats.ORACLES)
    out.update(docpipe.ORACLES)
    out.update(pq.oracles())
    # sim_topk_ivf: the search phase over materialized centroids
    # (k-means training stays Spark-side; operators/ivf.py docstring)
    out.update(ivf.oracles())
    out.update(components.ORACLES)
    out.update(bpe.ORACLES)
    out.update(pii.ORACLES)
    out.update(relational.ORACLES)
    return out
