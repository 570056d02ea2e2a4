"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet tables, comparing
row count + schema (column names) + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
            col.dropna().iloc[0] if col.notna().any() else None, (list, tuple)
        ):
            df[c] = col.map(lambda v: str(list(v)) if v is not None else "")
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").astype(str)
    rows = sorted(
        df.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1).tolist()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as entrymod
    from remediner_spark.session import get_spark, release_caches

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, {len(got.columns)} cols "
                  f"[rows-only] ({dt:.1f}s)")
            if len(got) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rowcount {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"schema {sorted(got.columns)} != {sorted(want.columns)}")
        else:
            h_got, h_want = value_hash(got), value_hash(want)
            if h_got != h_want:
                problems.append(f"valuehash {h_got} != {h_want}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"ok    {name}: {len(got)} rows ({dt:.1f}s)")
        # unpersist the query's deliberate branch caches (dedup
        # shingles/bands, graph vocab tables) so 69 queries in one
        # session don't accrete dead storage blocks
        release_caches(spark)
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
