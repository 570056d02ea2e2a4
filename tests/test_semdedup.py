"""SemDeDup referee: the cell self-join + greedy min-id keeper must
agree with a driver-side brute-force recomputation over the same
cluster assignment (cosines accumulated sequentially, like the Spark
fold)."""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _seq_cosine(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for x in b:
        nb += x * x
    return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)


def test_semdedup_matches_bruteforce(spark):
    if not os.path.exists(f"{SF_DIR}/embeddings.parquet"):
        pytest.skip("testdata missing")
    from remediner_spark.operators.semdedup import SEM_T, q_semdedup

    rows = q_semdedup(spark, SF_DIR).collect()
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(
            f"{SF_DIR}/embeddings.parquet"
        ).collect()
    }
    cell = {r["vec_id"]: r["cell"] for r in rows}
    assert set(cell) == set(emb)
    dropped = 0
    for r in rows:
        vid = r["vec_id"]
        sims = [
            o
            for o in emb
            if o < vid
            and cell[o] == cell[vid]
            and _seq_cosine(emb[o], emb[vid]) >= SEM_T
        ]
        if sims:
            assert r["keep"] is False and r["dup_of"] == min(sims)
            dropped += 1
        else:
            assert r["keep"] is True and r["dup_of"] is None
    # the sf0.001 table must exercise the drop path, not just keeps
    assert dropped > 0
