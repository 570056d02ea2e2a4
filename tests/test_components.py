"""Connected components: known graphs + convergence."""

from __future__ import annotations

from remediner_spark.operators.components import connected_components


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    out = connected_components(df).toPandas()
    return {r.vertex: r.component for r in out.itertuples(index=False)}


def test_two_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_to_min(spark):
    # long chain: min label must propagate the full diameter
    chain = [(i, i + 1) for i in range(1, 12)]
    got = _components(spark, chain)
    assert set(got.values()) == {1}
    assert len(got) == 12


def test_cycle_and_bridge(spark):
    got = _components(spark, [(5, 6), (6, 7), (7, 5), (7, 2)])
    assert set(got.values()) == {2}
