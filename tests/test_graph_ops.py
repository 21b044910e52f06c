"""connected_components — hand-checkable graphs.

The parity gate pins dedup_clusters against DuckDB's recursive CTE on the
fixture; here: a long chain (worst case for min-label propagation — label
must walk the full diameter), disjoint components, and a two-node
component, all verified exactly.
"""

from __future__ import annotations

from usw_big_data_analysis_spark.operators.graph_ops import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "s bigint, d bigint")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, "s", "d").collect()
    }


def test_chain_and_disjoint_components(spark):
    # chain 10-11-…-15 (diameter 5, label 10 must traverse it all),
    # triangle 1-2-3, pair 7-8
    got = _cc(
        spark,
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (1, 2), (2, 3), (3, 1), (7, 8)],
    )
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
        1: 1, 2: 1, 3: 1,
        7: 7, 8: 7,
    }


def test_direction_and_duplicate_edges_irrelevant(spark):
    got = _cc(spark, [(5, 4), (4, 5), (4, 3), (5, 3), (3, 2)])
    assert got == {2: 2, 3: 2, 4: 2, 5: 2}


def test_long_chain_converges_logarithmically(spark):
    """r7 pointer-jump upgrade: a 300-node path has diameter 299 — plain
    min-label propagation needs 299 rounds (the old 25-round cap would now
    raise rather than return partial clusters); propagate+jump must close
    it within the default max_rounds and label every node with the chain
    head."""
    n = 300
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_nonconvergence_raises_not_partial(spark):
    """With max_rounds too small the operator must fail loudly — silent
    partial clusters would corrupt a dedup keep-list downstream."""
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "s bigint, d bigint"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, "s", "d", max_rounds=2)
