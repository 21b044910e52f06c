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


# --- wedge_pair_counts (r7 blob-kernel wedge counting) -----------------------

from usw_big_data_analysis_spark.operators.graph_ops import wedge_pair_counts


def _brute_counts(pairs, min_common, drop_linked):
    """Reference: symmetric edges, common-neighbor counts for u<v pairs."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            nc = len(adj[u] & adj[v])
            if nc < min_common:
                continue
            if drop_linked and v in adj[u]:
                continue
            out[(u, v)] = nc
    return out


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "u bigint, v bigint")
    both = df.union(df.selectExpr("v", "u"))
    return both.selectExpr("u AS src", "v AS dst")


def test_wedge_pair_counts_matches_bruteforce(spark):
    # two squares sharing a diagonal node, a pendant and a linked triangle:
    # exercises >=2 pruning, linked-pair dropping and multi-bucket spread
    # (edges must be DISTINCT — the same precondition as the wedge join
    # form, which _edges_spark guarantees via .distinct())
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (3, 5), (5, 6), (6, 3),
             (7, 1), (7, 2)]
    for mc in (1, 2):
        for dl in (True, False):
            got = {
                (r["u"], r["v"]): r["n_common"]
                for r in wedge_pair_counts(
                    _sym(spark, pairs), min_common=mc, drop_linked=dl
                ).collect()
            }
            assert got == _brute_counts(pairs, mc, dl), (mc, dl)


def test_wedge_pair_counts_ids_beyond_int32(spark):
    """The kernel's local dense remap must stay exact for node ids past
    2^32 (100 TB partkeys) — no packing overflow."""
    base = 2**33
    pairs = [(base + 1, base + 2), (base + 2, base + 3), (base + 1, base + 4),
             (base + 4, base + 3), (base + 2, base + 4)]
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in wedge_pair_counts(_sym(spark, pairs), min_common=1).collect()
    }
    assert got == _brute_counts(pairs, 1, True)


def test_wedge_pair_counts_topk_selection_matches_global_order(spark):
    """top_k_jaccard pushdown: the union of per-bucket top-Ks must contain
    the global top-K under (round6(jaccard) DESC, u, v) — verified against
    the unpushed result ordered in SQL."""
    import random

    rnd = random.Random(7)
    nodes = list(range(1, 41))
    pairs = sorted({tuple(sorted(rnd.sample(nodes, 2))) for _ in range(160)})
    sym = _sym(spark, pairs)
    full = wedge_pair_counts(sym, min_common=2)
    pushed = wedge_pair_counts(sym, min_common=2, top_k_jaccard=5)

    from pyspark.sql import functions as F

    deg = sym.groupBy("src").agg(F.count("*").alias("d"))

    def top5(wedges):
        du = deg.selectExpr("src AS u", "d AS du")
        dv = deg.selectExpr("src AS v", "d AS dv")
        return [
            (r["u"], r["v"], r["n_common"], r["j"])
            for r in wedges.join(du, "u").join(dv, "v")
            .selectExpr("u", "v", "n_common",
                        "round(CAST(n_common AS DOUBLE) / (du + dv - n_common), 6) AS j")
            .orderBy(F.desc("j"), F.asc("u"), F.asc("v")).limit(5).collect()
        ]

    assert top5(pushed) == top5(full)
