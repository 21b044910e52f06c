"""mean_ranks — the bucketed two-phase global mean-rank operator.

Correctness: bit-identical to the naive unpartitioned ``rank() OVER
(ORDER BY x)`` mean-rank formulation on both a heavily-tied column and a
near-unique column. Scale: the plans of the rank-based statistics must
never move row-level data to a single partition — every SinglePartition
exchange has to sit above a map-side HashAggregate (the distinct-value /
bucket-histogram compression), never directly above a scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from usw_big_data_analysis_spark.operators.rank_ops import mean_ranks
from usw_big_data_analysis_spark.plans import explain_formatted
from usw_big_data_analysis_spark.sources import load_table

_QUERIES = entrymod.queries()


def _naive_mean_ranks(df, col):
    r_avg = F.rank().over(Window.orderBy(col)) + (
        F.count("*").over(Window.partitionBy(col)) - 1
    ) / 2.0
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col), r_avg.alias("r_avg"))
        .groupBy(col)
        .agg(F.count("*").alias("cnt"), F.first("r_avg").alias("r_avg"))
    )


def _assert_same(fast, naive, col):
    a = {tuple(r) for r in fast.select(col, "cnt", "r_avg").collect()}
    b = {tuple(r) for r in naive.select(col, "cnt", "r_avg").collect()}
    assert a == b


def test_mean_ranks_matches_naive_on_ties(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    _assert_same(
        mean_ranks(li, "l_quantity"),
        _naive_mean_ranks(li, "l_quantity"),
        "l_quantity",
    )


def test_mean_ranks_matches_naive_on_near_unique(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    _assert_same(
        mean_ranks(li, "l_extendedprice"),
        _naive_mean_ranks(li, "l_extendedprice"),
        "l_extendedprice",
    )


def test_mean_ranks_single_value_and_negatives(spark):
    df = spark.createDataFrame(
        [(-3.0,), (-3.0,), (-1.5,), (0.0,), (0.0,), (0.0,), (2.0,), (None,)],
        "x double",
    )
    got = {tuple(r) for r in mean_ranks(df, "x").collect()}
    assert got == {(-3.0, 2, 1.5), (-1.5, 1, 3.0), (0.0, 3, 5.0), (2.0, 1, 7.0)}
    one = spark.createDataFrame([(5.0,)] * 4, "x double")
    assert mean_ranks(one, "x").collect()[0].asDict() == {
        "x": 5.0,
        "cnt": 4,
        "r_avg": 2.5,
    }


def _single_partition_exchanges_see_only_aggregates(plan: str, require_sp=True):
    """On every path from a SinglePartition Exchange down to a parquet scan
    there must be a cardinality-compressing node — HashAggregate (distinct
    values / bucket histogram) or a top-k/limit — so the data hitting a
    single partition is never raw rows. Node ids come from the
    formatted-explain details; the tree's indentation gives the paths."""
    import re

    sp_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", plan
        )
    }
    agg_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) (?:HashAggregate|TakeOrderedAndProject|GlobalLimit)", plan
        )
    }
    if require_sp:
        # non-vacuousness: the histogram window must actually be in the plan
        assert sp_ids, "expected a SinglePartition exchange (histogram window)"
    elif not sp_ids:
        return True

    tree = [
        l
        for l in plan.splitlines()[: plan.splitlines().index("")]
        if re.search(r"\((\d+)\)\s*$", l)
    ]
    stack: list[tuple[int, int]] = []  # (indent, node_id)
    for line in tree:
        node_id = int(re.search(r"\((\d+)\)\s*$", line).group(1))
        indent = len(line) - len(line.lstrip(" *+-"))
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if "Scan parquet" in line:
            # ancestors deeper than each SinglePartition exchange must
            # include a HashAggregate
            path = [nid for _, nid in stack]
            for i, nid in enumerate(path):
                if nid in sp_ids:
                    assert any(a in agg_ids for a in path[i + 1 :]), (
                        f"raw scan under SinglePartition exchange ({nid})"
                    )
        stack.append((indent, node_id))
    return True


def test_rank_stats_never_single_partition_raw_rows(spark, sf_dir):
    for name in (
        "mannwhitney",
        "kruskal",
        "wilcoxon",
        "corr_tests",
        "scale_quantile",
        "cumsum_curve",
        "argmax_threshold",
        "ks_2samp",
    ):
        plan = explain_formatted(_QUERIES[name](spark, sf_dir))
        assert _single_partition_exchanges_see_only_aggregates(plan), name
    # limit-based plans may avoid SinglePartition exchanges entirely
    # (TakeOrderedAndProject) — still must never feed one raw rows
    plan = explain_formatted(_QUERIES["sort_values"](spark, sf_dir))
    assert _single_partition_exchanges_see_only_aggregates(plan, require_sp=False)


# --- fold-AUROC property check (round 5: the window-free rank fold) ----------
def _numpy_auroc(labels, probs):
    """Direct Mann-Whitney mean-rank AUROC at the 6dp quantization the
    engine contract pins — an independent single-node formulation."""
    import numpy as np

    q = np.floor(np.asarray(probs) * 10**6 + 0.5).astype(np.int64)
    y = np.asarray(labels)
    order = np.argsort(q, kind="stable")
    ranks = np.empty(len(q), dtype=np.float64)
    i = 0
    qs = q[order]
    while i < len(qs):
        j = i
        while j < len(qs) and qs[j] == qs[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average rank of the tie run
        i = j
    npos = int(y.sum())
    nneg = len(y) - npos
    if npos == 0 or nneg == 0:
        return None
    u = ranks[y == 1].sum() - npos * (npos + 1) / 2.0
    return round(u / (npos * nneg), 6), npos, nneg


def test_fold_auroc_matches_numpy_property(spark):
    """The sorted-array-fold _auroc_rank_agg must equal a direct numpy
    rank computation on adversarial inputs: heavy ties, all-tied,
    near-unique, tiny buckets."""
    import numpy as np

    from pyspark.sql import functions as SF
    from usw_big_data_analysis_spark.queries.metrics import _auroc_rank_agg

    rng = np.random.RandomState(7)
    cases = [
        ("heavy_ties", rng.randint(0, 5, 400) / 5.0, rng.randint(0, 2, 400)),
        ("all_tied", np.full(50, 0.5), rng.randint(0, 2, 50)),
        ("near_unique", rng.rand(300).round(6), rng.randint(0, 2, 300)),
        ("two_rows", np.array([0.1, 0.9]), np.array([0, 1])),
    ]
    for name, probs, labels in cases:
        want = _numpy_auroc(labels, probs)
        if want is None:
            continue
        df = spark.createDataFrame(
            [(int(l), float(p)) for l, p in zip(labels, probs)],
            "label int, prob double",
        )
        row = _auroc_rank_agg(df).collect()[0]
        auc = round(
            (int(row["rank_sum2"]) - row["npos"] * (row["npos"] + 1))
            / (2 * row["npos"] * row["nneg"]),
            6,
        )
        assert (auc, row["npos"], row["nneg"]) == want, name


def test_fold_auroc_exact_past_double_mantissa(spark):
    """VERDICT r6 #2 fixture: a synthetic distinct-score count table whose
    rank sum exceeds 2^53 — the old half-integer double accumulation would
    lose low bits here; the DECIMAL(38,0) lanes must match an exact
    arbitrary-precision Python computation bit-for-bit."""
    import numpy as np

    from usw_big_data_analysis_spark.queries.metrics import (
        _auroc_rank_from_counts,
    )

    rng = np.random.RandomState(11)
    probs = np.sort(rng.choice(10**6, size=200, replace=False))
    t = rng.randint(10**7, 10**8, size=200).astype(np.int64)
    tp = (t * rng.rand(200)).astype(np.int64)
    vb = spark.createDataFrame(
        [(int(p), int(a), int(b)) for p, a, b in zip(probs, t, tp)],
        "prob bigint, t bigint, tp bigint",
    )
    row = _auroc_rank_from_counts(vb).collect()[0]
    # exact python mirror in unbounded ints (doubled half-unit ranks)
    cum = 0
    rs2 = 0
    for ti, tpi in zip(t.tolist(), tp.tolist()):
        rs2 += tpi * (2 * cum + ti + 1)
        cum += ti
    npos = int(tp.sum())
    ntot = int(t.sum())
    assert rs2 > 2**53  # the fixture really is past the double mantissa
    assert float(rs2) != rs2  # a double accumulation could not hold it
    assert int(row["rank_sum2"]) == rs2
    assert row["npos"] == npos
    assert row["nneg"] == ntot - npos
