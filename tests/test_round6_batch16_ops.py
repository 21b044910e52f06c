"""Goldens for the sixteenth round-6 batch: rollup_count_distinct (pandas
set-based mirror of the non-decomposable rollup) and metric_bleu_pairs
(pure-Python corpus BLEU mirror with the same smoothing)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest


def test_rollup_distinct_matches_pandas_sets(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        rollup_count_distinct,
    )

    rows = {
        (r["r_name"], r["o_orderpriority"]): r
        for r in rollup_count_distinct(spark, sf_dir).collect()
    }

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")
    re = pd.read_parquet(f"{sf_dir}/region.parquet")
    j = (
        od.merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .merge(re, left_on="n_regionkey", right_on="r_regionkey")
    )
    # leaf cells
    for (rn, pr), grp in j.groupby(["r_name", "o_orderpriority"]):
        assert rows[(rn, pr)]["n_customers"] == grp["o_custkey"].nunique()
        assert rows[(rn, pr)]["n_orders"] == len(grp)
    # region subtotal is NOT the sum of leaf distincts — it's the set union
    for rn, grp in j.groupby("r_name"):
        r = rows[(rn, "__ALL__")]
        assert r["n_customers"] == grp["o_custkey"].nunique()
        leaf_sum = sum(
            rows[(rn, pr)]["n_customers"]
            for pr in grp["o_orderpriority"].unique()
        )
        assert r["n_customers"] <= leaf_sum  # strict on this fixture
    assert rows[("__ALL__", "__ALL__")]["n_customers"] == j["o_custkey"].nunique()


def test_bleu_matches_python_reference(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.text_ops import (
        _BLEU_MOD,
        _BLEU_N,
        metric_bleu_pairs,
    )

    row = metric_bleu_pairs(spark, sf_dir).collect()[0]

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")[
        "text"
    ]
    pairs = [
        (i, i + 1)
        for i in docs.index
        if i % _BLEU_MOD == 0 and (i + 1) in docs.index
    ]
    assert row["n_pairs"] == len(pairs)
    c_len = r_len = 0
    clipped = [0] * (_BLEU_N + 1)
    total = [0] * (_BLEU_N + 1)
    for ci, ri in pairs:
        cw, rw = docs[ci].split(" "), docs[ri].split(" ")
        c_len += len(cw)
        r_len += len(rw)
        for n in range(1, _BLEU_N + 1):
            cng = Counter(tuple(cw[k : k + n]) for k in range(len(cw) - n + 1))
            rng = Counter(tuple(rw[k : k + n]) for k in range(len(rw) - n + 1))
            total[n] += sum(cng.values())
            clipped[n] += sum(min(v, rng[g]) for g, v in cng.items())
    ps = []
    for n in range(1, _BLEU_N + 1):
        p = clipped[n] / total[n] if clipped[n] > 0 else 1 / (2 * total[n])
        ps.append(p)
        assert row[f"p{n}"] == pytest.approx(p, abs=1e-6)
    bp = min(1.0, math.exp(1 - r_len / c_len))
    bleu = bp * math.exp(sum(math.log(p) for p in ps) / _BLEU_N)
    assert row["brevity_penalty"] == pytest.approx(bp, abs=1e-6)
    assert row["bleu"] == pytest.approx(bleu, abs=1e-6)
