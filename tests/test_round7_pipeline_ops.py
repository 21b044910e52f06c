"""Goldens for the round-7 pipeline additions — each key mirrored with an
independent pandas/python implementation built straight from the parquet,
no Spark plan shared:

- preference_dpo_pairs: literal per-order best/worst pairing loop
- metric_pass_at_k: numpy comb()-based unbiased estimator
- shard_rebalance_cost: python rendezvous-hash loop + the (M-N)/M theory
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest


def _h(s: str) -> int:
    # the engines' portable 60-bit hash (dedup._h_spark / _h_sql)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dpo_pairs_literal_loop(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.preference_ops import (
        preference_dpo_pairs,
    )

    got = {
        r["prompt_id"]: (
            r["chosen"], r["rejected"], r["margin_cents"], r["n_responses"]
        )
        for r in preference_dpo_pairs(spark, sf_dir).collect()
    }

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pt = pd.read_parquet(f"{sf_dir}/part.parquet")[["p_partkey", "p_brand"]]
    li = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).apply(math.floor)
    ob = li.groupby(["l_orderkey", "p_brand"], as_index=False)["cents"].sum()

    want = {}
    for k, g in ob.groupby("l_orderkey"):
        if len(g) < 2:
            continue
        top = g.sort_values(["cents", "p_brand"], ascending=[False, True])
        bot = g.sort_values(["cents", "p_brand"], ascending=[True, True])
        margin = int(g["cents"].max() - g["cents"].min())
        if margin <= 0:
            continue
        want[k] = (
            top["p_brand"].iloc[0], bot["p_brand"].iloc[0], margin, len(g)
        )

    assert got == want
    # a chosen response never equals its rejected partner
    assert all(c != r for c, r, _, _ in got.values())


def test_pass_at_k_comb_mirror(spark, sf_dir):
    from math import comb

    from usw_big_data_analysis_spark.queries.metrics import (
        _PAK_MIN_N,
        metric_pass_at_k,
    )

    rows = {r["k"]: r for r in metric_pass_at_k(spark, sf_dir).collect()}
    assert set(rows) == {1, 5, 10}

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev.groupby("user_id").agg(
        n=("value", "size"), c=("value", lambda v: int((v > 60.0).sum()))
    )
    p = p[p["n"] >= _PAK_MIN_N]

    for k in (1, 5, 10):
        s9 = 0
        for n, c in zip(p["n"], p["c"]):
            exact = (
                1.0
                if n - c < k
                else 1.0 - comb(n - c, k) / comb(n, k)
            )
            s9 += math.floor(exact * 1e9 + 0.5)
        r = rows[k]
        assert r["n_problems"] == len(p)
        # comb() is exact rational math; the engine's fixed-order double
        # product can differ by <=1 ulp per problem at the e9 grid
        assert abs(r["sum_p9"] - s9) <= len(p)
        assert r["mean_p9"] == pytest.approx(s9 / len(p), abs=2.0)
    # pass@k is monotone in k
    assert (
        rows[1]["sum_p9"] <= rows[5]["sum_p9"] <= rows[10]["sum_p9"]
    )


def test_shard_rebalance_python_loop(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.corpus_ops import (
        _RB_NEW,
        _RB_OLD,
        shard_rebalance_cost,
    )

    rows = {
        r["strategy"]: r for r in shard_rebalance_cost(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")["doc_id"]

    def hrw(doc_id: int, n_shards: int) -> int:
        best = max(
            range(n_shards),
            key=lambda s: (_h(f"rv:{doc_id}:{s}") % (1 << 55), -s),
        )
        return best

    mv_hrw = sum(
        1 for d in docs if hrw(int(d), _RB_OLD) != hrw(int(d), _RB_NEW)
    )
    mv_mod = sum(1 for d in docs if d % _RB_OLD != d % _RB_NEW)

    assert rows["rendezvous"]["n_docs"] == len(docs)
    assert rows["rendezvous"]["n_moved"] == mv_hrw
    assert rows["mod"]["n_moved"] == mv_mod
    assert (
        rows["rendezvous"]["moved_ppm"] == mv_hrw * 1_000_000 // len(docs)
    )
    # the whole point: HRW moves ~(M-N)/M of keys, mod-N moves far more
    assert rows["rendezvous"]["n_moved"] < rows["mod"]["n_moved"]
    expected_ppm = (_RB_NEW - _RB_OLD) * 1_000_000 // _RB_NEW
    assert abs(rows["rendezvous"]["moved_ppm"] - expected_ppm) < 100_000


def test_annealing_plan_pandas_mirror(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.corpus_ops import (
        _ANN_ANNEAL,
        _ANN_MAIN,
        mixture_annealing_plan,
    )

    got = {
        r["source"]: r for r in mixture_annealing_plan(spark, sf_dir).collect()
    }

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs["text"].str.split(" ")
    n_tok = toks.str.len().astype("int64")
    n_types = toks.apply(lambda t: len(set(t)))
    score = (
        n_tok.clip(upper=50) * 40 // 50
        + (n_types * 100 // n_tok) * 40 // 100
        + (docs["lang"] == "en").astype("int64") * 20
    )
    per = pd.DataFrame(
        {"source": docs["source"], "n_tok": n_tok, "ok": (score >= 60)}
    ).groupby("source").agg(n_tok=("n_tok", "sum"), n=("ok", "size"), np=("ok", "sum"))
    per["qual_pm"] = per["np"] * 1000 // per["n"]
    tot, wsum = per["n_tok"].sum(), (per["n_tok"] * per["qual_pm"]).sum()

    assert set(got) == set(per.index)
    total_alloc = 0
    for src, row in per.iterrows():
        g = got[src]
        assert g["n_tok"] == row["n_tok"]
        assert g["qual_pm"] == row["qual_pm"]
        assert g["main_tok"] == _ANN_MAIN * row["n_tok"] // tot
        assert g["anneal_tok"] == (
            _ANN_ANNEAL * (row["n_tok"] * row["qual_pm"]) // wsum
        )
        assert g["epochs"] == pytest.approx(
            (g["main_tok"] + g["anneal_tok"]) / row["n_tok"], abs=1e-6
        )
        total_alloc += g["main_tok"] + g["anneal_tok"]
    # floor-division allocations never exceed the budget
    assert total_alloc <= _ANN_MAIN + _ANN_ANNEAL
