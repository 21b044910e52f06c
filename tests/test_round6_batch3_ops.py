"""Goldens for the third round-6 batch: ab_diff_in_diff (numpy
recomputation), keywords_textrank (semantic invariants + networkx-free
power-iteration mirror), skew_salt_plan (the plan's bound must actually
hold on the data)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_did_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.stats_tests import ab_diff_in_diff

    row = ab_diff_in_diff(spark, sf_dir).collect()[0]

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    y = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5) / 100.0
    treated = (od["o_custkey"].to_numpy() % 2).astype(int)
    post = (
        od["o_orderdate"].astype("datetime64[us]")
        >= np.datetime64("1996-01-01")
    ).to_numpy().astype(int)

    means, varn = {}, {}
    for t in (0, 1):
        for p in (0, 1):
            cell = y[(treated == t) & (post == p)]
            means[t, p] = cell.mean()
            varn[t, p] = cell.var(ddof=1) / len(cell)
    did = (means[1, 1] - means[1, 0]) - (means[0, 1] - means[0, 0])
    se = np.sqrt(sum(varn.values()))
    assert row["did"] == pytest.approx(did, abs=1e-4)
    assert row["se"] == pytest.approx(se, abs=1e-4)
    assert row["z"] == pytest.approx(did / se, abs=1e-4)
    assert row["n_total"] == len(y)


def test_textrank_matches_float_power_iteration(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.text_ops import (
        _TR_ITERS,
        _TR_MASS,
        keywords_textrank,
    )

    rows = {r["word"]: r["mass"] for r in keywords_textrank(spark, sf_dir).collect()}
    assert len(rows) > 1
    assert all(m >= 15 * _TR_MASS // 100 for m in rows.values())

    # mirror: integer power iteration from the pandas-built bigram graph
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter, defaultdict

    pair_w = Counter()
    for text in docs["text"]:
        w = text.split(" ")
        for a, b in zip(w, w[1:]):
            if a != b:
                pair_w[(min(a, b), max(a, b))] += 1
    out = defaultdict(list)  # src -> [(dst, w)]
    wdeg = Counter()
    for (u, v), wt in pair_w.items():
        out[u].append((v, wt))
        out[v].append((u, wt))
        wdeg[u] += wt
        wdeg[v] += wt
    mass = {n: _TR_MASS for n in out}
    base = 15 * _TR_MASS // 100
    for _ in range(_TR_ITERS):
        inc = Counter()
        for src, nbrs in out.items():
            for dst, wt in nbrs:
                inc[dst] += mass[src] * wt // wdeg[src]
        mass = {n: base + 85 * inc[n] // 100 for n in out}
    assert rows == mass


def test_salt_plan_bound_holds(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.scale_ops import skew_salt_plan

    rows = skew_salt_plan(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        f = r["salt_factor"]
        assert f >= 2  # only over-target keys are salted
        # ceil(n/f) really is the worst sub-bucket, and it respects target
        assert r["bucket_after"] == -(-r["n"] // f)
        assert r["bucket_after"] <= r["target_bucket"] + 1
        # one fewer salt would violate the target
        assert -(-r["n"] // (f - 1)) > r["target_bucket"] if f > 1 else True
