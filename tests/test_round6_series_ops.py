"""Independent numpy/pandas goldens for the round-6 series/sketch operators:
heavy_hitters_cms, runs_test_daily, changepoint_binary_split,
metric_ks_separation. Each test recomputes the statistic from the raw
parquet with a different toolchain (pandas groupbys + numpy) so a shared
Spark/DuckDB misreading of the semantics can't self-certify."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def orders_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def test_cms_estimates_dominate_truth_and_hit_top_key(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.scale_ops import heavy_hitters_cms

    rows = heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_est"] >= r["n_exact"], r
        assert r["overcount"] == r["n_est"] - r["n_exact"]
    # the heaviest probed key must be one of the 7 hot residues (pk < 7)
    top = max(rows, key=lambda r: r["n_exact"])
    assert top["pk"] < 7


def test_runs_test_matches_pandas_recomputation(spark, sf_dir, orders_pd):
    from usw_big_data_analysis_spark.queries.stats_tests import runs_test_daily

    row = runs_test_daily(spark, sf_dir).collect()[0]

    od = orders_pd.copy()
    od["d"] = (
        od["o_orderdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    )
    daily = od.groupby("d").size().sort_index()
    # d-1 equi-join semantics: only pairs of CONSECUTIVE calendar days
    prev = daily.reindex(daily.index - 1)
    mask = prev.notna().to_numpy() & (daily.to_numpy() != prev.to_numpy())
    signs = np.sign(daily.to_numpy()[mask] - prev.to_numpy()[mask]).astype(int)
    n1, n2 = int((signs == 1).sum()), int((signs == -1).sum())
    runs = int(1 + (signs[1:] != signs[:-1]).sum()) if len(signs) else 0
    assert (row["n_up"], row["n_down"], row["n_runs"]) == (n1, n2, runs)
    n = n1 + n2
    mu = 1 + 2 * n1 * n2 / n
    var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
    assert row["expected_runs"] == pytest.approx(mu, abs=1e-5)
    assert row["z"] == pytest.approx((runs - mu) / math.sqrt(var), abs=1e-5)


def test_changepoint_matches_numpy_brute_force(spark, sf_dir, orders_pd):
    from usw_big_data_analysis_spark.queries.behavior import (
        changepoint_binary_split,
    )

    row = changepoint_binary_split(spark, sf_dir).collect()[0]

    od = orders_pd.copy()
    od["d"] = (
        od["o_orderdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    )
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    daily = od.groupby("d")["cents"].sum().sort_index()
    v = daily.to_numpy().astype(float)
    t = len(v)
    cs, css = np.cumsum(v), np.cumsum(v * v)
    best_cost, best_i = math.inf, None
    for i in range(t - 1):  # left = 0..i
        nl, nr = i + 1, t - i - 1
        sl, ssl = cs[i], css[i]
        sr, ssr = cs[-1] - sl, css[-1] - ssl
        cost = (ssl - sl * sl / nl) + (ssr - sr * sr / nr)
        if cost < best_cost - 1e-6:
            best_cost, best_i = cost, i
    assert row["split_day"] == daily.index[best_i]
    assert row["n_left"] == best_i + 1
    assert row["mean_left"] == pytest.approx(
        v[: best_i + 1].mean() / 100.0, rel=1e-6
    )
    sse_total = css[-1] - cs[-1] * cs[-1] / t
    assert row["var_explained"] == pytest.approx(
        1 - best_cost / sse_total, abs=1e-5
    )


def test_ks_separation_matches_numpy(spark, sf_dir, orders_pd):
    from usw_big_data_analysis_spark.queries.metrics import metric_ks_separation

    row = metric_ks_separation(spark, sf_dir).collect()[0]

    key = orders_pd["o_orderkey"].to_numpy().astype("int64")
    prob = ((key * 2654435761) % 1000).astype(float) / 1000.0
    label = (orders_pd["o_totalprice"].to_numpy() > 150000.0).astype(int)
    pos, neg = np.sort(prob[label == 1]), np.sort(prob[label == 0])
    p_, n_ = len(pos), len(neg)
    grid = np.unique(prob)
    ks_at = np.abs(
        np.searchsorted(pos, grid, side="right") / p_
        - np.searchsorted(neg, grid, side="right") / n_
    )
    assert row["ks"] == pytest.approx(ks_at.max(), abs=1e-6)
    assert row["ks_threshold"] == pytest.approx(
        grid[np.argmax(ks_at)], abs=1e-9
    )
    # tie-aware AUC via rank formula
    order = np.argsort(prob, kind="mergesort")
    ranks = pd.Series(prob).rank(method="average").to_numpy()
    auc = (ranks[label == 1].sum() - p_ * (p_ + 1) / 2) / (p_ * n_)
    assert row["auc"] == pytest.approx(auc, abs=1e-6)
    assert row["gini"] == pytest.approx(2 * auc - 1, abs=1e-6)
    assert (row["n_pos"], row["n_neg"]) == (p_, n_)
