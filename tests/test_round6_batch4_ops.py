"""Goldens for the fourth round-6 batch: orders_open_backlog_daily (pandas
interval-sweep mirror), recsys_item_cosine_topk (brute-force cosine
neighbors), metric_platt_recalibration (damped-Newton numpy mirror plus the
convergence contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_backlog_matches_pandas_sweep(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        orders_open_backlog_daily,
    )

    rows = {r["day"]: r for r in orders_open_backlog_daily(spark, sf_dir).collect()}

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    us_day = 86_400_000_000
    open_day = od["o_orderdate"].astype("datetime64[us]").astype("int64") // us_day
    close_day = (
        li.assign(
            d=li["l_shipdate"].astype("datetime64[us]").astype("int64") // us_day
        )
        .groupby("l_orderkey")["d"]
        .max()
        + 1
    )
    ev = pd.concat(
        [
            pd.DataFrame({"day": open_day, "delta": 1}),
            pd.DataFrame({"day": close_day.to_numpy(), "delta": -1}),
        ]
    )
    byday = ev.groupby("day")["delta"].agg(["sum", "count"]).sort_index()
    backlog = byday["sum"].cumsum()
    assert set(rows) == set(byday.index)
    for day, r in rows.items():
        assert r["backlog"] == backlog.loc[day]
    # the sweep must end at exactly the never-closing orders (orders with
    # no lineitem rows in the truncated fixture)
    n_unclosed = len(od) - od["o_orderkey"].isin(li["l_orderkey"]).sum()
    assert backlog.iloc[-1] == n_unclosed
    assert rows[min(rows)]["backlog"] == rows[min(rows)]["n_opened"]


def test_item_cosine_topk_matches_bruteforce(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        _IIC_K,
        recsys_item_cosine_topk,
    )

    got = {}
    for r in recsys_item_cosine_topk(spark, sf_dir).collect():
        got.setdefault(r["item"], []).append((r["rk"], r["neighbor"], r["sim"]))

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    cnt = items["l_partkey"].value_counts()
    keep = set(cnt[cnt >= 2].index)
    items = items[items["l_partkey"].isin(keep)]
    merged = items.merge(items, on="l_orderkey")
    merged = merged[merged["l_partkey_x"] < merged["l_partkey_y"]]
    cooc = merged.groupby(["l_partkey_x", "l_partkey_y"]).size()

    from collections import defaultdict

    nbrs = defaultdict(list)
    for (a, b), c in cooc.items():
        s = c / np.sqrt(cnt[a] * cnt[b])
        nbrs[a].append((-s, b, c))
        nbrs[b].append((-s, a, c))
    for item, lst in nbrs.items():
        lst.sort()
        want = [(i + 1, n, round(-s, 6)) for i, (s, n, _) in enumerate(lst[:_IIC_K])]
        have = sorted(got[item])
        assert [(rk, n) for rk, n, _ in have] == [(rk, n) for rk, n, _ in want]
        for (_, _, s1), (_, _, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, abs=1e-6)


def test_platt_converges_to_mle(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.metrics import (
        _PLATT_DAMP,
        _PLATT_ROUNDS,
        metric_platt_recalibration,
    )

    rows = {
        r["iteration"]: r
        for r in metric_platt_recalibration(spark, sf_dir).collect()
    }
    assert rows[0]["alpha"] == 0.0 and rows[0]["beta"] == 1.0

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    key = od["o_orderkey"].to_numpy().astype("int64")
    prob = ((key * 2654435761) % 1000).astype(float) / 1000.0
    y = (od["o_totalprice"].to_numpy() > 150000.0).astype(float)
    pc = np.clip(prob, 1e-6, 1 - 1e-6)
    z = np.log(pc / (1 - pc))
    a, b = 0.0, 1.0
    for it in range(1, _PLATT_ROUNDS + 1):
        t = a + b * z
        s = 1 / (1 + np.exp(-t))
        w = s * (1 - s)
        g0, g1 = (s - y).sum(), ((s - y) * z).sum()
        h00, h01, h11 = w.sum(), (w * z).sum(), (w * z * z).sum()
        det = h00 * h11 - h01 * h01
        a = round(a - _PLATT_DAMP * (h11 * g0 - h01 * g1) / det, 6)
        b = round(b - _PLATT_DAMP * (h00 * g1 - h01 * g0) / det, 6)
        assert rows[it]["alpha"] == pytest.approx(a, abs=1e-4)
        assert rows[it]["beta"] == pytest.approx(b, abs=1e-4)
    # label is independent of the hash score: the MLE is
    # (logit(base rate), 0) and damped Newton must be heading there
    base_logit = np.log(y.mean() / (1 - y.mean()))
    assert abs(rows[_PLATT_ROUNDS]["beta"]) < abs(rows[1]["beta"])
    assert rows[_PLATT_ROUNDS]["alpha"] == pytest.approx(base_logit, abs=0.1)
