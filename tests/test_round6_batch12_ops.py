"""Goldens for the twelfth round-6 batch: seasonal_periodogram (numpy FFT-at-
frequency mirror) and graph_assortativity (networkx-free numpy Pearson over
the rebuilt edge list)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_periodogram_matches_numpy_dft(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        _PGRAM_PERIODS,
        seasonal_periodogram,
    )

    rows = {r["period"]: r for r in seasonal_periodogram(spark, sf_dir).collect()}
    assert set(rows) == set(_PGRAM_PERIODS)

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = (
        od["o_orderdate"].astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    daily = d.value_counts().sort_index()
    n, s = len(daily), daily.sum()
    xn = (n * daily.to_numpy() - s).astype(float)
    days = daily.index.to_numpy()
    powers = {}
    for P in _PGRAM_PERIODS:
        # the query uses 12dp-rounded literals; mirror that
        cos = np.array([round(np.cos(2 * np.pi * k / P), 12) for k in range(P)])
        sin = np.array([round(np.sin(2 * np.pi * k / P), 12) for k in range(P)])
        a = (xn * cos[days % P]).sum()
        b = (xn * sin[days % P]).sum()
        powers[P] = a * a + b * b
        assert rows[P]["a"] == pytest.approx(a, rel=1e-6, abs=2e-3)
        assert rows[P]["b"] == pytest.approx(b, rel=1e-6, abs=2e-3)
        assert rows[P]["power"] == pytest.approx(powers[P], rel=1e-6, abs=2e-3)
    tot = sum(powers.values())
    for P in _PGRAM_PERIODS:
        assert rows[P]["power_share"] == pytest.approx(powers[P] / tot, abs=1e-5)
    assert sum(r["power_share"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-5
    )


def test_assortativity_matches_numpy_pearson(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.graph_ext import (
        graph_assortativity,
    )

    row = graph_assortativity(spark, sf_dir).collect()[0]

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    cnt = items["l_partkey"].value_counts()
    keep = set(cnt[cnt >= 2].index)
    items = items[items["l_partkey"].isin(keep)]
    m = items.merge(items, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]].drop_duplicates(
        ["l_partkey_x", "l_partkey_y"]
    )
    und = pd.concat(
        [
            m.rename(columns={"l_partkey_x": "u", "l_partkey_y": "v"})[["u", "v"]],
            m.rename(columns={"l_partkey_y": "u", "l_partkey_x": "v"})[["u", "v"]],
        ]
    )
    deg = und["u"].value_counts()
    dx = deg[und["u"]].to_numpy().astype(float)
    dy = deg[und["v"]].to_numpy().astype(float)
    r = np.corrcoef(dx, dy)[0, 1]
    assert row["n_directed_edges"] == len(und)
    assert row["assortativity"] == pytest.approx(r, abs=1e-5)
    assert -1.0 <= row["assortativity"] <= 1.0
