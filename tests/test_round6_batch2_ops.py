"""Independent goldens for the second round-6 operator batch:
minhash_bbit_estimate, linreg_huber_irls, anomaly_seasonal_residual,
tokenizer_char_coverage. As with test_round6_series_ops, each statistic is
recomputed from the raw parquet with numpy/pandas so the Spark/DuckDB pair
can't certify a shared misreading."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest


def test_bbit_estimator_properties(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.dedup import (
        _BB_C0,
        _K,
        minhash_bbit_estimate,
    )

    rows = minhash_bbit_estimate(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # full-width matches imply b-bit matches: est_bbit's raw collision
        # rate C >= m_full/k, so est_bbit >= (est_full - C0)/(1 - C0)
        lo = (r["est_full"] - _BB_C0) / (1.0 - _BB_C0)
        assert r["est_bbit"] >= lo - 1e-6  # both sides carry a 6dp round
        assert 0.0 <= r["est_full"] <= 1.0
        assert r["est_bbit"] <= 1.0 + 1e-9
        assert r["err_full"] == pytest.approx(
            abs(r["est_full"] - r["exact_jaccard"]), abs=2e-6
        )
        assert r["err_bbit"] == pytest.approx(
            abs(r["est_bbit"] - r["exact_jaccard"]), abs=2e-6
        )
    # identical signatures (est_full = 1) must give est_bbit = 1
    for r in rows:
        if r["est_full"] == 1.0:
            assert r["est_bbit"] == pytest.approx(1.0)


def test_huber_irls_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.stats_tests import (
        _HUB_DELTA,
        _HUB_ROUNDS,
        _HUB_WSCALE,
        linreg_huber_irls,
    )

    rows = {
        r["iteration"]: r for r in linreg_huber_irls(spark, sf_dir).collect()
    }
    assert set(rows) == set(range(_HUB_ROUNDS + 1))

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = np.floor(li["l_quantity"].to_numpy() + 0.5).astype("int64").astype(float)
    yc = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
    y = yc / 100.0
    n = len(x)

    def solve(w):
        sw, swx, swy = w.sum(), (w * x).sum(), (w * y).sum()
        swxx, swxy = (w * x * x).sum(), (w * x * y).sum()
        b1 = round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 6)
        b0 = round((swy - b1 * swx) / sw, 6)
        return b0, b1

    b0, b1 = solve(np.ones(n))
    assert rows[0]["beta0"] == pytest.approx(b0, abs=1e-3)
    assert rows[0]["beta1"] == pytest.approx(b1, abs=1e-5)
    for i in range(1, _HUB_ROUNDS + 1):
        r = y - (b0 + b1 * x)
        w = np.where(np.abs(r) <= _HUB_DELTA, 1.0, _HUB_DELTA / np.abs(r))
        wi = np.floor(w * _HUB_WSCALE + 0.5)
        assert rows[i]["sum_w6"] == pytest.approx(wi.sum(), rel=1e-9)
        assert rows[i]["n_down"] == int((wi < _HUB_WSCALE).sum())
        b0, b1 = solve(wi)
        assert rows[i]["beta0"] == pytest.approx(b0, abs=1e-3)
        assert rows[i]["beta1"] == pytest.approx(b1, abs=1e-5)


def test_seasonal_residual_matches_pandas(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.behavior import (
        _ASR_Z,
        anomaly_seasonal_residual,
    )

    got = {
        r["day"]: r for r in anomaly_seasonal_residual(spark, sf_dir).collect()
    }

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = (
        od["o_orderdate"].astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    daily = d.value_counts().sort_index()
    dow = daily.index % 7
    expected = daily.groupby(dow).transform("mean")
    r = daily.to_numpy() - expected.to_numpy()
    ar = np.sort(np.abs(r))
    t = len(ar)
    mad = ar[(t + 1) // 2 - 1]  # discrete lower median
    z = 0.6745 * r / mad
    want = set(daily.index[np.abs(z) > _ASR_Z])
    assert set(got) == want
    for day, row in got.items():
        i = daily.index.get_loc(day)
        assert row["z_mad"] == pytest.approx(z[i], abs=1e-5)


def test_char_coverage_matches_counter(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.text_ops import (
        tokenizer_char_coverage,
    )

    rows = tokenizer_char_coverage(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = collections.Counter("".join(docs["text"].tolist()))
    assert {r["ch"]: r["n"] for r in rows} == dict(cnt)
    total = sum(cnt.values())
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    kept = {}
    cov = {}
    for rank, (ch, n) in enumerate(order, 1):
        kept[ch] = int(cum * 10000 < total * 9995)
        cum += n
        cov[ch] = cum / total
    for r in rows:
        assert r["rank"] == [c for c, _ in order].index(r["ch"]) + 1
        assert r["kept_9995"] == kept[r["ch"]]
        assert r["coverage"] == pytest.approx(cov[r["ch"]], abs=1e-6)
    # the cut must drop at least the rarest char only if its prefix already
    # covers 99.95% — i.e. kept is a prefix of the rank order
    ranks_kept = sorted(r["rank"] for r in rows if r["kept_9995"])
    assert ranks_kept == list(range(1, len(ranks_kept) + 1))
