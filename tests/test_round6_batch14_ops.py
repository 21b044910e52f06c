"""Goldens for the fourteenth round-6 batch: forecast_croston_intermittent
(sequential-fold pandas mirror of the Croston recursion) and
metric_label_permutation_test (pure-Python permutation mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_croston_matches_sequential_fold(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        _CRO_W,
        forecast_croston_intermittent,
    )

    rows = {
        r["pk"]: r for r in forecast_croston_intermittent(spark, sf_dir).collect()
    }

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    ship = li["l_shipdate"].astype("datetime64[us]")
    mi = ship.dt.year * 12 + ship.dt.month
    q = np.floor(li["l_quantity"].to_numpy() + 0.5).astype("int64")
    monthly = (
        pd.DataFrame({"pk": li["l_partkey"], "mi": mi, "z": q})
        .groupby(["pk", "mi"])["z"]
        .sum()
        .reset_index()
        .sort_values(["pk", "mi"])
    )

    def ses(vals):
        s = float(vals[0])
        for v in vals[1:]:
            s = (s + v) / 2.0
        return s

    checked = 0
    for pk, grp in monthly.groupby("pk"):
        full_mi = grp["mi"].to_numpy()
        full_z = grp["z"].to_numpy()
        gaps_full = np.diff(full_mi)
        take = min(len(full_z), _CRO_W)
        z = full_z[-take:]
        gaps = gaps_full[len(full_mi) - take :] if take >= 2 else []
        if take < 2:
            assert pk not in rows
            continue
        zl, pl = ses(z), ses(list(gaps))
        r = rows[pk]
        assert r["n_events"] == take
        assert r["z_level"] == pytest.approx(zl, abs=1e-5)
        assert r["p_level"] == pytest.approx(pl, abs=1e-5)
        assert r["croston_forecast"] == pytest.approx(zl / pl, abs=1e-4)
        checked += 1
    assert checked > 0


def test_permutation_test_matches_python(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.metrics import (
        _LPT_B,
        _LPT_K,
        metric_label_permutation_test,
    )

    row = metric_label_permutation_test(spark, sf_dir).collect()[0]

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    key = od["o_orderkey"].to_numpy().astype("int64")
    label = (od["o_totalprice"].to_numpy() > 150000.0).astype(int)
    prob = ((key * 2654435761) % 1000).astype(float) / 1000.0
    pred = (prob >= 0.5).astype(int)
    order = np.argsort(key)
    key, label, pred = key[order], label[order], pred[order]
    b = key % _LPT_B
    c_true = int((pred == label).sum())
    n = len(key)
    c_ks = []
    for k in range(1, _LPT_K + 1):
        c_k = 0
        for bucket in np.unique(b):
            idx = np.where(b == bucket)[0]  # already id-ordered
            rolled = np.roll(label[idx], -k)  # rank r reads rank r+k
            c_k += int((pred[idx] == rolled).sum())
        c_ks.append(c_k)
    assert row["n"] == n
    assert row["acc_true"] == pytest.approx(c_true / n, abs=1e-6)
    assert row["acc_perm_mean"] == pytest.approx(
        sum(c_ks) / (_LPT_K * n), abs=1e-6
    )
    n_ge = sum(c >= c_true for c in c_ks)
    assert row["n_ge"] == n_ge
    assert row["p_value"] == pytest.approx((1 + n_ge) / (_LPT_K + 1), abs=1e-6)
