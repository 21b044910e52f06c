"""Goldens for the fifth round-6 batch: survival_cindex (brute-force pair
count over the per-user table) and embed_dim_variance_audit (numpy moment
mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_cindex_matches_bruteforce_pairs(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.behavior import (
        _CIX_BINS,
        _CIX_CENSOR_DAYS,
        survival_cindex,
    )

    row = survival_cindex(spark, sf_dir).collect()[0]

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ev = ev.assign(day=day)
    per = ev.groupby("user_id")["day"].agg(["min", "max"])
    dmax = per["max"].max()
    t = (per["max"] - per["min"]).to_numpy()
    died = (per["max"] <= dmax - _CIX_CENSOR_DAYS).to_numpy().astype(int)
    fw = (
        ev.merge(per["min"].rename("d0"), on="user_id")
        .query("day < d0 + 7")
        .groupby("user_id")
        .size()
        .clip(upper=_CIX_BINS - 1)
        .reindex(per.index)
        .to_numpy()
    )
    n = len(t)
    conc = tie = comp = 0
    for i in range(n):
        if not died[i]:
            continue
        later = t > t[i]
        comp += int(later.sum())
        conc += int((later & (fw > fw[i])).sum())
        tie += int((later & (fw == fw[i])).sum())
    assert row["n_users"] == n
    assert row["n_comparable"] == comp
    assert row["n_concordant"] == conc
    assert row["n_tied_marker"] == tie
    if comp:
        assert row["c_index"] == pytest.approx(
            (2 * conc + tie) / (2 * comp), abs=1e-6
        )
    assert comp > 0  # the 1-day churn gap must produce a non-degenerate audit


def test_dim_variance_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        embed_dim_variance_audit,
    )

    rows = {r["pos"]: r for r in embed_dim_variance_audit(spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, d = X.shape
    assert set(rows) == set(range(d))
    var = X.var(axis=0)  # population variance, ddof=0
    total = np.round(var, 9).sum()
    for pos in range(d):
        r = rows[pos]
        assert r["n"] == n
        assert r["mean_v"] == pytest.approx(X[:, pos].mean(), abs=1e-5)
        assert r["var_v"] == pytest.approx(var[pos], abs=1e-5)
        assert r["low_var_flag"] == int(var[pos] * d * 10.0 < total)
