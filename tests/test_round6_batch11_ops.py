"""Goldens for the eleventh round-6 batch: rate_shrinkage_eb (beta-binomial
method-of-moments mirror + the shrinkage law) and xyz_volatility_class
(pandas cv mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_eb_shrinkage_matches_numpy_and_shrinks_low_n_most(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.mlprep import rate_shrinkage_eb

    rows = {r["pk"]: r for r in rate_shrinkage_eb(spark, sf_dir).collect()}

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    g = li.groupby("l_partkey").agg(
        n=("l_returnflag", "size"),
        x=("l_returnflag", lambda s: (s == "R").sum()),
    )
    p = g["x"] / g["n"]
    m, v = p.mean(), p.var(ddof=1)
    s = max(m * (1 - m) / v - 1, 0.1)
    assert set(rows) == set(g.index)
    for pk, grp in g.iterrows():
        want = (grp["x"] + m * s) / (grp["n"] + s)
        r = rows[pk]
        assert r["rate_shrunk"] == pytest.approx(want, abs=1e-4)
        assert r["prior_mean"] == pytest.approx(m, abs=1e-4)
        # shrinkage moves every rate toward the prior mean, never past it
        lo, hi = sorted((r["rate_raw"], m))
        assert lo - 1e-6 <= r["rate_shrunk"] <= hi + 1e-6


def test_xyz_matches_pandas_cv(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        xyz_volatility_class,
    )

    rows = {r["xyz"]: r for r in xyz_volatility_class(spark, sf_dir).collect()}

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    day = li["l_shipdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    q = np.floor(li["l_quantity"].to_numpy() + 0.5).astype("int64")
    monthly = (
        pd.DataFrame({"pk": li["l_partkey"], "m": day // 31, "q": q})
        .groupby(["pk", "m"])["q"]
        .sum()
        .reset_index()
    )
    per = monthly.groupby("pk")["q"].agg(["count", "mean", "std"])
    per = per[per["count"] >= 2]
    cv = per["std"] / per["mean"]
    want = pd.cut(
        cv, [-np.inf, 0.5, 1.0, np.inf], right=False, labels=["X", "Y", "Z"]
    ).value_counts()
    for xyz in ["X", "Y", "Z"]:
        if want.get(xyz, 0) == 0:
            assert xyz not in rows
            continue
        assert rows[xyz]["n_parts"] == want[xyz]
        sel = cv[pd.cut(cv, [-np.inf, 0.5, 1.0, np.inf], right=False,
                        labels=["X", "Y", "Z"]) == xyz]
        assert rows[xyz]["avg_cv"] == pytest.approx(sel.mean(), abs=1e-5)
        assert rows[xyz]["min_cv"] == pytest.approx(sel.min(), abs=1e-6)
        assert rows[xyz]["max_cv"] == pytest.approx(sel.max(), abs=1e-6)
