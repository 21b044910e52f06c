"""Golden for supplier_scorecard: numpy z-score mirror over the rebuilt
supplier KPIs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_scorecard_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        _SSC_W,
        supplier_scorecard,
    )

    rows = supplier_scorecard(spark, sf_dir).collect()
    assert len(rows) == 10

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_orderdate"]]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    us_day = 86_400_000_000
    j = j.assign(
        rev_c=np.floor(j["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64"),
        disc_c=np.floor(j["l_discount"].to_numpy() * 100 + 0.5).astype("int64"),
        lat=(
            j["l_shipdate"].astype("datetime64[us]").astype("int64") // us_day
            - j["o_orderdate"].astype("datetime64[us]").astype("int64") // us_day
        ),
    )
    g = j.groupby("l_suppkey").agg(
        rev=("rev_c", lambda s: s.sum() / 100.0),
        lat=("lat", "mean"),
        disc=("disc_c", "mean"),
    )
    z = (g - g.mean()) / g.std(ddof=0)
    comp = _SSC_W[0] * z["rev"] + _SSC_W[1] * z["lat"] + _SSC_W[2] * z["disc"]
    want = comp.sort_values(ascending=False).head(10)
    got_keys = [r["s_suppkey"] for r in rows]
    assert set(got_keys) == set(want.index)
    for r in rows:
        assert r["composite"] == pytest.approx(comp[r["s_suppkey"]], abs=1e-4)
        assert r["revenue"] == pytest.approx(g.loc[r["s_suppkey"], "rev"], abs=0.01)
    # composites strictly ordered in the output
    comps = [r["composite"] for r in rows]
    assert comps == sorted(comps, reverse=True)
