"""Goldens for the thirteenth round-6 batch: approx_overlap_audit (exact
set mirror + the sketch contract) and ops_littles_law_audit (pandas
integral mirror + the identity itself)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_overlap_audit_exact_sets_and_contract(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.scale_ops import (
        _OVL_CUT,
        approx_overlap_audit,
    )

    row = approx_overlap_audit(spark, sf_dir).collect()[0]

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cut = np.datetime64(_OVL_CUT)
    early = set(od.loc[od["o_orderdate"].astype("datetime64[us]") < cut, "o_custkey"])
    late = set(od.loc[od["o_orderdate"].astype("datetime64[us]") >= cut, "o_custkey"])
    assert row["n_a"] == len(early)
    assert row["n_b"] == len(late)
    assert row["n_intersect"] == len(early & late)
    assert row["n_union"] == len(early | late)
    assert row["within_10pct"] is True


def test_littles_law_identity_and_pandas_mirror(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        ops_littles_law_audit,
    )

    row = ops_littles_law_audit(spark, sf_dir).collect()[0]
    # the step-function integral over the full horizon IS the duration sum
    assert row["littles_ratio"] == 1.0
    assert row["l_avg"] == pytest.approx(
        row["lambda_rate"] * row["w_avg"], rel=1e-6
    )

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    us_day = 86_400_000_000
    open_day = (
        od.set_index("o_orderkey")["o_orderdate"]
        .astype("datetime64[us]")
        .astype("int64")
        // us_day
    )
    close_day = (
        li.assign(d=li["l_shipdate"].astype("datetime64[us]").astype("int64") // us_day)
        .groupby("l_orderkey")["d"]
        .max()
        + 1
    )
    both = pd.concat([open_day, close_day], axis=1, join="inner")
    both.columns = ["od", "cd"]
    assert row["n_orders"] == len(both)
    assert row["sum_dur"] == int((both["cd"] - both["od"]).sum())
    assert row["span_days"] == int(both["cd"].max() - both["od"].min())
