"""Goldens for the twentieth round-6 batch: rollup_distinct_hll_audit (the
sketch contract + exact mirror) and join_strategy_plan (the estimator and
verdict recomputed from raw counts)."""

from __future__ import annotations

import pandas as pd


def test_hll_rollup_contract_and_exact(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        rollup_distinct_hll_audit,
    )

    rows = {r["r_name"]: r for r in rollup_distinct_hll_audit(spark, sf_dir).collect()}

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")
    re = pd.read_parquet(f"{sf_dir}/region.parquet")
    j = (
        od.merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .merge(re, left_on="n_regionkey", right_on="r_regionkey")
    )
    for rn, grp in j.groupby("r_name"):
        assert rows[rn]["n_exact"] == grp["o_custkey"].nunique()
        assert rows[rn]["within_5pct"] is True
    assert rows["__ALL__"]["n_exact"] == j["o_custkey"].nunique()
    assert rows["__ALL__"]["within_5pct"] is True


def test_join_strategy_plan_matches_counts(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        _JSP_TABLES,
        _JSP_THRESHOLD,
        join_strategy_plan,
    )

    rows = {r["table_name"]: r for r in join_strategy_plan(spark, sf_dir).collect()}
    assert set(rows) == {t for t, _ in _JSP_TABLES}
    for t, w in _JSP_TABLES:
        n = len(pd.read_parquet(f"{sf_dir}/{t}.parquet"))
        r = rows[t]
        assert r["n_rows"] == n
        assert r["est_bytes"] == n * w
        assert r["broadcastable"] == int(n * w <= _JSP_THRESHOLD)
    # at test scale every dim is broadcastable — the verdict column works
    assert all(r["broadcastable"] == 1 for r in rows.values())
