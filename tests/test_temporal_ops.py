"""asof_join / range_join_binned — boundary semantics and plan shape.

The oracle parity run already pins both against DuckDB's native ASOF /
IEJoin on the fixture; these tests pin the hand-visible edge semantics
(equal-ts inclusivity, no-match nulls, horizon boundaries) and that
neither operator ever plans a BroadcastNestedLoopJoin or an
unpartitioned window.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from usw_big_data_analysis_spark.operators.temporal import asof_join, range_join_binned
from usw_big_data_analysis_spark.plans import explain_formatted

_QUERIES = entrymod.queries()


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c"), (3, _ts(30), "d")],
        "uid int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(6), 60.0)],
        "uid int, ts timestamp, v double",
    )
    return left, right


def test_asof_equal_ts_inclusive_and_no_match_null(spark):
    left, right = _frames(spark)
    got = {
        (r["uid"], r["tag"]): r["v_r"]
        for r in asof_join(left, right, ["uid"], "ts", ["v"]).collect()
    }
    assert got == {
        (1, "a"): 100.0,  # equal ts matches (<= semantics)
        (1, "b"): 150.0,  # latest prior, not first
        (2, "c"): None,  # right row is LATER — no match
        (3, "d"): None,  # key absent from right
    }


def test_range_join_horizon_boundaries(spark):
    left, right = _frames(spark)
    # 5-minute horizon: left (1, :10) reaches right [:05, :10]; (1, :20)
    # reaches [:15, :20]
    got = {
        (r["uid"], r["tag"], r["v_r"])
        for r in range_join_binned(left, right, ["uid"], "ts", 300, ["v"]).collect()
    }
    # lookback only: (1,:10)→right in [:05,:10]; (1,:20)→[:15,:20];
    # (2,:05) looks back to [:00,:05] and its right row is LATER (:06)
    assert got == {(1, "a", 100.0), (1, "b", 150.0)}
    # exact horizon edge is inclusive: shift right row to ts - horizon
    edge_l = spark.createDataFrame([(9, _ts(10), "x")], "uid int, ts timestamp, tag string")
    edge_r = spark.createDataFrame([(9, _ts(5), 5.0)], "uid int, ts timestamp, v double")
    assert range_join_binned(edge_l, edge_r, ["uid"], "ts", 300, ["v"]).count() == 1


def test_temporal_plans_no_nested_loop_no_global_window(spark, sf_dir):
    for name in ("join_asof", "join_range"):
        plan = explain_formatted(_QUERIES[name](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # the asof window is partitioned by user_id — never a raw global sort
    asof_plan = explain_formatted(_QUERIES["join_asof"](spark, sf_dir))
    assert "SinglePartition" not in asof_plan
