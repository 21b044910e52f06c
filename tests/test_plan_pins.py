"""Plan-shape pins for the scale-sensitive extension queries: these
assert the SHAPE that makes each operator viable at 100 TB, so a refactor
that silently degrades to a quadratic or single-partition plan fails CI
even while results stay correct at test SF."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fuzzy_join_stays_equi_join(spark):
    # deletion-neighborhood blocking must plan as a hash/merge equi-join —
    # a CartesianProduct or nested-loop means the blocking key was lost
    from usw_big_data_analysis_spark.queries.corpus_ops import fuzzy_join_names

    plan = _plan(fuzzy_join_names(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_wau_has_no_window(spark):
    # the sliding distinct is contribute-to-spine explode + hash aggregate;
    # a Window operator here would mean a per-day sort crept back in
    from usw_big_data_analysis_spark.queries.behavior import rolling_wau

    plan = _plan(rolling_wau(spark, SF_DIR))
    assert "Window" not in plan


def test_basket_pairs_topk_is_take_ordered(spark):
    # the final top-50 must be distributed top-k, not a global sort
    from usw_big_data_analysis_spark.queries.pipeline_ops import basket_pairs

    plan = _plan(basket_pairs(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan or "Sort [" not in plan.split(
        "TakeOrderedAndProject"
    )[0]


def test_q3_topk_is_take_ordered(spark):
    from usw_big_data_analysis_spark.queries.tpch_ext import q3_shipping_priority

    plan = _plan(q3_shipping_priority(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_heavy_hitters_candidates_broadcast(spark):
    # the exact verify pass must semi-join against BROADCAST candidates —
    # a shuffled join would re-shuffle the full key stream
    from usw_big_data_analysis_spark.queries.scale_ops import heavy_hitters_mg

    plan = _plan(heavy_hitters_mg(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
