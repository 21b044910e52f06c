"""cyclic_lead — the bucketed distributed cyclic shift.

Correctness: bit-identical to the naive unpartitioned
``lead(v) OVER (ORDER BY k…)`` + global-first wrap on lineitem and on
tiny frames where rows ≪ buckets (most buckets empty — exercises the
next-NON-EMPTY-bucket stitching). Scale: feature_importance_perm's plan
must never move raw scan rows to a single partition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.test_rank_ops import _single_partition_exchanges_see_only_aggregates
from usw_big_data_analysis_spark.operators.shift_ops import cyclic_lead
from usw_big_data_analysis_spark.plans import explain_formatted
from usw_big_data_analysis_spark.sources import load_table

_QUERIES = entrymod.queries()


def _naive(df, order_cols, v):
    w = Window.orderBy(*order_cols)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return df.select(
        *df.columns,
        F.coalesce(F.lead(v).over(w), F.first(v).over(wall)).alias(f"{v}_next"),
    )


def test_cyclic_lead_matches_naive_on_lineitem(spark, sf_dir):
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
    # quantity+extendedprice complete a unique key (checked vs DuckDB)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    keys = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    fast = {
        tuple(r)
        for r in cyclic_lead(li, keys, ["l_quantity"]).collect()
    }
    naive = {tuple(r) for r in _naive(li, keys, "l_quantity").collect()}
    assert fast == naive


def test_cyclic_lead_sparse_buckets_and_single_row(spark):
    # 5 rows, 1024 buckets: nearly all buckets empty, wrap must chain to
    # the next NON-EMPTY bucket, and the max row wraps to the global first
    df = spark.createDataFrame(
        [(10, "a"), (300, "b"), (301, "c"), (7000, "d"), (90000, "e")],
        "k int, v string",
    )
    got = {
        (r["k"], r["v_next"]) for r in cyclic_lead(df, ["k"], ["v"]).collect()
    }
    assert got == {(10, "b"), (300, "c"), (301, "d"), (7000, "e"), (90000, "a")}

    one = spark.createDataFrame([(1, "x")], "k int, v string")
    assert cyclic_lead(one, ["k"], ["v"]).collect()[0]["v_next"] == "x"


def test_cyclic_lead_null_values_survive(spark):
    # a NULL value mid-sequence must be carried as the next value, not
    # mistaken for "last row of bucket" and replaced by the wrap
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "k int, v double"
    )
    got = {(r["k"], r["v_next"]) for r in cyclic_lead(df, ["k"], ["v"]).collect()}
    assert got == {(1, None), (2, 3.0), (3, 1.0)}


def test_feature_importance_perm_never_single_partition_raw_rows(spark, sf_dir):
    plan = explain_formatted(_QUERIES["feature_importance_perm"](spark, sf_dir))
    assert _single_partition_exchanges_see_only_aggregates(plan, require_sp=False)
