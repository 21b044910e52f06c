"""Bucketed co-located joins: the Exchange must vanish from the join plan,
and results must equal the plain (shuffled) join."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.operators import bucketing
from usw_big_data_analysis_spark.plans import explain_formatted


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    base = os.path.join(tempfile.gettempdir(), "usw_bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    ).withColumnRenamed("c_custkey", "o_custkey")
    bucketing.write_bucketed(
        orders, "t_orders_b", os.path.join(base, "orders_b"),
        ["o_custkey"], n_buckets=4, sort_cols=["o_custkey"],
    )
    bucketing.write_bucketed(
        customer, "t_customer_b", os.path.join(base, "customer_b"),
        ["o_custkey"], n_buckets=4, sort_cols=["o_custkey"],
    )
    return "t_orders_b", "t_customer_b"


def test_colocated_join_elides_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketing.colocated_join(spark, lt, rt, ["o_custkey"])
    plan = explain_formatted(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides read pre-bucketed


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    fast = bucketing.colocated_join(spark, lt, rt, ["o_custkey"])
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    )
    assert fast.count() == plain.count()
    a = fast.agg(F.sum("o_totalprice").alias("s")).collect()[0]["s"]
    b = plain.agg(F.sum("o_totalprice").alias("s")).collect()[0]["s"]
    assert abs(a - b) < 1e-6
