"""Property-based checks (hypothesis) for the bit-stability kernels: the
integer-split sum must equal the exact rational sum for ANY set of 2-decimal
values under ANY partitioning — this is the invariant every oracle-checked
aggregate rests on."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st

from usw_big_data_analysis_spark.functions import numeric as N


@st.composite
def two_decimal_values(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    cents = draw(
        st.lists(
            st.integers(min_value=0, max_value=20_000_000),
            min_size=n,
            max_size=n,
        )
    )
    return [c / 100.0 for c in cents]


@given(two_decimal_values(), st.integers(min_value=1, max_value=8))
@settings(max_examples=10, deadline=None)
def test_isum_matches_exact_rational_sum(spark, vals, parts):
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(parts)
    row = df.agg(*N.isum_aggs(N.iscaled("x", 2), "s")).select(
        N.isum_value("s", 2).alias("v")
    ).collect()[0]
    exact = sum(Decimal(str(round(v * 100))) for v in vals) / Decimal(100)
    assert row["v"] == float(exact)  # bit-equal: one deterministic rounding


@given(two_decimal_values())
@settings(max_examples=10, deadline=None)
def test_isum_partition_invariance(spark, vals):
    one = spark.createDataFrame([(v,) for v in vals], "x double").coalesce(1)
    many = spark.createDataFrame([(v,) for v in vals], "x double").repartition(7)
    get = lambda df: df.agg(*N.isum_aggs(N.iscaled("x", 2), "s")).select(
        N.isum_value("s", 2).alias("v")
    ).collect()[0]["v"]
    assert get(one) == get(many)
