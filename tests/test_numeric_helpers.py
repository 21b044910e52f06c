"""Unit tests for the bit-stable numeric helpers: the Spark expression and
its SQL fragment must agree bit-for-bit regardless of partition count."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usw_big_data_analysis_spark.functions import numeric as N


def test_dsum_partition_order_independent(spark):
    vals = [(float(i) * 0.01,) for i in range(1, 2001)]
    one = spark.createDataFrame(vals, "x double").coalesce(1)
    many = spark.createDataFrame(vals, "x double").repartition(16)
    s1 = one.agg(N.dsum("x").alias("s")).collect()[0]["s"]
    s2 = many.agg(N.dsum("x").alias("s")).collect()[0]["s"]
    assert s1 == s2  # bit-equal, not approx
    assert math.isclose(s1, sum(v[0] for v in vals), rel_tol=1e-12)


def test_dstd_matches_closed_form(spark):
    vals = [(float(v),) for v in (2, 4, 4, 4, 5, 5, 7, 9)]
    df = spark.createDataFrame(vals, "x double")
    out = df.agg(
        N.dstd("x", ddof=0).alias("pop"), N.dvar("x", ddof=1).alias("var1")
    ).collect()[0]
    assert out["pop"] == 2.0
    assert out["var1"] == round(32.0 / 7.0, 6)


def test_dcorr_perfect_correlation(spark):
    df = spark.createDataFrame([(float(i), 2.0 * i + 1) for i in range(50)], "x double, y double")
    r = df.agg(N.dcorr("x", "y").alias("r")).collect()[0]["r"]
    assert r == 1.0


def test_sql_fragments_parse_in_duckdb(duck):
    row = duck.execute(
        f"SELECT {N.sql_dsum('l_quantity')} AS s, {N.sql_dstd('l_quantity')} AS sd, "
        f"{N.sql_dcorr('l_quantity', 'l_extendedprice')} AS r FROM lineitem"
    ).fetchone()
    assert row[0] > 0 and row[1] > 0 and -1.0 <= row[2] <= 1.0


def test_fround_matches_duckdb_round_on_random_doubles(spark, duck):
    """The primitive floor(abs+0.5) rounding must equal DuckDB's double
    round() (the oracle convention) across random magnitudes and both
    signs — this is the contract every converted ROUND@ROW site relies
    on (plans/inspect.perrow_round_count)."""
    import random

    rng = random.Random(20260814)
    import math

    b = math.nextafter(0.5e-6, 0)  # scaled: just under a half — the value
    # where the naive floor(y+0.5) form rounds up one early
    vals = [
        (rng.uniform(-1e6, 1e6),) for _ in range(2000)
    ] + [
        (x,)
        for x in (0.0, -0.5, 0.5, 1.5, -1.5, 2.675, -2.675, 0.1234565,
                  b, -b, 1 + b, -(1 + b))
    ]
    df = spark.createDataFrame(vals, "x double")
    got = [
        r["y"]
        for r in df.select(N.fround(F.col("x"), 6).alias("y"))
        .collect()
    ]
    exp = [
        r[0]
        for r in duck.execute(
            "SELECT round(x, 6) FROM (SELECT unnest(?) AS x)", [[v[0] for v in vals]]
        ).fetchall()
    ]
    assert got == exp  # bit-equal, both signs


def test_fround_int_half_away_from_zero(spark):
    df = spark.createDataFrame(
        [(-2.5,), (-1.5,), (-0.5,), (0.5,), (1.5,), (2.5,), (2.4999,), (-2.4999,)],
        "x double",
    )
    got = [r["y"] for r in df.select(N.fround_int(F.col("x")).alias("y")).collect()]
    assert got == [-3, -2, -1, 1, 2, 3, 2, -2]


def test_spark_fround_string_twin_is_double_typed(spark):
    df = spark.createDataFrame([(1.2345675,), (-1.2345675,)], "x double")
    out = df.selectExpr(N.spark_fround("x", 6) + " AS y")
    assert dict(out.dtypes)["y"] == "double"
    col = [r["y"] for r in out.collect()]
    ref = [
        r["y"] for r in df.select(N.fround(F.col("x"), 6).alias("y")).collect()
    ]
    assert col == ref
