"""Salted joins / two-level aggs must be result-identical to their plain
forms, and the salted join must spread a hot key across salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from usw_big_data_analysis_spark.operators import skew


def _skewed_frames(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity",
        # synthetic hot key: ~half the rows share key 0
        F.when(F.col("l_orderkey") % 2 == 0, 0)
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
    )
    dim = (
        li.select("k").distinct().withColumn("k_name", F.concat(F.lit("key_"), "k"))
    )
    return li, dim


def test_salted_join_matches_plain(spark, sf_dir):
    li, dim = _skewed_frames(spark, sf_dir)
    plain = li.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("s")
    ).collect()[0]
    salted = skew.salted_join(li, dim, "k", salt_from="l_orderkey", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("s")
    ).collect()[0]
    assert (salted["n"], round(salted["s"], 4)) == (plain["n"], round(plain["s"], 4))


def test_salt_spreads_hot_key(spark, sf_dir):
    li, _ = _skewed_frames(spark, sf_dir)
    salted = li.withColumn("__salt", F.pmod(F.hash("l_orderkey"), 8))
    spread = (
        salted.filter(F.col("k") == 0)
        .groupBy("__salt")
        .count()
        .agg(F.count("*").alias("n_salts"), (F.max("count") / F.min("count")).alias("imb"))
        .collect()[0]
    )
    assert spread["n_salts"] == 8  # hot key present in every salt bucket
    assert spread["imb"] < 1.5  # and roughly evenly


def test_two_level_agg_matches_plain(spark, sf_dir):
    li, _ = _skewed_frames(spark, sf_dir)
    plain = {
        r["k"]: r["n"]
        for r in li.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    two = {
        r["k"]: r["n"]
        for r in skew.two_level_agg(
            li,
            ["k"],
            partial_aggs=[F.count("*").alias("pn")],
            final_aggs=[F.sum("pn").alias("n")],
            salt_from="l_orderkey",
            n_salts=8,
        ).collect()
    }
    assert two == plain
