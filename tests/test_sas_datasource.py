"""SAS connector contract: the page-level reader matches pandas' own
independent sas7bdat parser bit-for-bit, and the Python Data Source maps
exactly one Spark partition to one SAS data page."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.sources.sas7bdat_lite import write_sas7bdat
from usw_big_data_analysis_spark.sources.sas7bdat_reader import (
    read_frame,
    read_meta,
)
from usw_big_data_analysis_spark.sources.sas_datasource import register


@pytest.fixture(scope="module")
def sas_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("sas_ds")
    path = os.path.join(str(d), "multi.sas7bdat")
    n = 7321  # deliberately not a page multiple: last page is partial
    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(50.0, 12.0, n), 6)
    labs = np.array([f"tag{i % 13}" for i in range(n)], dtype=object)
    write_sas7bdat(path, ["v", "lab"], [vals, labs], page_size=4096)
    return path, vals, labs


def test_reader_matches_pandas_bitexact(sas_file):
    path, vals, labs = sas_file
    mine = read_frame(path)
    ref = pd.read_sas(path, encoding="utf-8")
    assert np.array_equal(mine["v"], ref["v"].to_numpy())
    assert list(mine["lab"]) == list(ref["lab"])
    # and both match the source arrays (writer+reader round trip)
    assert np.array_equal(mine["v"], vals)


def test_meta_counts(sas_file):
    path, vals, _ = sas_file
    meta = read_meta(path)
    assert meta.row_count == len(vals)
    rows_per_page = (4096 - 40) // meta.row_length
    import math

    assert len(meta.data_page_indices) == math.ceil(len(vals) / rows_per_page)


def test_datasource_page_range_partitions(spark, sas_file):
    """r07: partitions are page RANGES sized from maxPartitionBytes (pages
    stay the split atoms). Forcing maxPartitionBytes down to one page must
    recover exactly one partition per page; the default must still fan out
    to more than one task for a multi-page file."""
    path, vals, labs = sas_file
    register(spark)
    meta = read_meta(path)
    per_page = (
        spark.read.format("sas_lite")
        .option("max_partition_bytes", str(meta.page_size))
        .load(path)
    )
    assert per_page.rdd.getNumPartitions() == len(meta.data_page_indices)
    df = spark.read.format("sas_lite").load(path)
    nparts = df.rdd.getNumPartitions()
    assert 1 < nparts <= len(meta.data_page_indices)
    got = df.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("v").cast("decimal(25,6)")), 6).alias("s"),
        F.countDistinct("lab").alias("d"),
    ).collect()[0]
    assert got["n"] == len(vals)
    assert float(got["s"]) == pytest.approx(float(np.sum(vals)), abs=1e-6)
    assert got["d"] == 13


def test_datasource_row_alignment(spark, sas_file):
    """Column values must stay paired per row across page boundaries:
    lab is a pure function of the row index parity encoded in v's order.
    Rebuild (lab -> count) both ways."""
    path, vals, labs = sas_file
    register(spark)
    df = spark.read.format("sas_lite").load(path)
    got = {
        r["lab"]: r["n"]
        for r in df.groupBy("lab").agg(F.count("*").alias("n")).collect()
    }
    expect = pd.Series(labs).value_counts().to_dict()
    assert got == expect


def test_distributed_write_roundtrip(spark, tmp_path):
    """8-task write -> two-phase commit -> single valid SAS file that
    pandas' independent parser accepts; staging fully cleaned up."""
    dest = os.path.join(str(tmp_path), "dist.sas7bdat")
    register(spark)
    df = (
        spark.range(0, 4000)
        .selectExpr("CAST(id AS DOUBLE) * 0.25D AS v", "concat('k', id % 5) AS lab")
        .repartition(8, "v")
    )
    (
        df.write.format("sas_lite")
        .option("path", dest)
        .option("width_lab", "4")
        .mode("overwrite")
        .save()
    )
    ref = pd.read_sas(dest, encoding="utf-8")
    assert len(ref) == 4000
    assert float(ref["v"].sum()) == sum(i * 0.25 for i in range(4000))
    assert ref["lab"].nunique() == 5
    assert [f for f in os.listdir(str(tmp_path)) if ".part" in f] == []
    # reader agrees with pandas bit-for-bit
    mine = read_frame(dest)
    assert np.array_equal(np.sort(mine["v"]), np.sort(ref["v"].to_numpy()))


def test_distributed_write_declared_width_enforced(spark, tmp_path):
    dest = os.path.join(str(tmp_path), "narrow.sas7bdat")
    register(spark)
    df = spark.range(0, 10).selectExpr("CAST(id AS DOUBLE) AS v", "'toolong' AS lab")
    with pytest.raises(Exception, match="exceeds declared width|toolong"):
        (
            df.write.format("sas_lite")
            .option("path", dest)
            .option("width_lab", "3")
            .mode("overwrite")
            .save()
        )
    assert not os.path.exists(dest)  # abort left no torn file


def test_distributed_write_null_string_is_blank(spark, tmp_path):
    """NULL string cells write as the SAS blank missing value, never the
    Python repr."""
    dest = os.path.join(str(tmp_path), "nulls.sas7bdat")
    register(spark)
    df = spark.range(0, 6).selectExpr(
        "CAST(id AS DOUBLE) AS v",
        "CASE WHEN id % 2 = 0 THEN concat('x', id) ELSE NULL END AS lab",
    )
    (
        df.write.format("sas_lite")
        .option("path", dest)
        .option("width_lab", "4")
        .mode("overwrite")
        .save()
    )
    ref = pd.read_sas(dest, encoding="utf-8")
    # pandas maps the SAS blank missing string to NaN — the round trip
    # preserves missingness, never a Python 'None' repr
    got = [x if isinstance(x, str) and x else None for x in ref["lab"]]
    assert got == ["x0", None, "x2", None, "x4", None]
