"""Extra source/sink formats (SURVEY.md §2.1 S2/S3/S6): SAS ingest
cleaning, Excel-style small-dim ingest, Excel sink.

The container has no SAS reader or openpyxl, so each operator is split into
(a) the Spark-side semantics the reference depends on — which IS implemented
and oracle-checked — and (b) the format codec, gated behind an import-try
with a documented fallback:

- scan_sas  (1-1.data_processing.ipynb:54-55): the part that matters is the
  SAS missing-value protocol — `b'.'` sentinel strings → NULL + cast
  (1-1.data_processing.ipynb:1910-1914). Production path converts
  .sas7bdat → parquet out-of-band (or `spark.read.format("com.github.
  saurfang.sas.spark")` where the jar exists); the cleaning is checked here.
- scan_excel (0.meta_data_check.ipynb cell 1; legacy/modeling.py:87): the
  metadata sheet is a tiny dimension ingested driver-side with pandas →
  `spark.createDataFrame` → broadcast — exactly the pattern this query
  exercises (with pandas reading parquet instead of xlsx when openpyxl is
  absent).
- sink_excel (1-1.data_processing.ipynb:2571): small-output-only driver-side
  `toPandas().to_excel`, CSV fallback; the written file is read back and
  returned, so the oracle checks the full round trip.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_TMP = tempfile.gettempdir()


# --- S2: SAS scan → sentinel cleaning ---------------------------------------
@query(
    "scan_sas",
    oracle="""
    WITH landed AS (
      SELECT CASE WHEN l_linenumber % 11 = 0 THEN '.'
                  ELSE CAST(l_quantity AS VARCHAR) END AS qty_raw
      FROM lineitem
    ),
    cleaned AS (
      SELECT CASE WHEN qty_raw = '.' THEN NULL
                  ELSE CAST(qty_raw AS DOUBLE) END AS qty
      FROM landed
    )
    SELECT count(*) AS n_rows,
           sum(CAST(qty IS NULL AS BIGINT)) AS n_missing,
           round(CAST(sum(CAST(qty AS DECIMAL(25,6))) AS DOUBLE)
                 / count(qty), 6) AS mean_qty
    FROM cleaned
    """,
)
def scan_sas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAS ingest protocol over a simulated landing table: every 11th line's
    quantity arrives as the SAS missing sentinel '.', cleaned to NULL then
    cast — the `b'.'` → NaN fix at 1-1.data_processing.ipynb:1910-1914."""
    li = load_table(spark, sf_dir, "lineitem")
    landed = li.select(
        F.when(F.col("l_linenumber") % 11 == 0, ".")
        .otherwise(F.col("l_quantity").cast("string"))
        .alias("qty_raw")
    )
    cleaned = landed.select(
        F.when(F.col("qty_raw") == ".", None)
        .otherwise(F.col("qty_raw").cast("double"))
        .alias("qty")
    )
    return cleaned.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("qty").isNull().cast("bigint")).alias("n_missing"),
        F.round(
            F.sum(F.col("qty").cast("decimal(25,6)")).cast("double") / F.count("qty"),
            6,
        ).alias("mean_qty"),
    )


# --- S3: Excel-style metadata-dim ingest ------------------------------------
@query(
    "scan_excel",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def scan_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension ingest: the sheet is read driver-side with pandas
    (xlsx via openpyxl when present; this container lacks it, so pandas
    reads the parquet twin — same driver-side path), lands as an explicit-
    schema Spark frame, and is broadcast into the join. The big side never
    leaves the executors."""
    try:
        import openpyxl  # noqa: F401

        xlsx = os.path.join(_TMP, "usw_q_scan_excel.xlsx")
        pd.read_parquet(os.path.join(sf_dir, "nation.parquet")).to_excel(
            xlsx, index=False
        )
        pdf = pd.read_excel(xlsx)
    except ImportError:
        pdf = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    dim = spark.createDataFrame(pdf[["n_nationkey", "n_name", "n_regionkey"]])
    region = load_table(spark, sf_dir, "region")
    return (
        F.broadcast(dim)
        .join(region, dim.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))
    )


# --- S6: Excel sink (small outputs only) ------------------------------------
@query(
    "sink_excel",
    oracle="""
    SELECT r.r_name AS region_name, count(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def sink_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side Excel sink for small summaries (the reference writes its
    processed-metadata sheets this way). The result is aggregated in Spark,
    collected (tiny), written with pandas (to_excel, CSV fallback when
    openpyxl is absent), then read back — the returned frame is the round
    trip, so the oracle validates writer+reader."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    summary = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count("*").alias("n_nations"))
    )
    pdf = summary.toPandas()
    try:
        import openpyxl  # noqa: F401

        path = os.path.join(_TMP, "usw_q_sink_excel.xlsx")
        pdf.to_excel(path, index=False)
        back = pd.read_excel(path)
    except ImportError:
        path = os.path.join(_TMP, "usw_q_sink_excel.csv")
        pdf.to_csv(path, index=False)
        back = pd.read_csv(path)
    return spark.createDataFrame(back)


# --- partitioned layout write + partition-pruned scan ------------------------
@query(
    "sink_partitioned_scan",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sum_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type ORDER BY event_type
    """,
)
def sink_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout roundtrip: events written
    ``partitionBy(event_type)``, read back with a partition-key filter.
    The filter prunes DIRECTORIES — the scan's PartitionFilters (asserted
    in tests/test_plan_quality.py) means non-matching partitions are never
    opened, the first-order I/O lever at 100 TB (date/tenant partition
    keys in production; low-cardinality event_type here)."""
    out = os.path.join(tempfile.mkdtemp(prefix="part_events_"), "events_by_type")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )
