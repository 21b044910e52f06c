"""Extra source/sink formats (SURVEY.md §2.1 S2/S3/S6): SAS ingest
cleaning, Excel-style small-dim ingest, Excel sink.

Format status in this container:

- scan_excel / sink_excel (0.meta_data_check.ipynb cell 1;
  1-1.data_processing.ipynb:2571): REAL .xlsx round trip. openpyxl is
  preferred when installed; otherwise the pure-stdlib SpreadsheetML
  writer/reader in ``sources/xlsx_lite.py`` stages an actual ECMA-376 zip.
  Either way the bytes on disk are a genuine xlsx file.
- scan_sas (1-1.data_processing.ipynb:54-55): REAL .sas7bdat round trip.
  The landing column is written as a genuine uncompressed u64 SAS7BDAT by
  the vendored pure-Python writer (``sources/sas7bdat_lite.py``) and parsed
  back by pandas' own independent sas7bdat reader, then the SAS
  missing-value protocol — `b'.'` sentinel strings → NULL + cast
  (1-1.data_processing.ipynb:1910-1914) — runs in Spark. Production still
  converts .sas7bdat → parquet out-of-band (the format is not splittable);
  this staging IS that conversion, format bytes included.
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
           CAST(sum(CAST(qty IS NULL AS BIGINT)) AS BIGINT) AS n_missing,
           round(CAST(sum(CAST(qty AS DECIMAL(25,6))) AS DOUBLE)
                 / count(qty), 6) AS mean_qty
    FROM cleaned
    """,
)
def scan_sas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAS ingest through a REAL .sas7bdat file: the landing column (every
    11th line's quantity arrives as the SAS missing sentinel '.') is written
    as an actual uncompressed u64 SAS7BDAT by the vendored writer
    (sources/sas7bdat_lite.py), parsed back by pandas' own independent
    sas7bdat reader — so the bytes on disk are genuine SAS format, like
    `pd.read_sas('hn22_all.sas7bdat')` at 1-1.data_processing.ipynb:54-55 —
    and then cleaned in Spark: '.' → NULL + cast, the `b'.'` → NaN fix at
    1-1.data_processing.ipynb:1910-1914. SAS landing is inherently a
    driver-side single-file ingest (the format is not splittable and has no
    distributed reader in this container); production converts to parquet
    out-of-band, which is exactly what this staging models."""
    import numpy as np

    from ..sources.sas7bdat_lite import write_sas7bdat

    qty = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))[
        ["l_linenumber", "l_quantity"]
    ]
    raw = np.where(
        qty["l_linenumber"].to_numpy() % 11 == 0,
        ".",
        # str(float) is the shortest round-trip repr: CAST back to DOUBLE is
        # bit-exact for every value, unlike fixed-precision formatting
        qty["l_quantity"].map(str).to_numpy(dtype=object),
    ).astype(object)
    sas_path = os.path.join(_TMP, "usw_q_scan_sas.sas7bdat")
    write_sas7bdat(sas_path, ["qty_raw"], [raw])
    back = pd.read_sas(sas_path, encoding="utf-8")
    landed = spark.createDataFrame(back)
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
    """Small-dimension ingest through a REAL .xlsx file: the sheet is
    staged as an actual ECMA-376 zip (sources/xlsx_lite.py — pure-stdlib
    SpreadsheetML writer/reader; pandas+openpyxl is preferred when
    installed), read back driver-side, landed as an explicit-schema Spark
    frame, and broadcast into the join. The big side never leaves the
    executors."""
    src = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    xlsx = os.path.join(_TMP, "usw_q_scan_excel.xlsx")
    try:
        import openpyxl  # noqa: F401

        src.to_excel(xlsx, index=False)
        pdf = pd.read_excel(xlsx)
    except ImportError:
        from ..sources.xlsx_lite import read_xlsx, write_xlsx

        write_xlsx(xlsx, list(src.columns), src.values.tolist())
        header, rows = read_xlsx(xlsx)
        pdf = pd.DataFrame(rows, columns=header)
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
    collected (tiny), written as a REAL .xlsx (pandas+openpyxl when
    installed, else the pure-stdlib SpreadsheetML writer in
    sources/xlsx_lite.py), then read back — the returned frame is the round
    trip, so the oracle validates writer+reader at the format level."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    summary = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count("*").alias("n_nations"))
    )
    pdf = summary.toPandas()
    path = os.path.join(_TMP, "usw_q_sink_excel.xlsx")
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(path, index=False)
        back = pd.read_excel(path)
    except ImportError:
        from ..sources.xlsx_lite import read_xlsx, write_xlsx

        write_xlsx(path, list(pdf.columns), pdf.values.tolist())
        header, rows = read_xlsx(path)
        back = pd.DataFrame(rows, columns=header)
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
