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

import contextlib
import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._shared import process_tmp as _process_tmp
from ..sources import load_table


@contextlib.contextmanager
def _staging(prefix: str):
    """Private uuid-suffixed staging dir for driver-side format round trips.

    Fixed world-shared paths (/tmp/usw_q_*.xlsx) race under concurrent
    sessions — one process can read another's half-written file. mkdtemp
    gives each call its own 0700 directory; removed when the round trip is
    done."""
    d = tempfile.mkdtemp(prefix=prefix)
    try:
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


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
    with _staging("usw_q_scan_sas_") as d:
        sas_path = os.path.join(d, "landed.sas7bdat")
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
    with _staging("usw_q_scan_excel_") as d:
        xlsx = os.path.join(d, "dim.xlsx")
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
    with _staging("usw_q_sink_excel_") as d:
        path = os.path.join(d, "summary.xlsx")
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
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
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
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


# --- JSONL scan (the LLM-corpus interchange format) --------------------------
@query(
    "scan_jsonl",
    oracle="""
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(length(text)) AS BIGINT) AS sum_len
    FROM documents GROUP BY source, lang
    """,
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines round trip: the documents table is sunk as .jsonl (one
    JSON object per line — the interchange format every LLM corpus
    pipeline speaks), scanned back with an EXPLICIT schema, and reduced to
    per-(source, lang) totals the oracle states over the original table.
    Explicit schema matters at 100 TB twice over: schema inference is a
    full extra pass, and a drifting field silently becomes null instead of
    failing loud — the schema pin makes ingest deterministic. JSONL splits
    by newline, so the scan parallelizes like CSV."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_process_tmp(), "usw_q_scan_jsonl")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).json(path)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.length("text")).alias("sum_len"),
    )


# --- CSV ingest robustness: PERMISSIVE mode + corrupt-record accounting ------
@query(
    "scan_csv_badrecords",
    oracle="""
    WITH src AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST((SELECT count(*) FROM src WHERE n_nationkey % 7 = 3) AS BIGINT)
             AS n_corrupt,
           CAST(sum(n_regionkey) AS BIGINT) AS sum_region
    FROM src WHERE n_nationkey % 7 <> 3
    """,
)
def scan_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row accounting, the ingest-robustness contract: a staged
    CSV carries deliberately corrupted lines (non-numeric key column on
    every 7th nation); the PERMISSIVE scan lands them in
    ``_corrupt_record`` instead of failing the job — at 100 TB a single
    bad line must never kill a multi-hour ingest, but it must also never
    be silently dropped, so the query reports good/corrupt counts the
    oracle states exactly."""
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))[
        ["n_nationkey", "n_name", "n_regionkey"]
    ]
    # Unique staging path per call: the scan below is cache()d, and Spark's
    # CacheManager matches by analyzed plan — a fixed path would hand back a
    # PREVIOUS call's cached rows after the file is rewritten (e.g. the
    # degenerate-corpus sweep staging a different nation table first).
    path = os.path.join(
        tempfile.mkdtemp(prefix="usw_q_bad_", dir=_process_tmp()), "bad.csv"
    )
    with open(path, "w") as f:
        f.write("n_nationkey,n_name,n_regionkey\n")
        for _, r in nation.iterrows():
            if r["n_nationkey"] % 7 == 3:
                f.write(f"NOT_A_NUMBER,{r['n_name']},broken\n")
            else:
                f.write(f"{r['n_nationkey']},{r['n_name']},{r['n_regionkey']}\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    landed = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # SPARK-21610: corrupt-record column needs the raw row kept
    )
    return landed.agg(
        F.sum(F.col("_corrupt_record").isNull().cast("bigint")).alias("n_good"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("bigint")).alias(
            "n_corrupt"
        ),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("n_regionkey"))
        ).alias("sum_region"),
    )


# --- parquet schema evolution: mergeSchema over generations ------------------
@query(
    "sink_schema_evolution",
    oracle="""
    WITH v1 AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0),
    v2 AS (SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 2 = 1)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(lang IS NULL AS BIGINT)) AS BIGINT) AS n_missing_lang,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM (SELECT doc_id, n_chars, NULL AS lang FROM v1
          UNION ALL SELECT doc_id, n_chars, lang FROM v2)
    """,
)
def sink_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations: generation 1 lands
    (doc_id, n_chars), generation 2 adds a `lang` column; the scan with
    ``mergeSchema`` unions the footers and back-fills the missing column
    with nulls — the additive-evolution contract every lakehouse table
    relies on (column ADDs are free; renames/drops need a table format).
    The oracle states the merged result including the null back-fill."""
    import tempfile as _tf
    import uuid as _uuid

    docs = load_table(spark, sf_dir, "documents")
    base = os.path.join(
        _tf.gettempdir(), f"usw_q_evo_{_uuid.uuid4().hex[:8]}", "t"
    )
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars").write.mode(
        "append"
    ).parquet(base)
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "n_chars", "lang"
    ).write.mode("append").parquet(base)
    merged = spark.read.option("mergeSchema", True).parquet(base)
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("lang").isNull().cast("bigint")).alias("n_missing_lang"),
        F.sum("n_chars").alias("sum_chars"),
    )


# --- S2 at scale: distributed SAS ingest via the Python Data Source API -----
@query(
    "scan_sas_pages",
    oracle="""
    WITH landed AS (
      SELECT CAST(l_linenumber AS DOUBLE) AS line_no,
             CASE WHEN l_linenumber % 11 = 0 THEN '.'
                  ELSE CAST(l_quantity AS VARCHAR) END AS qty_raw
      FROM lineitem
    ),
    cleaned AS (
      SELECT CAST(line_no AS INT) % 4 AS bucket,
             CASE WHEN qty_raw = '.' THEN NULL
                  ELSE CAST(qty_raw AS DOUBLE) END AS qty
      FROM landed
    )
    SELECT bucket, count(*) AS n_rows,
           CAST(sum(CAST(qty IS NULL AS BIGINT)) AS BIGINT) AS n_missing,
           round(CAST(sum(CAST(qty AS DECIMAL(25,6))) AS DOUBLE)
                 / count(qty), 6) AS mean_qty
    FROM cleaned GROUP BY bucket
    """,
)
def scan_sas_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed SAS ingest — the scale path `scan_sas` documents as
    missing: the same genuine .sas7bdat bytes (vendored writer), read back
    through ``spark.read.format("sas_lite")`` — a Spark 4 Python Data
    Source (sources/sas_datasource.py) that plans ONE InputPartition per
    SAS data page and decodes pages executor-side into Arrow batches
    (sources/sas7bdat_reader.py). The "unsplittable" format is split on
    its own page structure; no driver-side pandas pass touches row data.
    Cleaning (SAS '.' missing sentinel → NULL + cast,
    1-1.data_processing.ipynb:1910-1914) and the per-bucket aggregate run
    as ordinary Catalyst plans over the connector's output — which also
    pins per-page row/column alignment: any page-boundary slip would
    shuffle qty values across line-number buckets and break the hash."""
    import numpy as np

    from ..sources.sas7bdat_lite import write_sas7bdat
    from ..sources.sas_datasource import read_sas_lite, register

    qty = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))[
        ["l_linenumber", "l_quantity"]
    ]
    raw = np.where(
        qty["l_linenumber"].to_numpy() % 11 == 0,
        ".",
        qty["l_quantity"].map(str).to_numpy(dtype=object),
    ).astype(object)
    line = qty["l_linenumber"].to_numpy(dtype=float)
    dest = os.path.join(
        _process_tmp(),
        f"scan_sas_pages_{os.path.basename(os.path.normpath(sf_dir))}.sas7bdat",
    )
    if not os.path.exists(dest):
        # 16 KiB pages => ~1000 rows/page (many pages even at sf0.001);
        # atomic rename so a concurrent reader never sees a partial file.
        part = dest + ".part"
        write_sas7bdat(part, ["line_no", "qty_raw"], [line, raw], page_size=16384)
        os.replace(part, dest)
    register(spark)
    landed = read_sas_lite(spark, dest)
    cleaned = landed.select(
        (F.col("line_no").cast("int") % 4).alias("bucket"),
        F.when(F.col("qty_raw") == ".", None)
        .otherwise(F.col("qty_raw").cast("double"))
        .alias("qty"),
    )
    return cleaned.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("qty").isNull().cast("bigint")).alias("n_missing"),
        F.round(
            F.sum(F.col("qty").cast("decimal(25,6)")).cast("double")
            / F.count("qty"),
            6,
        ).alias("mean_qty"),
    )


# --- S6-at-scale sibling: distributed SAS SINK via the writer API -----------
@query(
    "sink_sas_distributed",
    oracle="""
    WITH landed AS (
      SELECT CAST(l_linenumber AS DOUBLE) AS line_no,
             CASE WHEN l_linenumber % 11 = 0 THEN '.'
                  ELSE CAST(l_quantity AS VARCHAR) END AS qty_raw
      FROM lineitem
    ),
    cleaned AS (
      SELECT CAST(line_no AS INT) % 3 AS bucket,
             CASE WHEN qty_raw = '.' THEN NULL
                  ELSE CAST(qty_raw AS DOUBLE) END AS qty
      FROM landed
    )
    SELECT bucket, count(*) AS n_rows,
           CAST(sum(CAST(qty IS NULL AS BIGINT)) AS BIGINT) AS n_missing,
           round(CAST(sum(CAST(qty AS DECIMAL(25,6))) AS DOUBLE)
                 / count(qty), 6) AS mean_qty
    FROM cleaned GROUP BY bucket
    """,
)
def sink_sas_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed SAS WRITE through the Python Data Source writer API
    (sources/sas_datasource.py SasLiteWriter): every Spark task encodes
    its partition into whole SAS DATA pages (partial last page —
    block_count makes that legal) staged as a part file; the two-phase
    commit writes header+meta with the global row/page totals,
    concatenates parts in partition order, and renames atomically
    (abort() removes staged parts — no torn files). String widths are
    DECLARED via writer options because a distributed task cannot derive
    a global max width. The written bytes are then read back through the
    page-partitioned sas_lite reader and SAS '.'-sentinel-cleaned — a
    full write→read round trip over genuine SAS format, both directions
    distributed."""
    from ..sources.sas_datasource import read_sas_lite, register

    register(spark)
    li = load_table(spark, sf_dir, "lineitem")
    landed = li.select(
        F.col("l_linenumber").cast("double").alias("line_no"),
        F.when(F.col("l_linenumber") % 11 == 0, ".")
        .otherwise(F.col("l_quantity").cast("string"))
        .alias("qty_raw"),
    ).repartition(8, "line_no")
    dest = os.path.join(
        _process_tmp(),
        f"sink_sas_dist_{os.path.basename(os.path.normpath(sf_dir))}.sas7bdat",
    )
    (
        landed.write.format("sas_lite")
        .option("path", dest)
        .option("width_qty_raw", "24")
        .mode("overwrite")
        .save()
    )
    back = read_sas_lite(spark, dest)
    cleaned = back.select(
        (F.col("line_no").cast("int") % 3).alias("bucket"),
        F.when(F.col("qty_raw") == ".", None)
        .otherwise(F.col("qty_raw").cast("double"))
        .alias("qty"),
    )
    return cleaned.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("qty").isNull().cast("bigint")).alias("n_missing"),
        F.round(
            F.sum(F.col("qty").cast("decimal(25,6)")).cast("double")
            / F.count("qty"),
            6,
        ).alias("mean_qty"),
    )


# --- partition-spec evolution across table generations -----------------------
_PE_CUT = 19737  # epoch-day boundary (2024-01-15) between the two layouts


@query(
    "sink_partition_evolution",
    oracle=f"""
    WITH ev AS (
      SELECT epoch_us(ts) // 86400000000 AS d,
             event_type, value
      FROM events
    )
    SELECT d, event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM ev
    WHERE event_type = 'purchase'
    GROUP BY d, event_type
    """,
)
def sink_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution, the lakehouse mechanic Iceberg's
    metadata hides: generation 1 (days < epoch day {cut}) lands partitioned by
    day only; generation 2 evolves the spec to (day, event_type).
    A query over the full table is the UNION of per-generation scans —
    each pruned under ITS OWN layout (gen-1 prunes day directories and
    filters event_type as data; gen-2 prunes both as directories). The
    result must be indistinguishable from one logical table, which is
    exactly what the oracle states over the raw events.

    Scale note: partition evolution beats rewrite-the-table precisely
    because old data keeps its layout — the cost shows up as the weaker
    pruning on old generations, which this query's two scan shapes make
    visible (asserted in tests/test_plan_quality.py).""".format(cut=_PE_CUT)
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("d"),
    )
    root = os.path.join(_process_tmp(), "usw_q_part_evolution")
    g1 = os.path.join(root, "gen1")
    g2 = os.path.join(root, "gen2")
    ev.filter(F.col("d") < _PE_CUT).write.mode("overwrite").partitionBy(
        "d"
    ).parquet(g1)
    ev.filter(F.col("d") >= _PE_CUT).write.mode("overwrite").partitionBy(
        "d", "event_type"
    ).parquet(g2)
    # explicit schemas: a degenerate corpus can leave one generation EMPTY
    # (only _SUCCESS in the dir), where schema inference hard-fails; with
    # the schema pinned, an empty generation is just an empty frame
    from pyspark.sql import types as T

    base = [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
    s1 = T.StructType(
        base
        + [T.StructField("event_type", T.StringType()),
           T.StructField("d", T.LongType())]
    )
    s2 = T.StructType(
        base
        + [T.StructField("d", T.LongType()),
           T.StructField("event_type", T.StringType())]
    )
    back1 = (
        spark.read.schema(s1).parquet(g1)
        .filter(F.col("event_type") == "purchase")
    )
    back2 = (
        spark.read.schema(s2).parquet(g2)
        .filter(F.col("event_type") == "purchase")
    )
    both = back1.select("d", "event_type", "value").unionByName(
        back2.select("d", "event_type", "value")
    )
    return both.groupBy("d", "event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
    )


# --- multiline quoted CSV scan ------------------------------------------------
@query(
    "scan_csv_multiline",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(CASE WHEN doc_id % 7 = 0
                                THEN replace(text, ' ', chr(10))
                                ELSE text END)) AS BIGINT) AS sum_len
    FROM documents GROUP BY source
    """,
)
def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-multiline CSV ingestion: every 7th document's text gains
    embedded newlines (space → LF), the corpus is staged as RFC-4180 CSV
    (fields with newlines quoted), and Spark reads it back with
    multiLine=true + an explicit schema. The per-source checksum must
    equal the oracle's statement over the ORIGINAL table under the same
    transformation — record-boundary bugs (the classic multiline-CSV
    failure) shift characters between rows and break the hash.

    Scale note, stated honestly: multiLine CSV is NOT splittable — one
    file = one task, because record boundaries can't be found mid-file.
    It belongs at the ingest edge only; the first job should rewrite to
    parquet. The staging write itself is driver-side on purpose (the
    fixture IS the file under test, not a distributed sink)."""
    import csv

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))[
        ["doc_id", "text", "source"]
    ]
    content = docs["text"].where(
        docs["doc_id"] % 7 != 0, docs["text"].str.replace(" ", "\n")
    )
    staged = docs.assign(text=content)
    path = os.path.join(_process_tmp(), "usw_q_multiline.csv")
    staged.to_csv(
        path, index=False, quoting=csv.QUOTE_MINIMAL, lineterminator="\r\n"
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    return back.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("sum_len"),
    )


# --- fixed-width (mainframe-style) text ingestion ------------------------------
_FW_SPEC = (("o_orderkey", 0, 12), ("o_custkey", 12, 12), ("cents", 24, 14))


@query(
    "scan_fixed_width",
    oracle="""
    SELECT o_custkey % 10 AS custmod,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders GROUP BY o_custkey % 10
    """,
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text ingestion — the mainframe/COBOL copybook layout
    that predates every delimiter: orders staged as zero-padded
    fixed-offset lines ({spec}), read back with spark.read.text and
    substring/cast parsing (the standard Spark recipe — there is no
    fixed-width reader), reduced per customer residue against the oracle
    over the original table. Offset parsing is pure column expressions
    inside whole-stage codegen; the text scan splits by line like CSV, so
    ingestion parallelizes. The staging write is driver-side on purpose
    (the file IS the fixture under test).""".format(spec=_FW_SPEC)
    od = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))[
        ["o_orderkey", "o_custkey", "o_totalprice"]
    ]
    import numpy as np

    cents = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    # Python f-string widths WIDEN (never truncate) past the field size,
    # which would silently shift every later offset in the row — assert the
    # domains fit the declared widths before staging (ADVICE r6).
    assert od["o_orderkey"].max() < 10**12, "o_orderkey exceeds 12-char field"
    assert od["o_custkey"].max() < 10**12, "o_custkey exceeds 12-char field"
    assert cents.max() < 10**14, "totalprice cents exceed 14-char field"
    lines = [
        f"{k:012d}{c:012d}{v:014d}"
        for k, c, v in zip(od["o_orderkey"], od["o_custkey"], cents)
    ]
    path = os.path.join(_process_tmp(), "usw_q_fixed_width.txt")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    back = spark.read.text(path).selectExpr(
        "CAST(substring(value, 1, 12) AS BIGINT) AS o_orderkey",
        "CAST(substring(value, 13, 12) AS BIGINT) AS o_custkey",
        "CAST(substring(value, 25, 14) AS BIGINT) AS cents",
    )
    return back.groupBy((F.col("o_custkey") % 10).alias("custmod")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# --- gzip-compressed CSV sink + scan -------------------------------------------
@query(
    "sink_csv_gzip",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
)
def sink_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-at-rest text interchange: documents sunk as gzip CSV
    (codec=gzip — the wire format most external partners still speak),
    scanned back with an explicit schema and reduced per language. The
    honest scale note: gzip text is NOT splittable — each .csv.gz part is
    one read task, so the WRITER's partitioning decides the reader's
    parallelism; that coupling (and bzip2/zstd-seekable as the splittable
    alternatives) is the entire operational story of compressed text at
    100 TB."""
    from ..sources import load_table
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_process_tmp(), "usw_q_csv_gzip")
    docs.select("doc_id", "lang", "n_chars").write.mode("overwrite").option(
        "codec", "gzip"
    ).option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).option("header", True).csv(path)
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
