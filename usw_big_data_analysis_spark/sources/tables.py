"""Fixture-table scans.

The driver fixture (TESTDATA.md) is a TPC-H-ish star schema plus events /
documents / embeddings, one parquet file per table per scale factor.

Parquet is the canonical scan path: columnar, predicate/column pushdown via
Catalyst (``PushedFilters`` / ``ReadSchema`` in the physical plan), and
splittable at 100 TB. CSV/SAS/Excel ingest from the reference (SURVEY.md
§2.1 S1-S3) maps to ``io.read_csv`` / pre-conversion to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (applicationId, sf_dir, name) -> DataFrame. A fixture scan is an immutable
# logical plan; re-creating it per query call re-reads the parquet footer on
# the driver (~80-100ms — the single largest per-query plan-construction
# cost). Caching is the catalog role a metastore plays in production: schema
# resolved once per table per session, every query shares the relation.
# Keyed by applicationId so a stopped/restarted session can never leak stale
# plans (a new JVM app gets a new id).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # Evict entries from other applications before inserting: a long-lived
    # driver that stops/starts sessions would otherwise accumulate DataFrames
    # pinning dead SparkSessions (ADVICE r3 #2). Entries for the CURRENT app
    # stay — that's the cache's whole point (≤ #sf_dirs × #tables ≈ tens).
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalize events.ts to TIMESTAMP regardless of how the fixture was
        # written: TIMESTAMP(NANOS) parquet arrives as epoch-nanos long (via
        # spark.sql.legacy.parquet.nanosAsLong in session.py), TIMESTAMP(MICROS)
        # as TIMESTAMP_NTZ. Session timezone is pinned to UTC, so the NTZ →
        # TIMESTAMP cast is instant-preserving.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer floor-div nanos -> micros; `div` alone truncates toward
            # zero, which would round pre-1970 instants up by 1 microsecond
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr("(ts - ((ts % 1000) + 1000) % 1000) div 1000")
                ),
            )
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
