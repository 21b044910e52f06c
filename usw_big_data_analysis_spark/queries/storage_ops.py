"""Storage-layout operators: the write-side patterns that decide read
performance at 100 TB — range-sorted parquet for row-group skipping,
small-file compaction, and nested array/struct packing (the layout trick
that co-locates a parent's children in one row).

Scale notes:
- sink_sorted_scan: repartitionByRange + sortWithinPartitions writes
  parquet whose row-group min/max statistics are tight on the sort key,
  so a date-range read prunes row groups before decoding (the filter
  reaches the scan as PushedFilters — pinned in tests/test_storage.py).
- sink_compaction: the nightly small-files job — coalesce() merges
  partitions WITHOUT a shuffle (each output task concatenates inputs);
  repartition() would shuffle everything for perfect balance. The check
  proves compaction is content-invariant.
- nested_array_roundtrip: collect_list packs children per parent
  (bounded by per-key fan-out, map-side combined); posexplode unpacks
  losslessly. Sorting the struct array makes the layout deterministic —
  the fixture's (l_orderkey, l_linenumber) is NOT unique, so the sort key
  includes quantity+extendedprice (the repo's unique 4-column key).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ._shared import process_tmp as _process_tmp
from ..sources import load_table

_TMP = _process_tmp()


# --- range-sorted parquet + filtered re-scan --------------------------------
@query(
    "sink_sorted_scan",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           count(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY month
    """,
)
def sink_sorted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders range-partitioned AND sorted by o_orderdate, re-read
    with a one-year filter, roll up monthly. The sorted layout gives every
    row group a tight min/max on the date — the re-scan prunes row groups
    via pushed filters instead of decoding the table (the layout
    investment that pays on every later time-ranged read)."""
    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(_TMP, "usw_q_sink_sorted")
    (
        orders.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    re = spark.read.parquet(path)
    return (
        re.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.count("*").alias("n"))
    )


# --- small-file compaction ---------------------------------------------------
_FRAGMENTS = 64
_COMPACTED = 4


@query(
    "sink_compaction",
    oracle="""
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-files maintenance job: a fragmented write (64 files —
    what per-executor streaming micro-batches leave behind) compacted to 4
    via coalesce (shuffle-free: tasks concatenate inputs). The oracle
    proves compaction is content-invariant; tests/test_storage.py pins the
    file counts."""
    docs = load_table(spark, sf_dir, "documents")
    frag = os.path.join(_TMP, "usw_q_compact_frag")
    compact = os.path.join(_TMP, "usw_q_compact_out")
    docs.repartition(_FRAGMENTS).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(_COMPACTED).write.mode("overwrite").parquet(
        compact
    )
    return (
        spark.read.parquet(compact)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


# --- nested array/struct pack + unpack roundtrip ----------------------------
@query(
    "nested_array_roundtrip",
    oracle="""
    WITH g AS (
      SELECT l_orderkey,
             list(l_linenumber
                  ORDER BY l_linenumber, l_quantity, l_extendedprice) AS lns,
             list(l_quantity
                  ORDER BY l_linenumber, l_quantity, l_extendedprice) AS qs,
             list(l_extendedprice
                  ORDER BY l_linenumber, l_quantity, l_extendedprice) AS ps
      FROM lineitem GROUP BY l_orderkey
    ),
    s AS (
      SELECT l_orderkey, unnest(generate_series(1, len(qs))) AS idx,
             lns, qs, ps
      FROM g
    )
    SELECT l_orderkey, CAST(idx AS INT) AS idx,
           lns[idx] AS l_linenumber, qs[idx] AS l_quantity,
           ps[idx] AS l_extendedprice
    FROM s
    """,
)
def nested_array_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each order's lines into a SORTED array of structs
    (collect_list + array_sort — collect_list alone is partition-order
    nondeterministic), then unpack with posexplode. Hash-matching the flat
    output proves the nested layout is lossless and deterministically
    ordered — the parent-child packing used for document+chunks and
    order+items feeds. Struct sort key includes quantity+extendedprice:
    (l_orderkey, l_linenumber) alone is NOT unique in the fixture."""
    li = load_table(spark, sf_dir, "lineitem")
    packed = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice")
            )
        ).alias("items")
    )
    return packed.select(
        "l_orderkey", F.posexplode("items").alias("pos", "item")
    ).select(
        "l_orderkey",
        (F.col("pos") + 1).cast("int").alias("idx"),
        F.col("item.l_linenumber").alias("l_linenumber"),
        F.col("item.l_quantity").alias("l_quantity"),
        F.col("item.l_extendedprice").alias("l_extendedprice"),
    )


# --- Z-order (bit-interleaved) layout for two-dimension skipping -------------
def _zvalue(a: F.Column, b: F.Column, bits: int = 8) -> F.Column:
    """Interleave the low `bits` of two non-negative ints: classic Z-order.
    Pure JVM bit arithmetic — codegen-friendly, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i).cast("bigint")
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1).cast("bigint")
    return z


@query(
    "sink_zorder_scan",
    oracle=f"""
    WITH g AS (
      SELECT count(*) AS n_items,
             {N.sql_isum_items(N.sql_iscaled('l_extendedprice * (1 - l_discount)', 4), 'rev')}
      FROM lineitem
      WHERE (l_partkey % 256) BETWEEN 32 AND 47
        AND (l_suppkey % 256) BETWEEN 64 AND 79
    )
    SELECT n_items, {N.sql_isum_value('rev', 4)} AS revenue FROM g
    """,
)
def sink_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional data skipping: lineitem rewritten in Z-order (bit
    interleave of the two filter dimensions), range-partitioned and sorted
    by the z-value, then re-scanned with a rectangle predicate on BOTH
    dimensions. A single-column sort gives tight row-group min/max on one
    dimension only; the z-layout clusters both, so the rectangle prunes row
    groups on pk_mod AND sk_mod simultaneously (the multi-dim analogue of
    sink_sorted_scan). The oracle reads the base table — layout must not
    change the answer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.pmod(F.col("l_partkey"), 256).cast("int").alias("pk_mod"),
        F.pmod(F.col("l_suppkey"), 256).cast("int").alias("sk_mod"),
        N.iscaled(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("rev"),
    )
    path = os.path.join(_TMP, "usw_q_sink_zorder")
    (
        li.withColumn("z", _zvalue(F.col("pk_mod"), F.col("sk_mod")))
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
    re = spark.read.parquet(path)
    g = re.filter(
        (F.col("pk_mod") >= 32) & (F.col("pk_mod") <= 47)
        & (F.col("sk_mod") >= 64) & (F.col("sk_mod") <= 79)
    ).agg(F.count("*").alias("n_items"), *N.isum_aggs(F.col("rev"), "rev"))
    return g.select("n_items", N.isum_value("rev", 4).alias("revenue"))


# --- per-file statistics manifest (the data-skipping index) ------------------
@query(
    "sink_manifest_stats",
    oracle="""
    SELECT concat('event_type=', event_type) AS part,
           count(*) AS n_rows,
           min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def sink_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds the per-file statistics manifest a lakehouse format (Delta /
    Iceberg) maintains: events written hive-partitioned by event_type (one
    file per partition via coalesce), re-scanned, and aggregated per
    PHYSICAL FILE via input_file_name() — row count, min/max event time,
    distinct users. The partition key parsed back out of the file path must
    reconcile with a logical group-by of the base table (the oracle): the
    manifest describes exactly the data. At scale this manifest is what
    plans time-ranged scans without touching data files."""
    ev = load_table(spark, sf_dir, "events")
    path = os.path.join(_TMP, "usw_q_manifest")
    (
        ev.coalesce(1)
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    re = spark.read.parquet(path)
    per_file = (
        re.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(F.unix_micros("ts")).alias("min_ts_us"),
            F.max(F.unix_micros("ts")).alias("max_ts_us"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn(
            "part", F.regexp_extract(F.col("file"), r"(event_type=[^/]+)", 1)
        )
    )
    # one file per partition (coalesce(1)) -> per-file stats == per-part stats
    return per_file.select("part", "n_rows", "min_ts_us", "max_ts_us", "n_users")
