"""Scans/sinks + projections/filters (SURVEY.md §2.1 S1-S7, §2.2 P1-P8).

Reference sites cited per query. Null-handling queries inject nulls
deterministically in-query (fixture has none; see FIXTURES.md §3 note) with
the same expression on both engines.

Scale notes: every filter/projection here reaches the parquet scan as
PushedFilters/ReadSchema (verified in tests/test_plans.py); the null-ratio
column prune (P7) is the one inherently 2-pass operator (schema depends on
data) — implemented as a single agg pass over conditional counts, then a
driver-side select of surviving columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import numeric as N
from ..registry import query
from ._shared import process_tmp as _process_tmp
from ..sources import load_table
from ..sources.io import read_csv

_TMP = _process_tmp()


# --- S1: CSV scan (legacy/modeling.py:63-66; teamProject/sap.py:31-32) ------
@query(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip `nation` through a CSV sink+scan with explicit schema."""
    path = os.path.join(_TMP, "usw_q_scan_csv")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", True
    ).csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return read_csv(spark, path, schema=schema)


# --- S4: line-oriented text scan (computer-structure.ipynb:31-38) -----------
@query(
    "scan_text",
    oracle="""
    SELECT count(*) AS n_lines, CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink document text as raw lines, scan back, count lines/chars."""
    path = os.path.join(_TMP, "usw_q_scan_text")
    load_table(spark, sf_dir, "documents").select("text").write.mode(
        "overwrite"
    ).text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
    )


# --- S5: CSV sink (teamProject/sap.py:158; legacy/modeling.py:199-200) ------
_REV_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def _revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    return li.groupBy("l_returnflag").agg(
        F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n")
    )


@query("sink_csv", oracle=_REV_ORACLE)
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → CSV sink → scan back (lossless: Java double repr round-trips)."""
    path = os.path.join(_TMP, "usw_q_sink_csv")
    _revenue_by_flag(spark, sf_dir).write.mode("overwrite").option("header", True).csv(path)
    schema = "l_returnflag string, revenue double, n bigint"
    return read_csv(spark, path, schema=schema)


# --- S7: JSON sink (experiments/overfitting_experiment.py:379-381) ----------
@query("sink_json", oracle=_REV_ORACLE)
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_TMP, "usw_q_sink_json")
    _revenue_by_flag(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema("l_returnflag string, revenue double, n bigint").json(path)


# --- P1: drop columns (teamProject/sap.py:39-42) ----------------------------
@query(
    "project_drop",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_returnflag, l_linestatus
    FROM lineitem
    """,
)
def project_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").drop("l_tax", "l_shipdate")


# --- P2: select by name convention (teamProject/utils/preprocessing.py:49) --
@query("project_prefix", oracle="SELECT event_id, event_type FROM events")
def project_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    cols = [c for c in df.columns if c.startswith("event")]
    return df.select(*cols)


# --- P3: select by dtype (wine…03….ipynb:1380) ------------------------------
@query(
    "project_dtype",
    oracle="SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem",
)
def project_dtype(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.DoubleType)]
    return df.select(*cols)


# --- P4: numeric range filter (1-1.data_processing.ipynb age>=19) -----------
@query(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 30.0
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 30.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --- P5: null-predicate filter (1-2.labeling_XYdataset.ipynb:522-529) -------
@query(
    "filter_notnull",
    oracle="""
    WITH injected AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber % 7 = 0 THEN NULL
                  WHEN l_linenumber % 5 = 0 THEN -1.0
                  ELSE l_quantity END AS q
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, q
    FROM injected WHERE q IS NOT NULL AND q <> -1.0
    """,
)
def filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter rows where a sentinel-coded column is valid (not NULL, not -1)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = (
        F.when(F.col("l_linenumber") % 7 == 0, F.lit(None))
        .when(F.col("l_linenumber") % 5 == 0, F.lit(-1.0))
        .otherwise(F.col("l_quantity"))
    )
    return (
        li.select("l_orderkey", "l_linenumber", q.alias("q"))
        .filter(F.col("q").isNotNull() & (F.col("q") != -1.0))
    )


# --- P6: set-membership filter (experiments/target_eda.py:90-101) -----------
@query(
    "filter_isin",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    """,
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


# --- P7: column pruning by null ratio (1-1.data_processing.ipynb:2485-2488) -
@query(
    "filter_mask_cols",
    oracle="""
    WITH injected AS (
      SELECT CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_quantity END AS c_quantity,
             CASE WHEN l_linenumber % 7 = 0 THEN NULL ELSE l_extendedprice END AS c_extendedprice,
             CASE WHEN l_orderkey % 100 < 90 THEN NULL ELSE l_discount END AS c_discount,
             l_tax AS c_tax
      FROM lineitem
    ), stats AS (
      SELECT count(*) AS total,
             count(c_quantity) AS n_quantity,
             count(c_extendedprice) AS n_extendedprice,
             count(c_discount) AS n_discount,
             count(c_tax) AS n_tax
      FROM injected
    )
    SELECT col_name,
           1.0 - CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS null_frac,
           (1.0 - CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) < 0.8 AS kept
    FROM (
      SELECT 'c_quantity' AS col_name, n_quantity AS n, total FROM stats
      UNION ALL SELECT 'c_extendedprice', n_extendedprice, total FROM stats
      UNION ALL SELECT 'c_discount', n_discount, total FROM stats
      UNION ALL SELECT 'c_tax', n_tax, total FROM stats
    )
    """,
)
def filter_mask_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-ratio column-prune decision table (keep cols with <80% nulls).

    One aggregation pass computes every column's non-null count; the
    keep/drop decision is then a tiny unpivot — the pattern that replaces
    `df.loc[:, nan_pct < 0.8]` without materializing intermediates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    injected = li.select(
        F.when(F.col("l_linenumber") % 2 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("c_quantity"),
        F.when(F.col("l_linenumber") % 7 == 0, None)
        .otherwise(F.col("l_extendedprice"))
        .alias("c_extendedprice"),
        F.when(F.col("l_orderkey") % 100 < 90, None)
        .otherwise(F.col("l_discount"))
        .alias("c_discount"),
        F.col("l_tax").alias("c_tax"),
    )
    cols = injected.columns
    stats = injected.agg(
        F.count("*").alias("total"),
        *[F.count(c).alias(f"n_{c}") for c in cols],
    )
    stack_expr = ", ".join(f"'{c}', n_{c}" for c in cols)
    unpivoted = stats.selectExpr(
        "total", f"stack({len(cols)}, {stack_expr}) AS (col_name, n)"
    )
    null_frac = 1.0 - F.col("n").cast("double") / F.col("total").cast("double")
    return unpivoted.select(
        "col_name",
        null_frac.alias("null_frac"),
        (null_frac < 0.8).alias("kept"),
    )


# --- P8: per-group subset (teamProject/eda.ipynb:1396-1407) -----------------
@query(
    "filter_class",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def filter_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# --- spark.sql() API surface: q1 expressed as one SQL string -----------------
@query(
    "sql_api_q6",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                         AS BIGINT)) AS BIGINT) AS revenue_e4,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def sql_api_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast-revenue-change) submitted through the
    spark.sql() TEXT interface over registered temp views — pinning that
    the SQL API surface (not just the DataFrame builder) is first-class:
    same Catalyst plan, same pushdown, same oracle contract. Revenue is
    an exact integer in 1e-4 units (the fixture's discount grid keeps
    the scaled product integral)."""
    from ..functions import numeric as N
    from ..sources import register_views

    register_views(spark, sf_dir)
    # sign-aware fround (ADVICE r4: a hand-inlined unsigned form was correct
    # only because price*discount is non-negative — use the shared helper so
    # the expression stays safe if copied to signed data)
    rounded = N.spark_fround_int("l_extendedprice * l_discount * 10000")
    return spark.sql(
        f"""
        SELECT CAST(sum({rounded}) AS BIGINT) AS revenue_e4,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


# --- catalog sweep: row counts across every fixture table --------------------
@query(
    "catalog_rowcounts",
    oracle="""
    SELECT 'region' AS tbl, count(*) AS n_rows FROM region
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    """,
)
def catalog_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-catalog row-count sweep — the freshness/health check a
    pipeline runs against every table after each load. Each branch is a
    metadata-cheap count (parquet scans count from footers; no column
    materializes) unioned into one frame; at 100 TB the same sweep walks
    the catalog listing instead of a literal table list."""
    from functools import reduce

    from ..sources import TABLES, load_table

    parts = [
        load_table(spark, sf_dir, t).groupBy().agg(
            F.lit(t).alias("tbl"), F.count("*").alias("n_rows")
        ).select("tbl", "n_rows")
        for t in TABLES
    ]
    return reduce(DataFrame.unionByName, parts)


# --- SQL pipe syntax (Spark 4) ------------------------------------------------
@query(
    "sql_pipe_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q1 pricing rollup expressed in Spark 4's SQL PIPE syntax
    (`FROM t |> WHERE … |> EXTEND … |> AGGREGATE … GROUP BY …`) — the
    linear query form SQL:2023-adjacent engines are converging on.
    Same Catalyst plan as the keyword form (the parser is the only thing
    that changes), so pushdown/partial-agg behavior is identical; sums
    are exact integer cents per the repo convention."""
    from ..functions.numeric import spark_fround_int
    from ..sources import register_views

    register_views(spark, sf_dir)
    qty = spark_fround_int("l_quantity * 100")
    price = spark_fround_int("l_extendedprice * 100")
    return spark.sql(
        f"""
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |> EXTEND {qty} AS qty_c, {price} AS price_c
        |> AGGREGATE count(*) AS n_rows,
                     CAST(sum(qty_c) AS BIGINT) AS qty_cents,
                     CAST(sum(price_c) AS BIGINT) AS price_cents
           GROUP BY l_returnflag, l_linestatus
        """
    )


# --- recursive CTE (Spark 4.1) -------------------------------------------------
# A clamped inventory walk: bal_k = clamp(bal_{k-1} + rev_k - draw, 0, cap)
# over the monthly revenue series. The clamp makes the recurrence
# NON-ASSOCIATIVE — no window/prefix-sum formulation exists, which is exactly
# the class of computation WITH RECURSIVE (Catalyst's new UnionLoopExec) adds
# to the engine. Each iterate is ONE row (the next month), so the recursion
# is scale-sane at any fact-table size: the heavy work is the ordinary
# map-side-combined monthly rollup; the walk itself touches 80 bounded rows.
# Both engines run the IDENTICAL statement text (Spark 4.1 supports UNION ALL
# recursion only; the k < 96 guard keeps both engines under Spark's
# 100-iteration default limit). Cross-engine traps pinned here: integer '/'
# yields DOUBLE in both engines, but CAST(double AS BIGINT) truncates in
# Spark and ROUNDS in DuckDB — the year split must go through floor().
_RECURSIVE_BALANCE_SQL = """
WITH RECURSIVE mrev AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS idx,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY year(o_orderdate) * 12 + month(o_orderdate)
),
params AS (
  SELECT min(idx) AS idx0,
         CAST(floor(sum(rev_c) / count(*)) AS BIGINT) AS draw_c,
         CAST(2 * floor(sum(rev_c) / count(*)) AS BIGINT) AS cap_c
  FROM mrev
),
walk(idx, k, rev_c, bal_c) AS (
    SELECT m.idx, 0, m.rev_c,
           least(p.cap_c, greatest(CAST(0 AS BIGINT),
                                   p.cap_c + m.rev_c - p.draw_c))
    FROM mrev m JOIN params p ON m.idx = p.idx0
  UNION ALL
    SELECT m.idx, w.k + 1, m.rev_c,
           least(p.cap_c, greatest(CAST(0 AS BIGINT),
                                   w.bal_c + m.rev_c - p.draw_c))
    FROM walk w
    JOIN mrev m ON m.idx = w.idx + 1
    CROSS JOIN params p
    WHERE w.k < 96
)
SELECT CAST(floor((idx - 1) / 12) AS BIGINT) AS yr,
       CAST((idx - 1) % 12 + 1 AS BIGINT) AS mo,
       rev_c, bal_c
FROM walk ORDER BY idx
"""


@query("sql_recursive_capped_balance", oracle=_RECURSIVE_BALANCE_SQL)
def sql_recursive_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month budget pool with draw and cap (starts full; clamped
    to [0, cap] each step) in exact integer cents. The clamp makes the
    recurrence non-associative, so no window/prefix-sum form exists; the
    oracle runs DuckDB's recursive executor over the statement above.

    Spark runs the IDENTICAL walk as ONE sequential ``aggregate()`` fold
    over the sorted monthly array instead of WITH RECURSIVE: the recursion
    iterates over a BOUNDED series (~80 calendar months regardless of fact
    size), yet UnionLoopExec schedules one Spark job per iterate — an ~8s
    pure-scheduling floor at any scale (measured 8.3-9.9s steady at sf0.1
    even with the non-recursive CTEs pre-materialized; the single-text form
    was ~29s because Catalyst additionally inlined the fact rollup into
    every iterate). The fold runs the same clamp chain element-by-element
    inside one expression — same BIGINT arithmetic, same gap/k<96 stop
    rules (a sorted strictly-increasing idx array can never resume after a
    gap, so "skip element" ≡ "recursion stopped"), same rows — in a single
    job (~0.3s; optimization r07, guide §2.4). The heavy work stays the
    ordinary map-side-combined monthly rollup."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH mrev AS (
          SELECT year(o_orderdate) * 12 + month(o_orderdate) AS idx,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS rev_c
          FROM orders GROUP BY year(o_orderdate) * 12 + month(o_orderdate)
        ),
        packed AS (
          SELECT sort_array(collect_list(struct(idx, rev_c))) AS a,
                 CAST(floor(sum(rev_c) / count(*)) AS BIGINT) AS draw_c,
                 CAST(2 * floor(sum(rev_c) / count(*)) AS BIGINT) AS cap_c
          FROM mrev
        ),
        walk AS (
          SELECT inline(IF(
            size(a) = 0,
            CAST(array() AS
                 ARRAY<STRUCT<idx: INT, rev_c: BIGINT, bal_c: BIGINT>>),
            aggregate(
            slice(a, 2, greatest(0, size(a) - 1)),
            struct(
              array(struct(
                a[0].idx AS idx, a[0].rev_c AS rev_c,
                least(cap_c, greatest(CAST(0 AS BIGINT),
                                      cap_c + a[0].rev_c - draw_c)) AS bal_c
              )) AS out,
              0 AS k,
              a[0].idx AS prev_idx,
              least(cap_c, greatest(CAST(0 AS BIGINT),
                                    cap_c + a[0].rev_c - draw_c)) AS bal
            ),
            (acc, x) -> IF(
              x.idx = acc.prev_idx + 1 AND acc.k < 96,
              struct(
                concat(acc.out, array(struct(
                  x.idx AS idx, x.rev_c AS rev_c,
                  least(cap_c, greatest(CAST(0 AS BIGINT),
                                        acc.bal + x.rev_c - draw_c)) AS bal_c
                ))) AS out,
                acc.k + 1 AS k,
                x.idx AS prev_idx,
                least(cap_c, greatest(CAST(0 AS BIGINT),
                                      acc.bal + x.rev_c - draw_c)) AS bal
              ),
              acc
            ),
            acc -> acc.out
          ))) FROM packed
        )
        SELECT CAST(floor((idx - 1) / 12) AS BIGINT) AS yr,
               CAST((idx - 1) % 12 + 1 AS BIGINT) AS mo,
               rev_c, bal_c
        FROM walk ORDER BY idx
        """
    )


# --- correlated LATERAL subquery ------------------------------------------------
# The correlated top-n-per-group form (`JOIN LATERAL (... WHERE corr ORDER BY
# ... LIMIT n) ON true`) — the third engine mechanism for this semantics next
# to topk_per_group's sketch-and-refine and the window-rank form: Catalyst's
# DecorrelateInnerQuery rewrites it to a rank window PARTITIONED by the
# correlation key plus a broadcast join to the outer (verified in the plan —
# no unpartitioned window, no per-outer-row re-execution), so the declarative
# correlated form pays exactly the distributed plan you'd hand-write. DuckDB
# runs the identical statement text. ORDER BY ties are broken by the unique
# c_name so the LIMIT frontier is total-ordered in both engines.
_LATERAL_TOPN_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n
JOIN LATERAL (
  SELECT c_name, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) t ON true
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""


@query("join_lateral_topn", oracle=_LATERAL_TOPN_SQL)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by account balance per nation via a correlated
    LATERAL subquery — one statement text, two engines."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN_SQL)


# --- SQL scripting (Spark 4) ----------------------------------------------------
# The reference's notebooks constantly do "compute a threshold, then filter
# by it" as two Python steps (eda.ipynb outlier cells); Spark 4's SQL
# scripting (BEGIN / DECLARE / SET with scalar-subquery assignment) expresses
# that whole protocol as ONE engine-side statement. Variables declared inside
# the compound are block-scoped, so nothing leaks into the session. The
# threshold uses the repo's exact decimal mean/std kernels; the oracle is the
# same computation as a plain scalar CTE (DuckDB has no scripting).
def _scripting_sql(body: bool) -> str:
    mu, sd = N.sql_davg("l_extendedprice"), N.sql_dstd("l_extendedprice")
    select = """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_outliers,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS price_cents,
         round({mu} + 1.5 * {sd}, 2) AS cutoff
  FROM lineitem WHERE l_extendedprice > {mu} + 1.5 * {sd}
  GROUP BY l_returnflag{extra} ORDER BY l_returnflag"""
    if body:
        return f"""
BEGIN
  DECLARE mu DOUBLE;
  DECLARE sd DOUBLE;
  SET mu = (SELECT {mu} FROM lineitem);
  SET sd = (SELECT {sd} FROM lineitem);
  {select.format(mu='mu', sd='sd', extra='')};
END
"""
    return f"""
    WITH s AS (SELECT {mu} AS mu, {sd} AS sd FROM lineitem)
    {select.format(mu='s.mu', sd='s.sd', extra=', s.mu, s.sd').replace('FROM lineitem WHERE', 'FROM lineitem, s WHERE')}
    """


@query("sql_scripting_outlier_gate", oracle=_scripting_sql(body=False))
def sql_scripting_outlier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting: declare the mu+1.5*sigma cutoff from one
    aggregate pass, then run the gated rollup — the notebook two-step as a
    single compound statement."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_scripting_sql(body=True))


# --- case-insensitive collation (Spark 4) -------------------------------------
@query(
    "collate_group_ci",
    oracle="""
    WITH messy AS (
      SELECT CASE c_custkey % 3
               WHEN 0 THEN c_mktsegment
               WHEN 1 THEN lower(c_mktsegment)
               ELSE concat(upper(left(c_mktsegment, 1)),
                           lower(substring(c_mktsegment, 2)))
             END AS seg_messy
      FROM customer
    )
    SELECT lower(seg_messy) AS segment, count(*) AS n,
           count(DISTINCT seg_messy) AS n_case_variants
    FROM messy GROUP BY lower(seg_messy)
    """,
)
def collate_group_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATIONS: the messy-case
    segment column groups under UTF8_LCASE while a UTF8_BINARY distinct
    inside each group counts how many case variants collapsed — the
    engine-level answer to the lower()-wrapper pattern (the collation
    participates in hashing/comparison directly, so joins and aggs on
    collated columns need no derived column and keep any index/layout on
    the original). The emitted key is normalized with lower() because a
    collated group's representative value is whichever row the hash agg
    saw first — deliberately nondeterministic across partitionings."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH messy AS (
          SELECT CASE c_custkey % 3
                   WHEN 0 THEN c_mktsegment
                   WHEN 1 THEN lower(c_mktsegment)
                   ELSE concat(upper(left(c_mktsegment, 1)),
                               lower(substring(c_mktsegment, 2)))
                 END AS seg_messy
          FROM customer
        )
        SELECT lower(min(seg_messy COLLATE UTF8_BINARY)) AS segment,
               count(*) AS n,
               count(DISTINCT seg_messy COLLATE UTF8_BINARY)
                 AS n_case_variants
        FROM messy
        GROUP BY seg_messy COLLATE UTF8_LCASE
        """
    )
