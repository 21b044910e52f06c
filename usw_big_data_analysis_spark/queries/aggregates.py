"""Aggregations (SURVEY.md §2.5 A1-A13).

The reference's EDA aggregate surface: value_counts, multi-stat group-bys,
describe, crosstab with margins+normalize, pivot tables, null profiling,
correlation matrices, IQR outlier counts, whole-matrix stats, word count,
class-balance checks. Reference sites cited per query.

Scale notes: every query is one shuffle (partial aggregation map-side);
the "melt" pattern (stack) runs BEFORE aggregation but multiplies rows by
#columns — acceptable because it feeds a partial agg, and at 100 TB you'd
instead run one agg with per-column expressions (same plan shape as
`_describe_` here). Exact percentiles sort within group partitions; at
extreme scale swap for percentile_approx (documented per query).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _melt_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, x) long form of lineitem's numeric columns."""
    li = load_table(spark, sf_dir, "lineitem")
    stack = ", ".join(f"'{c}', {c}" for c in _NUM_COLS)
    return li.selectExpr(f"stack({len(_NUM_COLS)}, {stack}) AS (col_name, x)")


_MELT_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, {c} AS x FROM lineitem" for c in _NUM_COLS
)


# --- A1: value_counts incl. normalize (wine…03….ipynb:1248) -----------------
@query(
    "value_counts",
    oracle="""
    SELECT l_returnflag AS value, count(*) AS cnt,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS frac
    FROM lineitem GROUP BY l_returnflag
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_returnflag").alias("value")).agg(
        F.count("*").alias("cnt")
    )
    # Broadcast the scalar total instead of an unpartitioned window: on a
    # high-cardinality column the window would sort the whole group table in
    # one partition; the broadcast crossJoin keeps the group table partitioned.
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("frac", F.col("cnt").cast("double") / F.col("_total"))
        .drop("_total")
    )


# --- A2: group-by multi-agg mean/std/median (experiments/target_eda.py:72) --
@query(
    "groupby_agg",
    oracle=f"""
    SELECT l_returnflag,
           {N.sql_davg('l_quantity')} AS mean_qty,
           {N.sql_dstd('l_quantity')} AS std_qty,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        N.davg("l_quantity").alias("mean_qty"),
        N.dstd("l_quantity").alias("std_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.count("*").alias("n"),
    )


# --- A3: group means over many columns + sem (teamProject/eda.ipynb:1332) ---
@query(
    "groupby_mean_multi",
    oracle=f"""
    SELECT l_linestatus,
           {N.sql_davg('l_quantity')} AS mean_quantity,
           {N.sql_davg('l_extendedprice')} AS mean_extendedprice,
           {N.sql_davg('l_discount')} AS mean_discount,
           {N.sql_davg('l_tax')} AS mean_tax,
           {N.sql_dstd('l_quantity')} / sqrt(CAST(count(*) AS DOUBLE)) AS sem_quantity
    FROM lineitem GROUP BY l_linestatus
    """,
)
def groupby_mean_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [N.davg(c).alias(f"mean_{c[2:]}") for c in _NUM_COLS]
    aggs.append(
        (N.dstd("l_quantity") / F.sqrt(F.count("*").cast("double"))).alias(
            "sem_quantity"
        )
    )
    return li.groupBy("l_linestatus").agg(*aggs)


# --- A4: describe().T + zero counts (teamProject/eda.ipynb:430-445) ---------
# Exact interpolated percentiles WITHOUT the percentile() value buffer
# (which holds every value in executor memory — wrong at 100 TB and 3x
# slower than this at sf0.1): group by distinct value, window-cumsum the
# counts per column, then pick the two order statistics bracketing each
# target rank r = (n-1)p + 1 and interpolate vlo + frac*(vhi - vlo).
# p ∈ {.25, .5, .75} are dyadic, so r and frac are bit-identical in both
# engines' double arithmetic. Moments come from integer-split sums.
_DESCRIBE_SQL = f"""
  WITH melted AS ({_MELT_SQL}),
  agg AS (
    SELECT col_name, count(*) AS n, min(x) AS min_x, max(x) AS max_x,
           CAST(sum(CAST(x = 0.0 AS BIGINT)) AS BIGINT) AS n_zero,
           {N.sql_isum_items(N.sql_iscaled('x', 2), 's')},
           {N.sql_isum_items(f"({N.sql_iscaled('x', 2)}) * ({N.sql_iscaled('x', 2)})", 'ss')}
    FROM melted GROUP BY col_name
  ),
  moments AS (
    SELECT col_name, n, min_x, max_x, n_zero,
           {N.sql_isum_value('s', 2)} / CAST(n AS DOUBLE) AS mean,
           round(sqrt(({N.sql_isum_value('ss', 4)}
                       - {N.sql_isum_value('s', 2)} * {N.sql_isum_value('s', 2)}
                         / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0)), 6) AS std
    FROM agg
  ),
  cnts AS (SELECT col_name, x, count(*) AS cnt FROM melted GROUP BY col_name, x),
  marks AS (
    SELECT col_name, x, cnt,
           sum(cnt) OVER (PARTITION BY col_name ORDER BY x) AS cum,
           sum(cnt) OVER (PARTITION BY col_name ORDER BY x) - cnt AS prev,
           sum(cnt) OVER (PARTITION BY col_name) AS ntot
    FROM cnts
  ),
  hits AS (
    SELECT col_name, p,
           max(CASE WHEN prev < floor((ntot - 1) * p + 1)
                     AND cum >= floor((ntot - 1) * p + 1) THEN x END) AS vlo,
           max(CASE WHEN prev < ceil((ntot - 1) * p + 1)
                     AND cum >= ceil((ntot - 1) * p + 1) THEN x END) AS vhi,
           max((ntot - 1) * p + 1 - floor((ntot - 1) * p + 1)) AS frac
    FROM marks CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75]) AS p)
    GROUP BY col_name, p
  ),
  percs AS (
    SELECT col_name,
           max(CASE WHEN p = 0.25 THEN vlo + frac * (vhi - vlo) END) AS q25,
           max(CASE WHEN p = 0.5 THEN vlo + frac * (vhi - vlo) END) AS median,
           max(CASE WHEN p = 0.75 THEN vlo + frac * (vhi - vlo) END) AS q75
    FROM hits GROUP BY col_name
  )
  SELECT m.col_name, m.n, m.mean, m.std, m.min_x, p.q25, p.median, p.q75,
         m.max_x, m.n_zero
  FROM moments m JOIN percs p ON m.col_name = p.col_name
"""


@query("describe", oracle=_DESCRIBE_SQL)
def describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transposed describe: one row per column with count/mean/std/exact
    interpolated quartiles (pandas describe is exact), plus the reference's
    zero-count column.

    TWO passes over the fact, no shared plan subtrees (Spark re-executes a
    subtree per consumer — ReuseExchange does not collapse them across
    broadcast boundaries, and localCheckpoint's planning overhead exceeds
    a cheap re-scan; all measured — and per-pass cost at bench scale is
    dominated by plan compilation, so pass count is THE lever):

    - pass 1: a moment-carrying histogram. Buckets come from a FIXED
      integer shift of the 2-dp-scaled value (no data-dependent bounds →
      no min/max pre-pass, no broadcast): b = floor(round(x·100)/4096).
      One map-side-combinable agg lands per-(col, bucket) count, zeros,
      min/max, and hi/lo integer moment sums on the driver (≈ value-range
      /40.96 rows per column — bounded by the value domain of fixed-point
      business data, ~2.5k rows here; for arbitrary-range doubles use the
      min/max two-phase in percentile_ops instead). Moments roll up from
      the bucket partials in exact integer arithmetic; std's 6-dp rounding
      mirrors Spark/DuckDB HALF_UP via Decimal(repr(v)).
    - pass 2 (the returned plan): percentile bucket location (cumulate,
      bracket order statistics floor(r)/ceil(r)) is integer arithmetic on
      the collected histogram, done driver-side; the plan scans ONCE
      filtered to the located buckets (literal predicate), ranks the few
      hundred survivors in-bucket, interpolates, and attaches the literal
      moment columns.

    Round 2 ran three full melt scans with heavyweight agg expressions on
    every one plus multi-stage window/join scaffolding. Executor memory
    stays O(1); every rank/interp value is bit-identical to the oracle's
    window-cumsum form."""
    from functools import reduce

    li = load_table(spark, sf_dir, "lineitem")
    _SHIFT = 4096
    b_sql = f"CAST(FLOOR(i / {_SHIFT}) AS INT)"

    # one aggregation BRANCH per column, unioned — not a 4x stack melt:
    # each branch scans exactly one parquet column (columnar pruning makes
    # total bytes identical to the single melt scan) and the branches run
    # as independent parallel stages instead of one 4x-wider single-split
    # map task (measured 0.85s -> 0.3s on the one-row-group fixture; at
    # 100 TB per-branch pruning is strictly better than melting 4 columns
    # through one generator). The scaled bigint is projected once per row
    # (q1/corr_matrix fix).
    hist_aggs = [
        "count(*) AS cnt",
        "min(x) AS mn",
        "max(x) AS mx",
        "sum(CAST(x = 0.0D AS BIGINT)) AS nz",
        *N.spark_isum_items("i", "s"),
        *N.spark_isum_items("i * i", "ss"),
    ]

    def _col_hist(c: str):
        return (
            li.select(F.col(c).alias("x"))
            .filter(F.col("x").isNotNull())
            .selectExpr("x", f"{N.spark_iscaled('x', 2)} AS i")
            .groupBy(F.expr(b_sql).alias("b"))
            .agg(F.expr(hist_aggs[0]), *[F.expr(s) for s in hist_aggs[1:]])
            .selectExpr(f"'{c}' AS col_name", "*")
        )

    hist = reduce(
        DataFrame.unionByName, [_col_hist(c) for c in _NUM_COLS]
    ).toPandas()

    from decimal import ROUND_HALF_UP, Decimal

    def _round6(v: float) -> float:
        # mirrors F.round(double, 6) / DuckDB round: shortest-repr decimal,
        # HALF_UP at 6 dp (Python's built-in round is half-even — wrong)
        return float(Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    ps = [0.25, 0.5, 0.75]
    stats: dict[str, dict] = {}
    bucket_prev: dict[str, dict[int, int]] = {}
    targets: dict[str, set] = {}
    for c, g in hist.groupby("col_name"):
        g = g.sort_values("b")
        n = int(g["cnt"].sum())
        s_tot = int(g["s__hi"].sum()) * 1_000_000_000 + int(g["s__lo"].sum())
        ss_tot = int(g["ss__hi"].sum()) * 1_000_000_000 + int(g["ss__lo"].sum())
        sx = float(s_tot) / 100.0
        ssv = float(ss_tot) / 10000.0
        nd = float(n)
        mean = sx / nd
        std = _round6(math.sqrt((ssv - sx * sx / nd) / (nd - 1.0)))
        stats[c] = {
            "n": n,
            "mean": mean,
            "std": std,
            "min_x": float(g["mn"].min()),
            "max_x": float(g["mx"].max()),
            "n_zero": int(g["nz"].sum()),
        }
        prevs, cum = {}, 0
        pairs = list(zip(g["b"].astype(int), g["cnt"].astype(int)))
        for b, cnt in pairs:
            prevs[b] = cum
            cum += cnt
        bucket_prev[c] = prevs
        tset = set()
        for p in ps:
            r = (n - 1) * p + 1
            for rk in (math.floor(r), math.ceil(r)):
                # the bucket whose cumulative range covers rank rk
                for b, cnt in pairs:
                    if prevs[b] < rk <= prevs[b] + cnt:
                        tset.add(b)
                        break
        targets[c] = tset

    # pass 2 expressions are string-built (SQL CASE over the 4 col_names
    # with literals from pass 1) — the F.when-chain form cost ~0.5s of
    # py4j construction per cold call. Float literals use repr() + the
    # 'D' double suffix: shortest-repr round-trips bit-exactly through
    # both Python's and the JVM's nearest-double parse.
    def _dlit(v: float) -> str:
        return f"{v!r}D"

    def _case(fn) -> str:
        whens = " ".join(
            f"WHEN col_name = '{c}' THEN {fn(stats[c])}" for c in _NUM_COLS
        )
        return f"CASE {whens} END"

    # pass 2 (returned plan): per-column literal-predicate scans of the
    # located buckets only (same union-of-pruned-branches shape as pass 1 —
    # the bucket predicate is a literal IN-list per branch), tiny in-bucket
    # rank window, interpolate
    def _col_narrow(c: str):
        bucket = f"CAST(FLOOR(({N.spark_iscaled('x', 2)}) / {_SHIFT}) AS INT)"
        keep = ", ".join(str(b) for b in sorted(targets[c]))
        return (
            li.select(F.col(c).alias("x"))
            .filter(F.col("x").isNotNull())
            .selectExpr("x", f"{bucket} AS b")
            .filter(F.expr(f"b IN ({keep})"))
            .selectExpr(f"'{c}' AS col_name", "x", "b")
        )

    vals = (
        reduce(DataFrame.unionByName, [_col_narrow(c) for c in _NUM_COLS])
        .groupBy("col_name", "b", "x")
        .agg(F.count("*").alias("cnt"))
    )
    prev_whens = " ".join(
        f"WHEN col_name = '{c}' AND b = {b} THEN CAST({bucket_prev[c][b]} AS BIGINT)"
        for c in _NUM_COLS
        for b in sorted(targets[c])
    )
    prev_case = f"CASE {prev_whens} END"
    wv = Window.partitionBy("col_name", "b").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vals.withColumn("ib", F.sum("cnt").over(wv)).selectExpr(
        "col_name",
        "x",
        f"({prev_case}) + ib AS cum",
        f"({prev_case}) + ib - cnt AS prev",
    )
    hit_cols = []
    for i, p in enumerate(ps):
        r = _case(lambda s, p=p: str(math.floor((s["n"] - 1) * p + 1)))
        r_hi = _case(lambda s, p=p: str(math.ceil((s["n"] - 1) * p + 1)))
        hit_cols.append(
            f"max(CASE WHEN prev < ({r}) AND cum >= ({r}) THEN x END) AS vlo_{i}"
        )
        hit_cols.append(
            f"max(CASE WHEN prev < ({r_hi}) AND cum >= ({r_hi}) THEN x END) AS vhi_{i}"
        )
    hits = ranked.groupBy("col_name").agg(*[F.expr(s) for s in hit_cols])
    interp_cols = []
    for i, p in enumerate(ps):
        frac = _case(
            lambda s, p=p: _dlit(
                (s["n"] - 1) * p + 1 - math.floor((s["n"] - 1) * p + 1)
            )
        )
        interp_cols.append(f"vlo_{i} + ({frac}) * (vhi_{i} - vlo_{i}) AS p_{i}")
    percs = hits.selectExpr("col_name", *interp_cols)
    return percs.selectExpr(
        "col_name",
        _case(lambda s: str(s["n"])) + " AS n",
        _case(lambda s: _dlit(s["mean"])) + " AS mean",
        _case(lambda s: _dlit(s["std"])) + " AS std",
        _case(lambda s: _dlit(s["min_x"])) + " AS min_x",
        "p_0 AS q25",
        "p_1 AS median",
        "p_2 AS q75",
        _case(lambda s: _dlit(s["max_x"])) + " AS max_x",
        _case(lambda s: str(s["n_zero"])) + " AS n_zero",
    )


# --- A5: crosstab with margins + row-normalize ------------------------------
# (1-2.labeling_XYdataset.ipynb:492-497; experiments/target_eda.py:39-53)
_BUCKET_SQL = """
  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 3000 THEN 'low'
       WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END
"""
_XTAB_BODY = f"""
  SELECT c_mktsegment AS seg, {_BUCKET_SQL} AS bal_bucket,
         CAST(c_nationkey % 3 AS INT) AS cls
  FROM customer
"""


@query(
    "crosstab_margins",
    oracle=f"""
    WITH base AS ({_XTAB_BODY}),
    cells AS (
      SELECT seg, bal_bucket,
             CAST(sum(CAST(cls = 0 AS BIGINT)) AS BIGINT) AS n_0,
             CAST(sum(CAST(cls = 1 AS BIGINT)) AS BIGINT) AS n_1,
             CAST(sum(CAST(cls = 2 AS BIGINT)) AS BIGINT) AS n_2,
             count(*) AS row_total
      FROM base GROUP BY seg, bal_bucket
      UNION ALL
      SELECT 'All', 'All',
             CAST(sum(CAST(cls = 0 AS BIGINT)) AS BIGINT),
             CAST(sum(CAST(cls = 1 AS BIGINT)) AS BIGINT),
             CAST(sum(CAST(cls = 2 AS BIGINT)) AS BIGINT), count(*)
      FROM base
    )
    SELECT seg, bal_bucket, n_0, n_1, n_2, row_total,
           CAST(n_0 AS DOUBLE) / row_total AS p_0,
           CAST(n_1 AS DOUBLE) / row_total AS p_1,
           CAST(n_2 AS DOUBLE) / row_total AS p_2
    FROM cells
    """,
)
def crosstab_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.crosstab([k1,k2], cls, margins=True, normalize='index') via the
    reusable helper (functions/crosstab.py — the reference builds this
    shape 10+ times)."""
    from ..functions.crosstab import crosstab

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bal_bucket"),
        (F.col("c_nationkey") % 3).cast("int").alias("cls"),
    )
    return crosstab(base, ["seg", "bal_bucket"], "cls", [0, 1, 2])


# --- A6: pivot_table with agg + fillna(0) (wine…11….ipynb:5871-5878) --------
@query(
    "pivot_table",
    oracle=f"""
    SELECT l_returnflag,
           coalesce({N.sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")}
                    / CAST(nullif(count(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0) AS DOUBLE), 0.0) AS avg_F,
           coalesce({N.sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")}
                    / CAST(nullif(count(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0) AS DOUBLE), 0.0) AS avg_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot().agg(avg) with explicit pivot values (never let Spark
    scan for distinct pivot values at scale) + fillna(0); conditional-agg form
    so column naming matches the oracle exactly."""
    li = load_table(spark, sf_dir, "lineitem")

    def _davg_when(status: str) -> F.Column:
        x = F.when(F.col("l_linestatus") == status, F.col("l_quantity"))
        return F.coalesce(
            F.sum(x.cast("decimal(25,6)")).cast("double")
            / F.nullif(F.count(x), F.lit(0)).cast("double"),
            F.lit(0.0),
        )

    return li.groupBy("l_returnflag").agg(
        _davg_when("F").alias("avg_F"), _davg_when("O").alias("avg_O")
    )


# --- A7: null profile per column (1-1.data_processing.ipynb:2485) -----------
@query(
    "null_profile",
    oracle="""
    WITH injected AS (
      SELECT CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS c_quantity,
             CASE WHEN l_linenumber % 7 = 0 THEN NULL ELSE l_extendedprice END AS c_extendedprice,
             CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_discount END AS c_discount
      FROM lineitem
    ), s AS (
      SELECT count(*) AS total,
             count(*) - count(c_quantity) AS z_quantity,
             count(*) - count(c_extendedprice) AS z_extendedprice,
             count(*) - count(c_discount) AS z_discount
      FROM injected
    )
    SELECT col_name, n_null, CAST(n_null AS DOUBLE) / total AS null_frac FROM (
      SELECT 'c_quantity' AS col_name, z_quantity AS n_null, total FROM s
      UNION ALL SELECT 'c_extendedprice', z_extendedprice, total FROM s
      UNION ALL SELECT 'c_discount', z_discount, total FROM s
    )
    """,
)
def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    injected = li.select(
        F.when(F.col("l_linenumber") % 3 == 0, None).otherwise(F.col("l_quantity")).alias("c_quantity"),
        F.when(F.col("l_linenumber") % 7 == 0, None).otherwise(F.col("l_extendedprice")).alias("c_extendedprice"),
        F.when(F.col("l_orderkey") % 11 == 0, None).otherwise(F.col("l_discount")).alias("c_discount"),
    )
    cols = injected.columns
    stats = injected.agg(
        F.count("*").alias("total"),
        *[(F.count("*") - F.count(c)).alias(f"z_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', z_{c}" for c in cols)
    return stats.selectExpr(
        "total", f"stack({len(cols)}, {stack}) AS (col_name, n_null)"
    ).select(
        "col_name",
        "n_null",
        (F.col("n_null").cast("double") / F.col("total")).alias("null_frac"),
    )


# --- A8: correlation matrix (teamProject/sap.py:48; eda.ipynb:1154) ---------
def _corr_pairs():
    return [
        (a, b) for i, a in enumerate(_NUM_COLS) for b in _NUM_COLS[i + 1 :]
    ]


# Sufficient statistics computed ONCE per column/pair (4 sx + 4 sxx +
# 6 sxy + n = 15 unique aggregates — the per-pair dcorr form repeated the
# marginals 6x and the decimal accumulators were 3-4x slower than the
# integer-split sums; together a ~10x win measured at sf0.1).
def _corr_sql() -> str:
    items = ["count(*) AS n"]
    for c in _NUM_COLS:
        xi = N.sql_iscaled(c, 2)
        items.append(N.sql_isum_items(xi, f"s_{c}"))
        items.append(N.sql_isum_items(f"({xi}) * ({xi})", f"ss_{c}"))
    for a, b in _corr_pairs():
        items.append(
            N.sql_isum_items(
                f"({N.sql_iscaled(a, 2)}) * ({N.sql_iscaled(b, 2)})", f"sp_{a}_{b}"
            )
        )
    vals = ["CAST(n AS DOUBLE) AS n"]
    for c in _NUM_COLS:
        vals.append(f"{N.sql_isum_value(f's_{c}', 2)} AS sx_{c}")
        vals.append(f"{N.sql_isum_value(f'ss_{c}', 4)} AS ss_{c}")
    for a, b in _corr_pairs():
        vals.append(f"{N.sql_isum_value(f'sp_{a}_{b}', 4)} AS sp_{a}_{b}")
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
        f"round((n * sp_{a}_{b} - sx_{a} * sx_{b}) / "
        f"sqrt((n * ss_{a} - sx_{a} * sx_{a}) * (n * ss_{b} - sx_{b} * sx_{b})), 6) "
        f"AS corr_xy FROM v"
        for a, b in _corr_pairs()
    )
    return (
        "WITH s AS (SELECT "
        + ", ".join(items)
        + " FROM lineitem), v AS (SELECT "
        + ", ".join(vals)
        + " FROM s) "
        + rows
    )


@query("corr_matrix", oracle=_corr_sql())
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Pearson matrix in ONE aggregation pass: the 15 unique
    sufficient statistics (integer-split exact sums, functions/numeric.py)
    in a single shuffle-free partial agg, correlations assembled by
    expression arithmetic, emitted long-form via stack. Feeds prune_corr
    (M10); the ml.stat.Correlation alternative assembles a vector column."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = _corr_pairs()
    # string-built expressions (N.spark_*): one JVM-parsed F.expr per agg —
    # the 61-aggregate tree was ~0.6s of py4j construction per cold call.
    # The scaled bigints are projected ONCE per column (not re-derived inside
    # every product — measured 45ms -> 28ms per sf0.1 pass), first moments are
    # plain bigint sums (Σ of a <=1e7-scaled value fits int64 to ~9e11 rows,
    # wider than the hi/lo envelope itself), and only the second moments /
    # cross products carry the hi/lo split.
    proj = li.selectExpr(*[f"{N.spark_iscaled(c, 2)} AS i_{c}" for c in _NUM_COLS])
    aggs = ["count(*) AS n_raw"]
    for c in _NUM_COLS:
        aggs.append(f"sum(i_{c}) AS s_{c}")
        aggs += N.spark_isum_items(f"i_{c} * i_{c}", f"ss_{c}")
    for a, b in pairs:
        aggs += N.spark_isum_items(f"i_{a} * i_{b}", f"sp_{a}_{b}")
    one = proj.agg(F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]])
    vals = ["CAST(n_raw AS DOUBLE) AS n"]
    for c in _NUM_COLS:
        vals.append(f"(CAST(s_{c} AS DOUBLE) / 100.0) AS sx_{c}")
        vals.append(f"{N.spark_isum_value(f'ss_{c}', 4)} AS ss_v_{c}")
    for a, b in pairs:
        vals.append(f"{N.spark_isum_value(f'sp_{a}_{b}', 4)} AS sp_v_{a}_{b}")
    v = one.selectExpr(*vals)
    corrs = v.selectExpr(
        *[
            f"round((n * sp_v_{a}_{b} - sx_{a} * sx_{b}) / "
            f"sqrt((n * ss_v_{a} - sx_{a} * sx_{a}) "
            f"* (n * ss_v_{b} - sx_{b} * sx_{b})), 6) AS c_{i}"
            for i, (a, b) in enumerate(pairs)
        ]
    )
    stack = ", ".join(f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs))
    return corrs.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_x, col_y, corr_xy)"
    )


# --- A9: per-column correlation with target (eda.ipynb:1200-1215) -----------
@query(
    "corr_target",
    oracle=(
        lambda tgt, cols: (
            "WITH s AS (SELECT count(*) AS n, "
            + ", ".join(
                [N.sql_isum_items(N.sql_iscaled(c, 2), f"s_{c}") for c in cols + (tgt,)]
                + [
                    N.sql_isum_items(
                        f"({N.sql_iscaled(c, 2)}) * ({N.sql_iscaled(c, 2)})", f"ss_{c}"
                    )
                    for c in cols + (tgt,)
                ]
                + [
                    N.sql_isum_items(
                        f"({N.sql_iscaled(c, 2)}) * ({N.sql_iscaled(tgt, 2)})", f"sp_{c}"
                    )
                    for c in cols
                ]
            )
            + " FROM lineitem), v AS (SELECT CAST(n AS DOUBLE) AS n, "
            + ", ".join(
                [f"{N.sql_isum_value(f's_{c}', 2)} AS sx_{c}" for c in cols + (tgt,)]
                + [f"{N.sql_isum_value(f'ss_{c}', 4)} AS ss_{c}" for c in cols + (tgt,)]
                + [f"{N.sql_isum_value(f'sp_{c}', 4)} AS sp_{c}" for c in cols]
            )
            + " FROM s) SELECT col_name, corr_t, abs(corr_t) AS abs_corr FROM ("
            + " UNION ALL ".join(
                f"SELECT '{c}' AS col_name, "
                f"round((n * sp_{c} - sx_{c} * sx_{tgt}) / "
                f"sqrt((n * ss_{c} - sx_{c} * sx_{c}) * (n * ss_{tgt} - sx_{tgt} * sx_{tgt})), 6) "
                f"AS corr_t FROM v"
                for c in cols
            )
            + ")"
        )
    )("l_extendedprice", ("l_quantity", "l_discount", "l_tax")),
)
def corr_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column correlation with one target in a single pass — shared
    sufficient statistics via integer-split sums (see corr_matrix)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ("l_quantity", "l_discount", "l_tax")
    tgt = "l_extendedprice"
    aggs = [F.count("*").alias("n_raw")]
    for c in cols + (tgt,):
        xi = N.iscaled(c, 2)
        aggs += N.isum_aggs(xi, f"s_{c}")
        aggs += N.isum_aggs(xi * xi, f"ss_{c}")
    for c in cols:
        aggs += N.isum_aggs(N.iscaled(c, 2) * N.iscaled(tgt, 2), f"sp_{c}")
    one = li.agg(*aggs)
    n = F.col("n_raw").cast("double")
    v = one.select(
        n.alias("n"),
        *[N.isum_value(f"s_{c}", 2).alias(f"sx_{c}") for c in cols + (tgt,)],
        *[N.isum_value(f"ss_{c}", 4).alias(f"ss_v_{c}") for c in cols + (tgt,)],
        *[N.isum_value(f"sp_{c}", 4).alias(f"sp_v_{c}") for c in cols],
    )
    corrs = v.select(
        *[
            F.round(
                (F.col("n") * F.col(f"sp_v_{c}") - F.col(f"sx_{c}") * F.col(f"sx_{tgt}"))
                / F.sqrt(
                    (F.col("n") * F.col(f"ss_v_{c}") - F.col(f"sx_{c}") * F.col(f"sx_{c}"))
                    * (
                        F.col("n") * F.col(f"ss_v_{tgt}")
                        - F.col(f"sx_{tgt}") * F.col(f"sx_{tgt}")
                    )
                ),
                6,
            ).alias(f"c_{i}")
            for i, c in enumerate(cols)
        ]
    )
    stack = ", ".join(f"'{c}', c_{i}" for i, c in enumerate(cols))
    return corrs.selectExpr(f"stack({len(cols)}, {stack}) AS (col_name, corr_t)").select(
        "col_name", "corr_t", F.abs("corr_t").alias("abs_corr")
    )


# --- A10: quartiles + IQR outlier counts (teamProject/eda.ipynb:1083-1090) --
@query(
    "quantiles_iqr",
    oracle=f"""
    WITH melted AS ({_MELT_SQL}),
    q AS (
      SELECT col_name, quantile_cont(x, 0.25) AS q1, quantile_cont(x, 0.75) AS q3
      FROM melted GROUP BY col_name
    )
    SELECT m.col_name, q.q1, q.q3, q.q3 - q.q1 AS iqr,
           CAST(sum(CAST(m.x < q.q1 - 1.5 * (q.q3 - q.q1)
                 OR m.x > q.q3 + 1.5 * (q.q3 - q.q1) AS BIGINT)) AS BIGINT) AS n_outliers
    FROM melted m JOIN q ON m.col_name = q.col_name
    GROUP BY m.col_name, q.q1, q.q3
    """,
)
def quantiles_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE fact pass (a per-(col, value) count aggregate, map-side
    combined, materialized); quartiles AND outlier counts then run over
    the distinct-value table — the quartiles via the bucketed two-phase
    operator in ``counts=True`` mode (no percentile() value buffer — see
    operators/percentile_ops.py), the outlier tally as a
    count-weighted sum against the broadcast quartiles. Previously the
    fact melt was re-scanned by every percentile phase plus the outlier
    pass (optimization r07, guide §2.3/§2.4; 2.6s → ~0.9s at sf0.1)."""
    from ..operators.percentile_ops import bucketed_exact_percentiles

    melted = _melt_lineitem(spark, sf_dir)
    c = (
        melted.groupBy("col_name", "x")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    q = bucketed_exact_percentiles(c, [0.25, 0.75], counts=True).select(
        "col_name", F.col("p_0").alias("q1"), F.col("p_1").alias("q3")
    )
    iqr = F.col("q3") - F.col("q1")
    joined = c.join(F.broadcast(q), "col_name")
    return joined.groupBy("col_name", "q1", "q3").agg(
        F.sum(
            F.when(
                (F.col("x") < F.col("q1") - 1.5 * iqr)
                | (F.col("x") > F.col("q3") + 1.5 * iqr),
                F.col("cnt"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_outliers")
    ).select("col_name", "q1", "q3", iqr.alias("iqr"), "n_outliers")


# --- A11: whole-matrix global stats (1-1.data_processing.ipynb:2050-2080) ---
@query(
    "global_stats",
    oracle=f"""
    WITH melted AS ({_MELT_SQL})
    SELECT count(*) AS n, min(x) AS min_x, max(x) AS max_x,
           {N.sql_davg('x')} AS mean_x,
           quantile_cont(x, 0.5) AS median_x,
           CAST(sum(CAST(x < 0 AS BIGINT)) AS BIGINT) AS n_negative
    FROM melted
    """,
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split aggregations (optimization r07, guide §1.1/§2.3): one
    # Aggregate mixing the TypedImperative percentile with the codegen
    # scalars planned EVERYTHING through ObjectHashAggregate (4.0s at
    # sf0.1 vs 0.87s + 2.0s run apart). The median additionally folds
    # over (distinct value, count) via percentile's frequency argument —
    # the buffer it builds is itself a value→count map, so pre-counting
    # feeds it the identical map (bit-equal, hex-verified) while the
    # map-side combine collapses fact rows before the shuffle. 1.77s.
    melted = _melt_lineitem(spark, sf_dir)
    scalars = melted.agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        N.davg("x").alias("mean_x"),
        F.sum((F.col("x") < 0).cast("bigint")).alias("n_negative"),
    )
    med = (
        melted.groupBy("x")
        .agg(F.count("*").alias("cnt"))
        .agg(F.expr("percentile(x, 0.5, cnt)").alias("median_x"))
    )
    return scalars.crossJoin(med).select(
        "n", "min_x", "max_x", "mean_x", "median_x", "n_negative"
    )


# --- A12: word count top-10 (computer-structure.ipynb:33-47) ----------------
@query(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 10
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → groupBy → count → top-k; ties broken by word so the
    LIMIT is deterministic. At scale this is a map-side-combined single
    shuffle; the final top-10 is a TakeOrdered, not a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(10)
    )


# --- A13: class balance check (teamProject/eda.ipynb:345-360) ---------------
@query(
    "class_distribution_check",
    oracle="""
    WITH per_class AS (
      SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag
    )
    SELECT count(*) AS n_classes, min(cnt) AS min_cnt, max(cnt) AS max_cnt,
           CAST(min(cnt) AS DOUBLE) / max(cnt) AS balance_ratio
    FROM per_class
    """,
)
def class_distribution_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_class = li.groupBy("l_returnflag").agg(F.count("*").alias("cnt"))
    return per_class.agg(
        F.count("*").alias("n_classes"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        (F.min("cnt").cast("double") / F.max("cnt")).alias("balance_ratio"),
    )


# --- grouped exact interpolated median ---------------------------------------
@query(
    "groupby_median",
    oracle="""
    SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS median_price,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def groupby_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median PER GROUP from distinct-value counts:
    every window is partitioned by the group key, so the work distributes
    across groups (and within a group collapses to its distinct values —
    map-side combined before the shuffle). Interpolation vlo + frac*(vhi -
    vlo) with dyadic p=0.5 is bit-identical to DuckDB's quantile_cont.
    The percentile()-buffer alternative holds whole groups in executor
    memory — this shape is the one that survives a 100 TB hot group."""
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("cnt")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy("l_returnflag")
    marks = cnts.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("cnt").over(wcum).alias("cum"),
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("prev"),
        F.sum("cnt").over(wtot).alias("ntot"),
    )
    r = (F.col("ntot") - 1) * 0.5 + 1
    hits = marks.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                (F.col("prev") < F.floor(r)) & (F.col("cum") >= F.floor(r)),
                F.col("l_extendedprice"),
            )
        ).alias("vlo"),
        F.max(
            F.when(
                (F.col("prev") < F.ceil(r)) & (F.col("cum") >= F.ceil(r)),
                F.col("l_extendedprice"),
            )
        ).alias("vhi"),
        F.max(r - F.floor(r)).alias("frac"),
        F.max("ntot").alias("n"),
    )
    return hits.select(
        "l_returnflag",
        (F.col("vlo") + F.col("frac") * (F.col("vhi") - F.col("vlo"))).alias(
            "median_price"
        ),
        "n",
    ).orderBy("l_returnflag")


# --- equi-width histogram (the reference's EDA `.hist()` as an engine op) ----
_HIST_BINS = 20


@query(
    "histogram_equiwidth",
    oracle=f"""
    WITH mm AS (
      SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM lineitem
    ),
    binned AS (
      SELECT least(CAST(floor((l_extendedprice - mm.mn) / (mm.mx - mm.mn)
                               * {_HIST_BINS}) AS INT), {_HIST_BINS - 1}) AS bin,
             mm.mn, mm.mx
      FROM lineitem, mm
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(mn) + bin * (min(mx) - min(mn)) / {_HIST_BINS}, 6) AS lo,
           round(min(mn) + (bin + 1) * (min(mx) - min(mn)) / {_HIST_BINS}, 6) AS hi
    FROM binned GROUP BY bin
    """,
)
def histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over l_extendedprice ({bins} bins) — the
    reference EDAs distributions with pandas `.hist()` (driver-side
    matplotlib); here the binning is the engine's job: one scan for min/max
    (a 2-value broadcast), one scan to bin and count with map-side partial
    aggregation. The bin arithmetic is pure IEEE double ops in a fixed
    expression order, so both engines place every row identically; the top
    edge folds into the last bin via least(). At 100 TB this is the shape
    a profiler runs per column — no value buffers, no sorts.""".format(
        bins=_HIST_BINS
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    binned = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * _HIST_BINS
            ).cast("int"),
            F.lit(_HIST_BINS - 1),
        ).alias("bin"),
        "mn",
        "mx",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(
            F.min("mn") + F.col("bin") * (F.min("mx") - F.min("mn")) / _HIST_BINS, 6
        ).alias("lo"),
        F.round(
            F.min("mn")
            + (F.col("bin") + 1) * (F.min("mx") - F.min("mn")) / _HIST_BINS,
            6,
        ).alias("hi"),
    )


# --- discrete (order-statistic) P90 per group --------------------------------
@query(
    "groupby_p90_disc",
    oracle="""
    WITH d AS (
      SELECT l_returnflag AS grp, l_extendedprice AS x,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY grp, x
    ),
    c AS (
      SELECT grp, x,
             sum(cnt) OVER (PARTITION BY grp ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    ),
    n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_rows FROM d GROUP BY grp)
    SELECT c.grp, n.n_rows, min(c.x) AS p90_disc
    FROM c JOIN n ON c.grp = n.grp
    WHERE c.cum >= CAST(ceil(0.9 * n.n_rows) AS BIGINT)
    GROUP BY c.grp, n.n_rows
    """,
)
def groupby_p90_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (percentile_disc) P90 per group: the smallest actual value
    with cumulative count >= ceil(0.9 n) — an ORDER STATISTIC, so the
    answer is always a real data value (SLA/p90-latency semantics), unlike
    the interpolated quantiles elsewhere.

    Scale shape: the fact collapses to per-(group, value) counts map-side;
    the cumulative pass is a GROUP-partitioned window over the distinct-
    value table (every partition is one group's values — parallel across
    groups, no single-partition move); selection is pure integer
    arithmetic, no float conventions."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_extendedprice").alias("x")
    ).agg(F.expr("CAST(count(*) AS BIGINT) AS cnt"))
    w = Window.partitionBy("grp").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn("cum", F.sum("cnt").over(w))
    n = d.groupBy("grp").agg(F.expr("CAST(sum(cnt) AS BIGINT) AS n_rows"))
    return (
        c.join(F.broadcast(n), "grp")
        .filter(F.expr("cum >= CAST(ceil(0.9 * n_rows) AS BIGINT)"))
        .groupBy("grp", "n_rows")
        .agg(F.expr("min(x) AS p90_disc"))
    )


# --- 2-D histogram: price band x quantity band -------------------------------
@query(
    "hist2d_price_qty",
    oracle="""
    SELECT CAST(least(floor(l_extendedprice / 10000), 9) AS INT)
             AS price_band,
           CAST(least(floor(l_quantity / 10), 4) AS INT) AS qty_band,
           count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem
    GROUP BY price_band, qty_band
    """,
)
def hist2d_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram of the (price, quantity) joint distribution — the
    joint-density EDA grid behind heatmaps and coarse copulas. Bands are
    fixed-width clamped floors (pure projection), so the whole query is
    one map-side-combined aggregate over ~50 cells; cents stay exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.expr("CAST(least(floor(l_extendedprice / 10000), 9) AS INT)").alias(
            "price_band"
        ),
        F.expr("CAST(least(floor(l_quantity / 10), 4) AS INT)").alias("qty_band"),
    ).agg(
        F.expr("count(*) AS n"),
        F.expr(
            f"CAST(sum({N.spark_fround_int('l_extendedprice * 100')}) AS BIGINT)"
            " AS cents"
        ),
    )


# --- weekly price-quantile trend ---------------------------------------------
@query(
    "weekly_price_quantiles",
    oracle="""
    WITH d AS (
      SELECT epoch_us(o_orderdate) // (7 * 86400000000) AS wk,
             o_totalprice AS x,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY wk, x
    ),
    c AS (
      SELECT wk, x,
             sum(cnt) OVER (PARTITION BY wk ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    ),
    n AS (SELECT wk, CAST(sum(cnt) AS BIGINT) AS n_rows FROM d GROUP BY wk)
    SELECT c.wk, n.n_rows,
           min(CASE WHEN c.cum * 2 >= n.n_rows THEN c.x END) AS p50_disc,
           min(CASE WHEN c.cum * 10 >= 9 * n.n_rows THEN c.x END) AS p90_disc
    FROM c JOIN n ON c.wk = n.wk
    GROUP BY c.wk, n.n_rows
    """,
)
def weekly_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly p50/p90 order-value trend — the quantile time series behind
    pricing drift dashboards, in percentile_disc semantics (real data
    values, integer rank selection: smallest x with 2·cum >= n / 10·cum
    >= 9n — cross-multiplied so no division at all).

    Scale shape: the fact collapses to per-(week, value) counts
    map-side; cumulative passes are WEEK-partitioned windows over
    distinct values (parallel across weeks, the groupby_p90_disc
    pattern); both quantiles come from the same cumulated table."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div (7 * 86400000000)"
        ).alias("wk"),
        F.col("o_totalprice").alias("x"),
    ).agg(F.expr("CAST(count(*) AS BIGINT) AS cnt"))
    w = Window.partitionBy("wk").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn("cum", F.sum("cnt").over(w))
    n = d.groupBy("wk").agg(F.expr("CAST(sum(cnt) AS BIGINT) AS n_rows"))
    return (
        c.join(n, "wk")
        .groupBy("wk", "n_rows")
        .agg(
            F.expr("min(CASE WHEN cum * 2 >= n_rows THEN x END) AS p50_disc"),
            F.expr("min(CASE WHEN cum * 10 >= 9 * n_rows THEN x END) AS p90_disc"),
        )
    )


# --- data-sufficiency: running-mean convergence curve ------------------------
@query(
    "mean_convergence_curve",
    oracle="""
    WITH b AS (SELECT max(o_orderkey) + 1 AS nk FROM orders),
    chk AS (SELECT unnest([1, 2, 4, 8]) AS k),
    pre AS (
      SELECT chk.k,
             CAST(sum(CASE WHEN o.o_orderkey * 8 < b.nk * chk.k
                           THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o.o_orderkey * 8 < b.nk * chk.k
                           THEN CAST(o.o_totalprice AS DECIMAL(25,6))
                           ELSE 0 END) AS DOUBLE) AS s
      FROM orders o CROSS JOIN b CROSS JOIN chk
      GROUP BY chk.k
    ),
    fin AS (SELECT s / n AS mu FROM pre WHERE k = 8)
    SELECT p.k AS prefix_eighths, p.n,
           round(p.s / p.n, 6) AS mean_prefix,
           round(abs(p.s / p.n - f.mu), 6) AS abs_delta_vs_full
    FROM pre p CROSS JOIN fin f
    """,
)
def mean_convergence_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-sufficiency audit: the running mean of order value at nested
    key prefixes (1/8..1) and its distance from the full-data mean — a
    flat curve says a sample suffices for this statistic (the cheap
    precursor to bootstrap_resample's CI). One scan with the broadcast
    checkpoint dimension (conditional decimal sums — the
    vocab_growth_curve trick on a numeric statistic)."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(F.expr("max(o_orderkey) + 1 AS nk"))
    chk = spark.range(4).selectExpr("CAST(pow(2, id) AS INT) AS k")
    pre = (
        orders.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(chk))
        .groupBy("k")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN o_orderkey * 8 < nk * k THEN 1 ELSE 0 END)"
                " AS BIGINT) AS n"
            ),
            F.expr(
                "CAST(sum(CASE WHEN o_orderkey * 8 < nk * k"
                " THEN CAST(o_totalprice AS DECIMAL(25,6))"
                " ELSE 0 END) AS DOUBLE) AS s"
            ),
        )
    )
    fin = pre.filter("k = 8").selectExpr("s / n AS mu")
    return pre.crossJoin(F.broadcast(fin)).selectExpr(
        "k AS prefix_eighths",
        "n",
        "round(s / n, 6) AS mean_prefix",
        "round(abs(s / n - mu), 6) AS abs_delta_vs_full",
    )


# --- conditional demand curve: mean quantity per price band ------------------
@query(
    "price_quantity_curve",
    oracle=f"""
    SELECT CAST(least(floor(l_extendedprice / 10000), 9) AS INT)
             AS price_band,
           count(*) AS n,
           {N.sql_davg('l_quantity')} AS mean_qty,
           round({N.sql_dstd('l_quantity')}
                 / sqrt(CAST(count(*) AS DOUBLE)), 6) AS sem_qty
    FROM lineitem
    GROUP BY price_band
    """,
)
def price_quantity_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional demand curve: mean ordered quantity (with its standard
    error) per price band — the elasticity-shaped readout hist2d's joint
    counts feed (a downward-sloping curve is the textbook signal). One
    map-side aggregate over 10 bands; decimal-exact moments."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.expr("CAST(least(floor(l_extendedprice / 10000), 9) AS INT)").alias(
            "price_band"
        )
    ).agg(
        F.count("*").alias("n"),
        N.davg("l_quantity").alias("mean_qty"),
        F.round(
            N.dstd("l_quantity") / F.sqrt(F.count("*").cast("double")), 6
        ).alias("sem_qty"),
    )


# --- grouped exact quantiles via applyInArrow ---------------------------------
def _arrow_group_quantiles(tbl):
    """Per-group kernel (executor-side, zero pandas/py-row boxing): exact
    interpolated quartiles of l_quantity with numpy over the Arrow table.
    numpy 'linear' interpolation == DuckDB quantile_cont."""
    import numpy as np
    import pyarrow as pa

    x = np.sort(tbl.column("l_quantity").to_numpy(zero_copy_only=False))
    q1, med, q3 = (round(float(v), 6) for v in np.percentile(x, [25, 50, 75]))
    return pa.table(
        {
            "l_returnflag": [tbl.column("l_returnflag")[0].as_py()],
            "l_linestatus": [tbl.column("l_linestatus")[0].as_py()],
            "n": [len(x)],
            "q1": [q1],
            "median": [med],
            "q3": [q3],
        }
    )


@query(
    "group_quantiles_arrow",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(quantile_cont(l_quantity, 0.25), 6) AS q1,
           round(quantile_cont(l_quantity, 0.50), 6) AS median,
           round(quantile_cont(l_quantity, 0.75), 6) AS q3
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_quantiles_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact quartiles through ``groupBy().applyInArrow`` — the
    Arrow-native grouped-map API (one pyarrow.Table per group, no pandas
    conversion, no row boxing), completing the repo's Arrow UDF taxonomy
    (scalar mapInArrow: text_token_count_arrow; grouped pandas:
    pandas_group_ols; grouped arrow: here). Per-group value buffers are
    the documented cost of the API — right when groups are bounded (4
    flag/status groups here); the bucketed two-phase percentile operator
    remains the unbounded-group path (operators/percentile_ops.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_quantity")
        .groupBy("l_returnflag", "l_linestatus")
        .applyInArrow(
            _arrow_group_quantiles,
            schema=(
                "l_returnflag string, l_linestatus string, n bigint,"
                " q1 double, median double, q3 double"
            ),
        )
    )


# --- grouped mode with deterministic tie-break -------------------------------
@query(
    "groupby_mode",
    oracle="""
    WITH cnts AS (
      SELECT l_returnflag AS grp, l_quantity AS v, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    mx AS (SELECT grp, max(c) AS mc FROM cnts GROUP BY grp)
    SELECT c.grp, min(c.v) AS mode_value, CAST(m.mc AS BIGINT) AS mode_count
    FROM cnts c JOIN mx m ON c.grp = m.grp AND c.c = m.mc
    GROUP BY c.grp, m.mc
    """,
)
def groupby_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group modal value of l_quantity, ties broken to the SMALLEST
    value (df.mode() semantics pinned deterministically; impute_mode uses
    the same convention for its fill constant). Two map-side-combinable
    aggregations over the bounded (group, value) histogram — no window, no
    sort; the argmax is a self-join on the <=groups-row max frame."""
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("v")
    ).agg(F.count("*").cast("bigint").alias("c"))
    mx = cnts.groupBy("grp").agg(F.max("c").alias("mc"))
    return (
        cnts.join(F.broadcast(mx), ["grp"])
        .filter(F.col("c") == F.col("mc"))
        .groupBy("grp", "mc")
        .agg(F.min("v").alias("mode_value"))
        .select("grp", "mode_value", F.col("mc").cast("bigint").alias("mode_count"))
    )


# --- pandas-.T parity: transposed per-flag summary ---------------------------
# The reference's EDA leans on small-frame `.T` (reference:
# final-assignment/experiments/target_eda.py:155, teamProject/eda.ipynb);
# Spark 4's DataFrame.transpose covers that surface natively.
@query(
    "transpose_stats",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS f,
             CAST(count(*) AS DOUBLE) AS n_items,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DECIMAL(38,2))
                  AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2)))
                       AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
             max(l_tax) AS max_tax,
             min(l_discount) AS min_disc
      FROM lineitem GROUP BY 1
    )
    SELECT u.key,
           max(CASE WHEN g.f = 'A' THEN u.v END) AS A,
           max(CASE WHEN g.f = 'N' THEN u.v END) AS N,
           max(CASE WHEN g.f = 'R' THEN u.v END) AS R
    FROM g, LATERAL (VALUES ('n_items', g.n_items), ('sum_qty', g.sum_qty),
                            ('sum_price', g.sum_price), ('max_tax', g.max_tax),
                            ('min_disc', g.min_disc)) AS u(key, v)
    GROUP BY u.key
    """,
)
def transpose_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag summary flipped metrics-as-rows via Spark 4's native
    DataFrame.transpose — the pandas `.T` EDA idiom. The transposed frame is
    the BOUNDED 3-row aggregate (one row per flag), so the driver-side
    column-name materialization transpose needs is over grouped output, never
    raw rows; the only shuffle is the map-side-combined groupBy. Sums run
    exact (DECIMAL(38,2)) before the final double cast, so each cell is the
    identical IEEE value in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_returnflag").alias("f")).agg(
        F.count("*").cast("double").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(38,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_price"),
        F.max("l_tax").alias("max_tax"),
        F.min("l_discount").alias("min_disc"),
    )
    return g.transpose("f")  # transpose names the metric column "key"
