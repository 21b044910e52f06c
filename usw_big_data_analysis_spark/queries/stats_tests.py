"""Statistical tests (SURVEY.md §2.11 T1-T9) — scipy.stats surface.

Each test computes its statistic fully inside the engine from distributed
sufficient statistics (counts, decimal sums, windowed average ranks); only
the p-value lookup (a special-function CDF) is driver-side — see
``functions/stats.py`` for the scipy-finished variants. The oracle-checked
queries return the exact statistics.

Rank-based tests use ``operators.rank_ops.mean_ranks`` — the two-phase
bucketed mean-rank operator (ties get the mean rank, matching scipy). The
fact table collapses to per-distinct-value counts via map-side combine
before any window; the only unpartitioned window is over the ≤1024-row
bucket histogram, so no total sort ever happens. Average ranks are
half-integers < 2^52, so their sums are exact in double regardless of
order — bit-identical to the row-level ``rank()`` the oracles run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..operators.rank_ops import mean_ranks
from ..registry import query
from ..sources import load_table

# per-group decimal sufficient statistics of l_quantity by l_returnflag
_GRP_SQL = f"""
  SELECT l_returnflag AS grp, CAST(count(*) AS DOUBLE) AS n,
         {N.sql_dsum('l_quantity')} AS sx,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                       * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))
              AS DOUBLE) AS sxx
  FROM lineitem GROUP BY l_returnflag
"""


def _grp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q.cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum(
            (q.cast("decimal(25,6)") * q.cast("decimal(25,6)")).cast("decimal(38,10)")
        )
        .cast("double")
        .alias("sxx"),
    )


# --- T1: one-sample t (Statistical_test_iris_analysis.ipynb:37) -------------
@query(
    "ttest_1samp",
    oracle=f"""
    WITH s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, {N.sql_davg('l_quantity')} AS m,
             {N.sql_dvar('l_quantity')} AS v
      FROM lineitem
    )
    SELECT round((m - 25.5) / sqrt(v / n), 6) AS t_stat,
           CAST(n - 1 AS BIGINT) AS df
    FROM s
    """,
)
def ttest_1samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count("*").cast("double").alias("n"),
        N.davg("l_quantity").alias("m"),
        N.dvar("l_quantity").alias("v"),
    )
    t = (F.col("m") - 25.5) / F.sqrt(F.col("v") / F.col("n"))
    return s.select(
        F.round(t, 6).alias("t_stat"), (F.col("n") - 1).cast("bigint").alias("df")
    )


# --- T2: Welch two-sample t (train_test_comparison.py:94,151) ---------------
@query(
    "ttest_ind",
    oracle=f"""
    WITH g AS ({_GRP_SQL}),
    ab AS (
      SELECT max(CASE WHEN grp = 'A' THEN n END) AS n1,
             max(CASE WHEN grp = 'A' THEN sx END) AS sx1,
             max(CASE WHEN grp = 'A' THEN sxx END) AS sxx1,
             max(CASE WHEN grp = 'R' THEN n END) AS n2,
             max(CASE WHEN grp = 'R' THEN sx END) AS sx2,
             max(CASE WHEN grp = 'R' THEN sxx END) AS sxx2
      FROM g
    ),
    d AS (
      SELECT n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
             (sxx1 - sx1 * sx1 / n1) / (n1 - 1.0) AS v1,
             (sxx2 - sx2 * sx2 / n2) / (n2 - 1.0) AS v2
      FROM ab
    )
    SELECT round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1.0) + pow(v2 / n2, 2) / (n2 - 1.0)), 6) AS df_welch
    FROM d
    """,
)
def ttest_ind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t between returnflag groups A and R on l_quantity."""
    g = _grp_stats(spark, sf_dir)
    ab = g.agg(
        *[
            F.max(F.when(F.col("grp") == grp, F.col(c))).alias(f"{c}{i}")
            for i, grp in ((1, "A"), (2, "R"))
            for c in ("n", "sx", "sxx")
        ]
    )
    m1, m2 = F.col("sx1") / F.col("n1"), F.col("sx2") / F.col("n2")
    v1 = (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1")) / (F.col("n1") - 1.0)
    v2 = (F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2")) / (F.col("n2") - 1.0)
    d = ab.select(
        F.col("n1"), F.col("n2"), m1.alias("m1"), m2.alias("m2"),
        v1.alias("v1"), v2.alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se2)
    df = F.pow(se2, F.lit(2)) / (
        F.pow(F.col("v1") / F.col("n1"), F.lit(2)) / (F.col("n1") - 1.0)
        + F.pow(F.col("v2") / F.col("n2"), F.lit(2)) / (F.col("n2") - 1.0)
    )
    return d.select(F.round(t, 6).alias("t_stat"), F.round(df, 6).alias("df_welch"))


# --- T3: paired t (Statistical_test_iris_analysis.ipynb:107) ----------------
# "model A vs model B" paired scores stand-in: per-row pair (quantity,
# discounted quantity); d = quantity*discount is the paired difference.
_PAIRED_D = "l_quantity * l_discount - 1.0"


@query(
    "ttest_rel",
    oracle=f"""
    WITH s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             {N.sql_davg(_PAIRED_D)} AS md,
             {N.sql_dvar(_PAIRED_D)} AS vd
      FROM lineitem
    )
    SELECT round(md / sqrt(vd / n), 6) AS t_stat, CAST(n - 1 AS BIGINT) AS df
    FROM s
    """,
)
def ttest_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_quantity") * F.col("l_discount") - 1.0
    s = li.agg(
        F.count("*").cast("double").alias("n"),
        N.davg(d).alias("md"),
        N.dvar(d).alias("vd"),
    )
    return s.select(
        F.round(F.col("md") / F.sqrt(F.col("vd") / F.col("n")), 6).alias("t_stat"),
        (F.col("n") - 1).cast("bigint").alias("df"),
    )


# --- T4: Wilcoxon signed-rank (cross-validation/wine_analysis.py:151) -------
@query(
    "wilcoxon",
    oracle=f"""
    WITH d AS (
      SELECT {_PAIRED_D} AS d FROM lineitem WHERE {_PAIRED_D} <> 0.0
    ),
    r AS (
      SELECT d,
             rank() OVER (ORDER BY abs(d))
               + (count(*) OVER (PARTITION BY abs(d)) - 1) / 2.0 AS r_avg
      FROM d
    )
    SELECT sum(CASE WHEN d > 0 THEN r_avg ELSE 0 END) AS w_plus,
           sum(CASE WHEN d < 0 THEN r_avg ELSE 0 END) AS w_minus,
           least(sum(CASE WHEN d > 0 THEN r_avg ELSE 0 END),
                 sum(CASE WHEN d < 0 THEN r_avg ELSE 0 END)) AS w_stat,
           count(*) AS n_nonzero
    FROM r
    """,
)
def wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-rank sums with scipy's zero-discard and mean-rank ties.
    Ranks of |d| come from the bucketed ``mean_ranks`` operator; signed
    multiplicities per distinct d rejoin them on |d| — the fact never hits
    an unpartitioned window."""
    li = load_table(spark, sf_dir, "lineitem")
    d_expr = F.col("l_quantity") * F.col("l_discount") - 1.0
    d = li.select(d_expr.alias("d")).filter(F.col("d") != 0.0)
    vd = d.groupBy("d").agg(F.count("*").alias("c"))
    absr = mean_ranks(d.select(F.abs(F.col("d")).alias("ad")), "ad")
    j = vd.withColumn("ad", F.abs(F.col("d"))).join(
        absr.select("ad", "r_avg"), "ad"
    )
    w_plus = F.sum(
        F.when(F.col("d") > 0, F.col("c") * F.col("r_avg")).otherwise(0.0)
    )
    w_minus = F.sum(
        F.when(F.col("d") < 0, F.col("c") * F.col("r_avg")).otherwise(0.0)
    )
    return j.agg(
        w_plus.alias("w_plus"),
        w_minus.alias("w_minus"),
        F.least(w_plus, w_minus).alias("w_stat"),
        F.sum("c").alias("n_nonzero"),
    )


# --- T5: Mann-Whitney U (Statistical_test_iris_analysis.ipynb:75-76) --------
@query(
    "mannwhitney",
    oracle="""
    WITH two AS (
      SELECT l_returnflag AS grp, l_quantity AS x
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    r AS (
      SELECT grp,
             rank() OVER (ORDER BY x)
               + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS r_avg
      FROM two
    ),
    s AS (
      SELECT sum(CASE WHEN grp = 'A' THEN r_avg END) AS r1,
             CAST(sum(CAST(grp = 'A' AS BIGINT)) AS BIGINT) AS n1,
             CAST(sum(CAST(grp = 'R' AS BIGINT)) AS BIGINT) AS n2
      FROM r
    )
    SELECT r1 - n1 * (n1 + 1) / 2.0 AS u1,
           CAST(n1 AS DOUBLE) * n2 - (r1 - n1 * (n1 + 1) / 2.0) AS u2,
           least(r1 - n1 * (n1 + 1) / 2.0,
                 CAST(n1 AS DOUBLE) * n2 - (r1 - n1 * (n1 + 1) / 2.0)) AS u_stat,
           n1, n2
    FROM s
    """,
)
def mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum of group A from per-(value, group) counts × bucketed mean
    ranks — two map-side-combined aggregations, no row-level window."""
    li = load_table(spark, sf_dir, "lineitem")
    two = li.filter(F.col("l_returnflag").isin("A", "R")).select(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("x")
    )
    ranks = mean_ranks(two, "x")
    cg = two.groupBy("x", "grp").agg(F.count("*").alias("c"))
    j = cg.join(ranks.select("x", "r_avg"), "x")
    s = j.agg(
        F.sum(F.when(F.col("grp") == "A", F.col("c") * F.col("r_avg"))).alias("r1"),
        F.sum(F.when(F.col("grp") == "A", F.col("c"))).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("grp") == "R", F.col("c"))).cast("bigint").alias("n2"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    u2 = F.col("n1").cast("double") * F.col("n2") - u1
    return s.select(
        u1.alias("u1"), u2.alias("u2"), F.least(u1, u2).alias("u_stat"), "n1", "n2"
    )


# --- T6: one-way ANOVA F (teamProject/eda.ipynb:1407) -----------------------
@query(
    "anova_f",
    oracle=f"""
    WITH g AS ({_GRP_SQL}),
    tot AS (
      SELECT count(*) AS k, sum(n) AS nn, sum(sx) AS s_all,
             sum(sxx) AS ss_all, sum(sx * sx / n) AS s_grp
      FROM g
    )
    SELECT round(((s_grp - s_all * s_all / nn) / (k - 1.0))
                 / ((ss_all - s_grp) / (nn - k)), 6) AS f_stat,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(nn - k AS BIGINT) AS df_within
    FROM tot
    """,
)
def anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between/within sum-of-squares from per-group decimal sums — a two-level
    aggregation, no data pass beyond the group stats."""
    g = _grp_stats(spark, sf_dir)
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("sx").alias("s_all"),
        F.sum("sxx").alias("ss_all"),
        F.sum(F.col("sx") * F.col("sx") / F.col("n")).alias("s_grp"),
    )
    ssb = F.col("s_grp") - F.col("s_all") * F.col("s_all") / F.col("nn")
    ssw = F.col("ss_all") - F.col("s_grp")
    f_stat = (ssb / (F.col("k") - 1.0)) / (ssw / (F.col("nn") - F.col("k")))
    return tot.select(
        F.round(f_stat, 6).alias("f_stat"),
        (F.col("k") - 1).cast("bigint").alias("df_between"),
        (F.col("nn") - F.col("k")).cast("bigint").alias("df_within"),
    )


# --- T7: Kruskal-Wallis H (Statistical_test_iris_analysis.ipynb:145) --------
@query(
    "kruskal",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS grp, l_quantity AS x,
             rank() OVER (ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS r_avg
      FROM lineitem
    ),
    gs AS (
      SELECT grp, sum(r_avg) AS rg, CAST(count(*) AS DOUBLE) AS ng
      FROM r GROUP BY grp
    ),
    ties AS (
      SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie_term
      FROM (SELECT count(*) AS t FROM lineitem GROUP BY l_quantity)
    ),
    tot AS (
      SELECT sum(ng) AS nn, sum(rg * rg / ng) AS s_rg FROM gs
    )
    SELECT round((12.0 / (nn * (nn + 1.0)) * s_rg - 3.0 * (nn + 1.0))
                 / (1.0 - tie_term / (nn * nn * nn - nn)), 6) AS h_stat,
           CAST((SELECT count(*) FROM gs) - 1 AS BIGINT) AS df
    FROM tot CROSS JOIN ties
    """,
)
def kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H with scipy's tie correction; rank sums are exact half-integers.
    Per-group rank sums = Σ count(value, group)·mean_rank(value); the tie
    term reuses the same per-value counts — both from bucketed ``mean_ranks``,
    no row-level window."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("x"))
    ranks = mean_ranks(x, "x")
    cg = x.groupBy("x", "grp").agg(F.count("*").alias("c"))
    gs = (
        cg.join(ranks.select("x", "r_avg"), "x")
        .groupBy("grp")
        .agg(
            F.sum(F.col("c") * F.col("r_avg")).alias("rg"),
            F.sum("c").cast("double").alias("ng"),
        )
    )
    ties = ranks.agg(
        F.sum(
            F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_term")
    )
    tot = gs.agg(
        F.sum("ng").alias("nn"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("s_rg"),
        F.count("*").alias("k"),
    )
    j = tot.crossJoin(ties)
    h_raw = 12.0 / (F.col("nn") * (F.col("nn") + 1.0)) * F.col("s_rg") - 3.0 * (
        F.col("nn") + 1.0
    )
    corr = 1.0 - F.col("tie_term") / (
        F.col("nn") * F.col("nn") * F.col("nn") - F.col("nn")
    )
    return j.select(
        F.round(h_raw / corr, 6).alias("h_stat"),
        (F.col("k") - 1).cast("bigint").alias("df"),
    )


# --- T8: chi-squared contingency (train_test_comparison.py:53-56) -----------
@query(
    "chi2",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS r, l_linestatus AS c, CAST(count(*) AS DOUBLE) AS o
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ),
    tot AS (SELECT sum(o) AS nn FROM cells),
    rows_ AS (SELECT r, sum(o) AS row_tot FROM cells GROUP BY r),
    cols_ AS (SELECT c, sum(o) AS col_tot FROM cells GROUP BY c),
    terms AS (
      SELECT round(pow(cells.o - rows_.row_tot * cols_.col_tot / tot.nn, 2)
                   / (rows_.row_tot * cols_.col_tot / tot.nn), 8) AS term
      FROM cells JOIN rows_ ON cells.r = rows_.r
                 JOIN cols_ ON cells.c = cols_.c
                 CROSS JOIN tot
    )
    SELECT round(CAST(sum(CAST(term AS DECIMAL(25,8))) AS DOUBLE), 6) AS chi2_stat,
           (SELECT CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT)
            FROM cells) AS df
    FROM terms
    """,
)
def chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² over the returnflag×linestatus contingency table; per-cell terms
    rounded then decimal-summed for order independence."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("r"), F.col("l_linestatus").alias("c")
    ).agg(F.count("*").cast("double").alias("o"))
    tot = cells.agg(F.sum("o").alias("nn"))
    rows_ = cells.groupBy("r").agg(F.sum("o").alias("row_tot"))
    cols_ = cells.groupBy("c").agg(F.sum("o").alias("col_tot"))
    j = cells.join(rows_, "r").join(cols_, "c").crossJoin(tot)
    e = F.col("row_tot") * F.col("col_tot") / F.col("nn")
    terms = j.select(
        F.round(F.pow(F.col("o") - e, F.lit(2)) / e, 8).alias("term"),
        "r",
        "c",
    )
    dfree = cells.agg(
        ((F.countDistinct("r") - 1) * (F.countDistinct("c") - 1))
        .cast("bigint")
        .alias("df")
    )
    stat = terms.agg(
        F.round(F.sum(F.col("term").cast("decimal(25,8)")).cast("double"), 6).alias(
            "chi2_stat"
        )
    )
    return stat.crossJoin(dfree)


# --- T9: Pearson r / Spearman ρ + t transform (wine…11….ipynb:6393) ---------
@query(
    "corr_tests",
    oracle=f"""
    WITH ranked AS (
      SELECT rank() OVER (ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry
      FROM lineitem
    ),
    p AS (SELECT {N.sql_dcorr('l_quantity', 'l_extendedprice')} AS r_pearson,
                 CAST(count(*) AS DOUBLE) AS n
          FROM lineitem),
    s AS (SELECT {N.sql_dcorr('rx', 'ry')} AS rho_spearman FROM ranked)
    SELECT p.r_pearson, s.rho_spearman,
           round(p.r_pearson * sqrt((p.n - 2.0) / (1.0 - p.r_pearson * p.r_pearson)), 6) AS t_pearson,
           CAST(p.n AS BIGINT) AS n
    FROM p CROSS JOIN s
    """,
)
def corr_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson on values; Spearman = Pearson on mean ranks (scipy-equivalent
    tie handling); t transform of r for the p-value lookup. Each column's
    rank map comes from bucketed ``mean_ranks`` and is equi-joined back to
    the fact — two ordinary shuffle joins instead of two total sorts."""
    li = load_table(spark, sf_dir, "lineitem")
    rxm = mean_ranks(li, "l_quantity").select(
        "l_quantity", F.col("r_avg").alias("rx")
    )
    rym = mean_ranks(li, "l_extendedprice").select(
        "l_extendedprice", F.col("r_avg").alias("ry")
    )
    ranked = (
        li.select("l_quantity", "l_extendedprice")
        .join(rxm, "l_quantity")
        .join(rym, "l_extendedprice")
        .select("rx", "ry")
    )
    p = li.agg(
        N.dcorr("l_quantity", "l_extendedprice").alias("r_pearson"),
        F.count("*").cast("double").alias("n"),
    )
    s = ranked.agg(N.dcorr("rx", "ry").alias("rho_spearman"))
    j = p.crossJoin(s)
    t = F.col("r_pearson") * F.sqrt(
        (F.col("n") - 2.0) / (1.0 - F.col("r_pearson") * F.col("r_pearson"))
    )
    return j.select(
        "r_pearson",
        "rho_spearman",
        F.round(t, 6).alias("t_pearson"),
        F.col("n").cast("bigint").alias("n"),
    )


# --- T10†: two-sample Kolmogorov-Smirnov (train/test shift audit family) -----
@query(
    "ks_2samp",
    oracle="""
    WITH s AS (
      SELECT l_extendedprice AS x,
             CAST(l_linestatus = 'O' AS BIGINT) AS g1,
             CAST(l_linestatus = 'F' AS BIGINT) AS g2
      FROM lineitem
    ),
    c AS (SELECT x, sum(g1) AS c1, sum(g2) AS c2 FROM s GROUP BY x),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
    cum AS (
      SELECT x,
             sum(c1) OVER (ORDER BY x) AS cum1,
             sum(c2) OVER (ORDER BY x) AS cum2
      FROM c
    )
    SELECT n1, n2,
           CAST(max(abs(CAST(n2 AS DECIMAL(38,0)) * cum1
                        - CAST(n1 AS DECIMAL(38,0)) * cum2)) AS DOUBLE) AS d_num,
           CAST(max(abs(CAST(n2 AS DECIMAL(38,0)) * cum1
                        - CAST(n1 AS DECIMAL(38,0)) * cum2)) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
    FROM cum CROSS JOIN n GROUP BY n1, n2
    """,
)
def ks_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS D between the 'O' and 'F' linestatus populations of
    l_extendedprice — the continuous-variable member of the reference's
    train/test shift-audit family (`final-assignment/docs/
    train_test_comparison_summary.md` §2-4 runs t-tests/χ² per variable).

    D = max_x |ECDF1(x) − ECDF2(x)| is computed EXACTLY: the max runs over
    the integer quantity |n2·cum1(x) − n1·cum2(x)| (DECIMAL — no float
    ordering ambiguity, overflow-safe past bigint scale), divided once at
    the end (IEEE). Same two-phase shape as rank_ops: distinct-value
    compression → range-bucket histogram offsets (the only unpartitioned
    window sees ≤1024 bucket rows) → bucket-partitioned in-bucket prefix
    sums. The driver-side p-value is the standard KS asymptotic series
    over sqrt(n1·n2/(n1+n2))·D (not emitted: statistic-only, like the
    other tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    c = (
        li.select(
            F.col("l_extendedprice").alias("x"),
            (F.col("l_linestatus") == "O").cast("bigint").alias("g1"),
            (F.col("l_linestatus") == "F").cast("bigint").alias("g2"),
        )
        .groupBy("x")
        .agg(F.sum("g1").alias("c1"), F.sum("g2").alias("c2"))
    )

    nbuckets = 1024
    mm = c.agg(
        F.min("x").cast("double").alias("mn"), F.max("x").cast("double").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / float(nbuckets)
    bounds = mm.select(
        "mn", F.when(width == 0.0, F.lit(1.0)).otherwise(width).alias("w")
    )
    cb = c.crossJoin(F.broadcast(bounds)).select(
        "x",
        "c1",
        "c2",
        F.least(
            F.floor((F.col("x").cast("double") - F.col("mn")) / F.col("w")).cast("int"),
            F.lit(nbuckets - 1),
        ).alias("b"),
    )
    from pyspark.sql import Window

    from ..operators.bounded_seq import exclusive_prefix_sums

    hist = cb.groupBy("b").agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
    offsets = (
        exclusive_prefix_sums(hist, "b", ["t1", "t2"])
        .withColumnRenamed("prev_t1", "prev1")
        .withColumnRenamed("prev_t2", "prev2")
    )
    wv = Window.partitionBy("b").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cb.join(F.broadcast(offsets), "b").select(
        (F.col("prev1") + F.sum("c1").over(wv)).alias("cum1"),
        (F.col("prev2") + F.sum("c2").over(wv)).alias("cum2"),
    )
    n = c.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    diff = F.abs(
        F.col("n2").cast("decimal(38,0)") * F.col("cum1")
        - F.col("n1").cast("decimal(38,0)") * F.col("cum2")
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(F.max(diff).cast("double").alias("d_num"))
        .select(
            "n1",
            "n2",
            "d_num",
            (
                F.col("d_num")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_d"),
        )
    )


# --- per-group OLS fit from exact sufficient statistics ----------------------
@query(
    "linreg_ols_group",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag AS grp, CAST(count(*) AS DOUBLE) AS n,
             {N.sql_dsum('l_quantity')} AS sx,
             {N.sql_dsum('l_extendedprice')} AS sy,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(25,6))
                           * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS syy,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT grp, CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def linreg_ols_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-l_returnflag OLS of l_extendedprice on l_quantity, closed-form
    from decimal-exact sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy):
    slope = (nΣxy − ΣxΣy)/(nΣx² − Σx²), intercept = (Σy − slope·Σx)/n,
    r² = slope-covariance ratio squared. One map-side-combined shuffle on
    the group key; the double arithmetic after the exact sums is the same
    expression tree on both engines, then round(·, 6) (the repo's
    _STAT_SCALE convention). Scales like any hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(25,6)")
    y = F.col("l_extendedprice").cast("decimal(25,6)")
    s = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(38,10)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,10)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(38,10)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return s.select(
        "grp",
        n.cast("bigint").alias("n_rows"),
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round((sy - (cov_n / var_x) * sx) / n, 6).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    )


# --- 3-sigma anomaly flags in pure integer arithmetic ------------------------
@query(
    "anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sv,
             sum(CAST(CAST(round(value * 1000000) AS BIGINT) AS DECIMAL(38,0))
                 * CAST(round(value * 1000000) AS BIGINT)) AS svv
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, min(s.n) AS n,
           CAST(sum(CAST(
             CAST(s.n - 1 AS DECIMAL(38,0))
               * (CAST(s.n AS DECIMAL(38,0))
                  * CAST(round(e.value * 1000000) AS BIGINT) - s.sv)
               * (CAST(s.n AS DECIMAL(38,0))
                  * CAST(round(e.value * 1000000) AS BIGINT) - s.sv)
             > 9 * CAST(s.n AS DECIMAL(38,0))
                 * (CAST(s.n AS DECIMAL(38,0)) * s.svv
                    - CAST(s.sv AS DECIMAL(38,0)) * s.sv)
           AS BIGINT)) AS BIGINT) AS n_anomalies
    FROM events e JOIN s ON e.event_type = s.event_type
    GROUP BY e.event_type
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier flags per event type with ZERO floating point in the
    decision: |v - mean| > 3*std is algebraically cleared of divisions and
    square roots — (n-1)(n*v - S)^2 > 9n(n*SS - S^2) over integer-scaled
    values in DECIMAL(38,0) — so the flag can never flip on a rounding tie
    between engines or cluster layouts (IEEE sqrt near the boundary is
    exactly the kind of nondeterminism that makes alert counts drift
    between reruns at scale). Two passes: a per-type sufficient-stats
    aggregate (tiny, broadcast back) and one map-side flag per row."""
    ev = load_table(spark, sf_dir, "events")
    vi = N.fround_int(F.col("value") * 1000000)
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vi).alias("sv"),
        F.sum(vi.cast("decimal(38,0)") * vi).alias("svv"),
    )
    joined = ev.select("event_type", vi.alias("v")).join(
        F.broadcast(s), "event_type"
    )
    nd = F.col("n").cast("decimal(38,0)")
    dev = nd * F.col("v") - F.col("sv")
    lhs = (nd - 1) * dev * dev
    rhs = 9 * nd * (nd * F.col("svv") - F.col("sv").cast("decimal(38,0)") * F.col("sv"))
    return joined.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.sum((lhs > rhs).cast("bigint")).alias("n_anomalies"),
    )


# --- two-proportion z-test (A/B experiment readout) --------------------------
@query(
    "ab_test_ztest",
    oracle="""
    WITH conv AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS grp,
             CAST(max(CAST(event_type = 'purchase' AND value > 80 AS INT))
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT)
               AS x_a,
             CAST(sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT)
               AS x_b
      FROM conv
    )
    SELECT n_a, n_b, x_a, x_b,
           round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
           round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
           round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat,
           CAST(abs((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b))) > 1.959964 AS INT)
             AS significant_05
    FROM g
    """,
)
def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test — the A/B experiment readout
    (statsmodels proportions_ztest semantics): does the purchase-conversion
    rate differ between the user_id-parity arms? One per-user agg (did the
    user ever purchase), one four-counter rollup, scalar arithmetic — two
    shuffles total, both map-side combined; z is pure double arithmetic
    over exact integer counts, rounded at 6dp like every stats_tests
    statistic."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.expr("CAST(user_id % 2 AS INT) AS grp"),
        F.expr(
            "CAST(max(CAST(event_type = 'purchase' AND value > 80 AS INT))"
            " AS BIGINT) AS converted"
        ),
    )
    g = conv.agg(
        F.expr("CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a"),
        F.expr("CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b"),
        F.expr(
            "CAST(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT)"
            " AS x_a"
        ),
        F.expr(
            "CAST(sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT)"
            " AS x_b"
        ),
    )
    return g.selectExpr(
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        "round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a",
        "round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b",
        "round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)"
        " / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))"
        "        * (1.0D - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))"
        "        * (1.0D / n_a + 1.0D / n_b)), 6) AS z_stat",
        "CAST(abs((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)"
        " / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))"
        "        * (1.0D - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))"
        "        * (1.0D / n_a + 1.0D / n_b))) > 1.959964D AS INT)"
        " AS significant_05",
    )


# --- robust (MAD) outlier audit ----------------------------------------------
@query(
    "anomaly_mad",
    oracle="""
    WITH m AS (SELECT quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem),
    d AS (
      SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS ad
      FROM lineitem l CROSS JOIN m
    ),
    md AS (SELECT quantile_cont(ad, 0.5) AS mad FROM d)
    SELECT d.l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(d.ad > 3.5 * md.mad / 0.6745 AS INT)) AS BIGINT)
             AS n_outliers,
           CAST(sum(CAST(d.ad > 3.5 * md.mad / 0.6745 AS INT)) * 1000000
                // count(*) AS BIGINT) AS outlier_ppm
    FROM d CROSS JOIN md
    GROUP BY d.l_returnflag
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit: modified z-score |x - med| / (MAD / 0.6745) >
    3.5 (Iglewicz-Hoaglin), immune to the heavy tails that inflate plain
    z-scores (anomaly_zscore's sigma triples on contaminated data; the
    median/MAD pair doesn't move).

    Both medians are EXACT interpolated percentiles via the two-phase
    bucketed operator (operators/percentile_ops.py — no global sort, no
    value buffer); the deviation median runs on the |x - med| projection
    of a second scan with the first median broadcast as a literal row.
    The final pass counts threshold crossings per group map-side. Three
    column-pruned scans total, every shuffle histogram-sized."""
    from ..operators.percentile_ops import bucketed_exact_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    px = li.selectExpr("'x' AS col_name", "l_extendedprice AS x")
    # each percentile op is multi-phase; feeding one op's OUTPUT subtree
    # into the next multiplies jobs (every MAD phase re-executes the whole
    # median pipeline — measured ~10x wall). The medians are scalars: pin
    # them as literals between phases, exactly like describe's pass-1.
    # repr() round-trips the double bit-exactly through the SQL parser.
    med_val = bucketed_exact_percentiles(px, [0.5]).collect()[0]["p_0"]
    d = li.selectExpr(
        "l_returnflag", f"abs(l_extendedprice - {med_val!r}D) AS ad"
    )
    mad_val = bucketed_exact_percentiles(
        d.selectExpr("'ad' AS col_name", "ad AS x"), [0.5]
    ).collect()[0]["p_0"]
    return (
        d.selectExpr("l_returnflag", "ad", f"{mad_val!r}D AS mad")
        .groupBy("l_returnflag")
        .agg(
            F.expr("count(*) AS n"),
            F.expr(
                "CAST(sum(CAST(ad > 3.5D * mad / 0.6745D AS INT)) AS BIGINT)"
                " AS n_outliers"
            ),
            F.expr(
                "CAST(sum(CAST(ad > 3.5D * mad / 0.6745D AS INT)) * 1000000"
                " div count(*) AS BIGINT) AS outlier_ppm"
            ),
        )
    )


# --- 2-feature ridge regression via the normal equations ---------------------
_RIDGE_L = 10.0

# Cramer's-rule solve of (X'X + lambda*diag(0,1,1)) beta = X'y for
# X = [1, x1, x2], written once in engine-portable SQL over the named
# sufficient statistics (n, s1, s2, s11, s22, s12, sy, s1y, s2y) so the
# Spark selectExpr and the DuckDB oracle evaluate the IDENTICAL double
# expression tree (the exactness convention: decimal sums, then one shared
# arithmetic tree, then round 6).
_RIDGE_DET = (
    f"(n * ((s11 + {_RIDGE_L}) * (s22 + {_RIDGE_L}) - s12 * s12)"
    f" - s1 * (s1 * (s22 + {_RIDGE_L}) - s12 * s2)"
    f" + s2 * (s1 * s12 - (s11 + {_RIDGE_L}) * s2))"
)
_RIDGE_D0 = (
    f"(sy * ((s11 + {_RIDGE_L}) * (s22 + {_RIDGE_L}) - s12 * s12)"
    f" - s1 * (s1y * (s22 + {_RIDGE_L}) - s12 * s2y)"
    f" + s2 * (s1y * s12 - (s11 + {_RIDGE_L}) * s2y))"
)
_RIDGE_D1 = (
    f"(n * (s1y * (s22 + {_RIDGE_L}) - s12 * s2y)"
    f" - sy * (s1 * (s22 + {_RIDGE_L}) - s12 * s2)"
    f" + s2 * (s1 * s2y - s1y * s2))"
)
_RIDGE_D2 = (
    f"(n * ((s11 + {_RIDGE_L}) * s2y - s1y * s12)"
    f" - s1 * (s1 * s2y - s1y * s2)"
    f" + sy * (s1 * s12 - (s11 + {_RIDGE_L}) * s2))"
)
_RIDGE_OUT = [
    "CAST(n AS BIGINT) AS n_rows",
    f"round({_RIDGE_D0} / {_RIDGE_DET}, 6) AS beta0",
    f"round({_RIDGE_D1} / {_RIDGE_DET}, 6) AS beta1",
    f"round({_RIDGE_D2} / {_RIDGE_DET}, 6) AS beta2",
]

_RIDGE_STATS_SQL = """
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) AS s2,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS s11,
             CAST(sum(CAST(CAST(l_discount AS DECIMAL(25,6))
                           * CAST(l_discount AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS s22,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_discount AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS s12,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS s1y,
             CAST(sum(CAST(CAST(l_discount AS DECIMAL(25,6))
                           * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS s2y
      FROM lineitem
"""


@query(
    "linreg_ridge_2f",
    oracle=f"""
    WITH s AS ({_RIDGE_STATS_SQL})
    SELECT {', '.join(_RIDGE_OUT)} FROM s
    """,
)
def linreg_ridge_2f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ridge regression (intercept unpenalized, lambda =
    {_RIDGE_L}) of l_extendedprice on (l_quantity, l_discount), solved in
    closed form: one map-side-combined pass collects the 9 decimal-exact
    sufficient statistics, then Cramer's rule on the 3x3 regularized
    normal equations runs as scalar expression arithmetic — the SAME SQL
    fragment is evaluated by both engines, so every double operation is
    identical. The 100 TB story of linear models: sufficient statistics
    shrink the fact to one row; no gradient iterations, no driver data."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
        F.expr("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1"),
        F.expr("CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) AS s2"),
        F.expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy"),
        F.expr(
            "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))"
            " * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            " AS DOUBLE) AS s11"
        ),
        F.expr(
            "CAST(sum(CAST(CAST(l_discount AS DECIMAL(25,6))"
            " * CAST(l_discount AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            " AS DOUBLE) AS s22"
        ),
        F.expr(
            "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))"
            " * CAST(l_discount AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            " AS DOUBLE) AS s12"
        ),
        F.expr(
            "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))"
            " * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            " AS DOUBLE) AS s1y"
        ),
        F.expr(
            "CAST(sum(CAST(CAST(l_discount AS DECIMAL(25,6))"
            " * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            " AS DOUBLE) AS s2y"
        ),
    )
    return s.selectExpr(*_RIDGE_OUT)


# --- Wilson confidence interval on a proportion ------------------------------
@query(
    "proportion_wilson_ci",
    oracle="""
    WITH c AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(event_type = 'purchase' AND value > 80 AS INT))
                  AS DOUBLE) AS x
      FROM events
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
           round(x / n, 6) AS p_hat,
           round((x / n + 1.959964 * 1.959964 / (2.0 * n)
                  - 1.959964 * sqrt((x / n) * (1.0 - x / n) / n
                                    + 1.959964 * 1.959964 / (4.0 * n * n)))
                 / (1.0 + 1.959964 * 1.959964 / n), 6) AS ci_lo,
           round((x / n + 1.959964 * 1.959964 / (2.0 * n)
                  + 1.959964 * sqrt((x / n) * (1.0 - x / n) / n
                                    + 1.959964 * 1.959964 / (4.0 * n * n)))
                 / (1.0 + 1.959964 * 1.959964 / n), 6) AS ci_hi
    FROM c
    """,
)
def proportion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% confidence interval on the high-value purchase rate —
    the proportion CI that behaves at extreme rates where the normal
    (Wald) interval collapses (statsmodels proportion_confint
    method='wilson'). One counting aggregate; the interval is a single
    shared double tree over exact counts, rounded 6dp."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.agg(
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
        F.expr(
            "CAST(sum(CAST(event_type = 'purchase' AND value > 80 AS INT))"
            " AS DOUBLE) AS x"
        ),
    )
    return c.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(x AS BIGINT) AS x",
        "round(x / n, 6) AS p_hat",
        "round((x / n + 1.959964D * 1.959964D / (2.0D * n)"
        " - 1.959964D * sqrt((x / n) * (1.0D - x / n) / n"
        " + 1.959964D * 1.959964D / (4.0D * n * n)))"
        " / (1.0D + 1.959964D * 1.959964D / n), 6) AS ci_lo",
        "round((x / n + 1.959964D * 1.959964D / (2.0D * n)"
        " + 1.959964D * sqrt((x / n) * (1.0D - x / n) / n"
        " + 1.959964D * 1.959964D / (4.0D * n * n)))"
        " / (1.0D + 1.959964D * 1.959964D / n), 6) AS ci_hi",
    )


# --- two-way ANOVA with interaction ------------------------------------------
_AOV2_CELL_SQL = """
  SELECT l_returnflag AS a, l_linestatus AS b,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                       * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))
              AS DOUBLE) AS ss
  FROM lineitem GROUP BY a, b
"""


@query(
    "anova_two_way",
    oracle=f"""
    WITH cell AS ({_AOV2_CELL_SQL}),
    tot AS (
      SELECT sum(n) AS n, sum(s) AS s, sum(ss) AS ss,
             CAST(count(*) AS DOUBLE) AS n_cells
      FROM cell
    ),
    ma AS (SELECT a, sum(n) AS n, sum(s) AS s FROM cell GROUP BY a),
    mb AS (SELECT b, sum(n) AS n, sum(s) AS s FROM cell GROUP BY b),
    comp AS (
      SELECT (SELECT sum(s * s / n) FROM ma) - t.s * t.s / t.n AS ss_a,
             (SELECT sum(s * s / n) FROM mb) - t.s * t.s / t.n AS ss_b,
             (SELECT sum(s * s / n) FROM cell) - t.s * t.s / t.n AS ss_cells,
             t.ss - (SELECT sum(s * s / n) FROM cell) AS ss_within,
             (SELECT CAST(count(*) AS DOUBLE) FROM ma) - 1.0 AS df_a,
             (SELECT CAST(count(*) AS DOUBLE) FROM mb) - 1.0 AS df_b,
             t.n - t.n_cells AS df_w,
             t.n_cells - (SELECT CAST(count(*) AS DOUBLE) FROM ma)
               - (SELECT CAST(count(*) AS DOUBLE) FROM mb) + 1.0 AS df_ab
      FROM tot t
    )
    SELECT round((ss_a / df_a) / (ss_within / df_w), 6) AS f_a,
           round((ss_b / df_b) / (ss_within / df_w), 6) AS f_b,
           round(((ss_cells - ss_a - ss_b) / df_ab)
                 / (ss_within / df_w), 6) AS f_interaction,
           CAST(df_w AS BIGINT) AS df_within
    FROM comp
    """,
)
def anova_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of l_quantity on (returnflag x linestatus) with the
    interaction term — anova_f's factorial extension (statsmodels
    anova_lm type-1 on a balanced-ish design): F for each main effect
    and for the interaction, from cell sufficient statistics only.

    Distribution: ONE map-side cell aggregate (|A|x|B| rows); every sum
    of squares is marginal arithmetic over that tiny table (sum(s²/n)
    identities — no residual pass over the fact); decimal-exact sums,
    one shared double tree, 6dp rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = li.groupBy(
        F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
    ).agg(
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
        F.expr("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s"),
        F.expr(
            "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))"
            " * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            " AS DOUBLE) AS ss"
        ),
    )
    tot = cell.agg(
        F.expr("sum(n) AS n"),
        F.expr("sum(s) AS s"),
        F.expr("sum(ss) AS ss"),
        F.expr("CAST(count(*) AS DOUBLE) AS n_cells"),
    )
    ma = cell.groupBy("a").agg(F.expr("sum(n) AS n"), F.expr("sum(s) AS s"))
    mb = cell.groupBy("b").agg(F.expr("sum(n) AS n"), F.expr("sum(s) AS s"))
    sa = ma.agg(
        F.expr("sum(s * s / n) AS qa"), F.expr("CAST(count(*) AS DOUBLE) AS ka")
    )
    sb = mb.agg(
        F.expr("sum(s * s / n) AS qb"), F.expr("CAST(count(*) AS DOUBLE) AS kb")
    )
    sc = cell.agg(F.expr("sum(s * s / n) AS qc"))
    comp = (
        tot.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(sc))
        .selectExpr(
            "qa - s * s / n AS ss_a",
            "qb - s * s / n AS ss_b",
            "qc - s * s / n AS ss_cells",
            "ss - qc AS ss_within",
            "ka - 1.0D AS df_a",
            "kb - 1.0D AS df_b",
            "n - n_cells AS df_w",
            "n_cells - ka - kb + 1.0D AS df_ab",
        )
    )
    return comp.selectExpr(
        "round((ss_a / df_a) / (ss_within / df_w), 6) AS f_a",
        "round((ss_b / df_b) / (ss_within / df_w), 6) AS f_b",
        "round(((ss_cells - ss_a - ss_b) / df_ab)"
        " / (ss_within / df_w), 6) AS f_interaction",
        "CAST(df_w AS BIGINT) AS df_within",
    )


# --- normality check: Jarque-Bera per group ----------------------------------
# The assumption gate the reference's t-test/ANOVA workflow
# (Statistical_test_iris_analysis.ipynb:37-160) runs first in scipy
# (`stats.jarque_bera`): JB = n/6 * (S^2 + (K-3)^2 / 4) from the 3rd/4th
# standardized moments. All four raw power sums are exact decimal aggregates
# (quantity is 2dp-bounded, so x^2/x^3/x^4 fit lossless in the declared
# scales on BOTH engines); every derived moment is row-local per group, so
# the double expression tree is identical — m2^1.5 is written m2*sqrt(m2)
# because sqrt is IEEE-correctly-rounded on both engines while pow is not.
_JB_SUMS = """
  SELECT l_returnflag AS grp, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4)))
              AS DOUBLE) AS s2,
         CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4))
                       * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,6)))
              AS DOUBLE) AS s3,
         CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4))
                       * CAST(CAST(l_quantity AS DECIMAL(12,2))
                              * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4))
                       AS DECIMAL(30,8)))
              AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag
"""


@query(
    "normality_jarque_bera",
    oracle=f"""
    WITH g AS ({_JB_SUMS}),
    m AS (
      SELECT grp, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3.0 * (s1 / n) * (s2 / n)
                    + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4.0 * (s1 / n) * (s3 / n)
                    + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM g
    ),
    sk AS (
      SELECT grp, n, m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) - 3.0 AS kurt_x
      FROM m
    )
    SELECT grp, CAST(n AS BIGINT) AS n, round(skew, 6) AS skewness,
           round(kurt_x, 6) AS kurtosis_excess,
           round(n / 6.0 * (skew * skew + kurt_x * kurt_x / 4.0), 6) AS jb_stat
    FROM sk ORDER BY grp
    """,
)
def normality_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic per returnflag group on l_quantity.

    One map-side-combined groupBy carrying four exact decimal power sums —
    the same single-pass shape at any scale; no second data pass, no window.
    """
    li = load_table(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast("decimal(12,2)")
    x2 = (xd * xd).cast("decimal(18,4)")
    x3 = (x2 * xd).cast("decimal(24,6)")
    x4 = (x2 * x2).cast("decimal(30,8)")
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xd).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(x3).cast("double").alias("s3"),
        F.sum(x4).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - F.lit(3.0) * mu * (s2 / n) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / n
        - F.lit(4.0) * mu * (s3 / n)
        + F.lit(6.0) * mu * mu * (s2 / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    m = g.select("grp", "n", m2.alias("m2"), m3.alias("m3"), m4.alias("m4"))
    skew = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    kurt_x = F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0
    sk = m.select("grp", "n", skew.alias("skew"), kurt_x.alias("kurt_x"))
    jb = F.col("n") / 6.0 * (
        F.col("skew") * F.col("skew") + F.col("kurt_x") * F.col("kurt_x") / 4.0
    )
    return sk.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.round("skew", 6).alias("skewness"),
        F.round("kurt_x", 6).alias("kurtosis_excess"),
        F.round(jb, 6).alias("jb_stat"),
    ).orderBy("grp")


# --- equal-variance check: Brown-Forsythe (median-centered Levene) -----------
# scipy.stats.levene(center='median') — the homoscedasticity gate before the
# pooled-variance tests above. W is a one-way ANOVA F on z = |x - median_g|:
# group medians come from the bounded per-(group, value) histogram exactly as
# groupby_median (windows PARTITIONED by group — never unpartitioned), and
# because l_quantity is integer-valued the interpolated medians are
# half-integers, making every z*c / z*z*c product an exact quarter-integer:
# the double sums are order-independent bit-exact, like the rank sums.
@query(
    "levene_brown_forsythe",
    oracle="""
    WITH cnts AS (
      SELECT l_returnflag AS grp, l_quantity AS x, count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    marks AS (
      SELECT grp, x, c,
             sum(c) OVER (PARTITION BY grp ORDER BY x) AS cum,
             sum(c) OVER (PARTITION BY grp ORDER BY x) - c AS prev,
             sum(c) OVER (PARTITION BY grp) AS ntot
      FROM cnts
    ),
    med AS (
      SELECT grp,
             max(CASE WHEN prev < floor((ntot - 1) * 0.5 + 1)
                       AND cum >= floor((ntot - 1) * 0.5 + 1) THEN x END)
             + max((ntot - 1) * 0.5 + 1 - floor((ntot - 1) * 0.5 + 1))
               * (max(CASE WHEN prev < ceil((ntot - 1) * 0.5 + 1)
                            AND cum >= ceil((ntot - 1) * 0.5 + 1) THEN x END)
                  - max(CASE WHEN prev < floor((ntot - 1) * 0.5 + 1)
                             AND cum >= floor((ntot - 1) * 0.5 + 1) THEN x END))
               AS med
      FROM marks GROUP BY grp
    ),
    g AS (
      SELECT c.grp, CAST(sum(c.c) AS DOUBLE) AS n,
             sum(abs(c.x - m.med) * c.c) AS sz,
             sum(abs(c.x - m.med) * abs(c.x - m.med) * c.c) AS szz
      FROM cnts c JOIN med m ON c.grp = m.grp GROUP BY c.grp
    ),
    tot AS (
      SELECT count(*) AS k, sum(n) AS nn, sum(sz) AS s_all,
             sum(szz) AS ss_all, sum(sz * sz / n) AS s_grp
      FROM g
    )
    SELECT round(((s_grp - s_all * s_all / nn) / (k - 1.0))
                 / ((ss_all - s_grp) / (nn - k)), 6) AS w_stat,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(nn - k AS BIGINT) AS df_within
    FROM tot
    """,
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe W for equal variance of l_quantity across returnflag
    groups. Data passes: ONE distinct-value histogram groupBy; everything
    after runs on the ≤(groups × 50)-row histogram."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("x")
    ).agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("grp")
    marks = cnts.select(
        "grp",
        "x",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        (F.sum("c").over(wcum) - F.col("c")).alias("prev"),
        F.sum("c").over(wtot).alias("ntot"),
    )
    r = (F.col("ntot") - 1) * 0.5 + 1
    vlo = F.max(
        F.when((F.col("prev") < F.floor(r)) & (F.col("cum") >= F.floor(r)), F.col("x"))
    )
    vhi = F.max(
        F.when((F.col("prev") < F.ceil(r)) & (F.col("cum") >= F.ceil(r)), F.col("x"))
    )
    med = marks.groupBy("grp").agg(
        (vlo + F.max(r - F.floor(r)) * (vhi - vlo)).alias("med")
    )
    z = F.abs(F.col("x") - F.col("med"))
    g = (
        cnts.join(F.broadcast(med), "grp")
        .groupBy("grp")
        .agg(
            F.sum("c").cast("double").alias("n"),
            F.sum(z * F.col("c")).alias("sz"),
            F.sum(z * z * F.col("c")).alias("szz"),
        )
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("sz").alias("s_all"),
        F.sum("szz").alias("ss_all"),
        F.sum(F.col("sz") * F.col("sz") / F.col("n")).alias("s_grp"),
    )
    ssb = F.col("s_grp") - F.col("s_all") * F.col("s_all") / F.col("nn")
    ssw = F.col("ss_all") - F.col("s_grp")
    w = (ssb / (F.col("k") - 1.0)) / (ssw / (F.col("nn") - F.col("k")))
    return tot.select(
        F.round(w, 6).alias("w_stat"),
        (F.col("k") - 1).cast("bigint").alias("df_between"),
        (F.col("nn") - F.col("k")).cast("bigint").alias("df_within"),
    )


# --- multiple-testing correction: Benjamini-Hochberg FDR ---------------------
# The reference runs FAMILIES of scipy tests (one per group pair/feature,
# Statistical_test_iris_analysis.ipynb:37-160) with no multiplicity control —
# the step a statistician adds when the family has 25 members. Family here:
# per-nation Welch t of c_acctbal vs the complement (rest-of-world stats are
# an exact decimal SUBTRACTION from the broadcast global sums — one scan
# total). p-values use the portable A&S normal-tail polynomial
# (functions/numeric.py norm_sf — identical Horner expression both engines);
# BH ranks + suffix-min run as bounded triangular joins on the 25-row frame
# (the repo's no-unpartitioned-window convention), and min() is
# order-independent so the adjusted q is bit-stable.
@query(
    "multiple_test_fdr_bh",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, count(*) AS n,
             sum(CAST(c_acctbal AS DECIMAL(18,6))) AS sxd,
             -- one factor at 19 digits: HUGEINT-backed multiply in DuckDB,
             -- total 19+18=37 <= 38 so Spark's product is lossless too
             sum(CAST(CAST(c_acctbal AS DECIMAL(19,6))
                      * CAST(c_acctbal AS DECIMAL(18,6)) AS DECIMAL(37,12))) AS sxxd
      FROM customer GROUP BY c_nationkey
    ),
    tot AS (
      SELECT sum(n) AS nn_all, sum(sxd) AS sx_all, sum(sxxd) AS sxx_all FROM g
    ),
    d AS (
      SELECT nt.n_name,
             CAST(g.n AS DOUBLE) AS n1, CAST(g.sxd AS DOUBLE) AS sx1,
             CAST(g.sxxd AS DOUBLE) AS sxx1,
             CAST(t.nn_all - g.n AS DOUBLE) AS n2,
             CAST(t.sx_all - g.sxd AS DOUBLE) AS sx2,
             CAST(t.sxx_all - g.sxxd AS DOUBLE) AS sxx2
      FROM g CROSS JOIN tot t JOIN nation nt ON nt.n_nationkey = g.c_nationkey
    ),
    se AS (
      -- family members must be testable: both sides >= 2 obs and a positive
      -- standard error (always true on the fixture; guards the degenerate
      -- micro-corpus where ANSI double/0 raises)
      SELECT n_name, n1, n2, sx1, sx2,
             ((sxx1 - sx1 * sx1 / n1) / (n1 - 1.0)) / n1
             + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1.0)) / n2 AS se2
      FROM d WHERE n1 >= 2 AND n2 >= 2
    ),
    w AS (
      SELECT n_name, (sx1 / n1 - sx2 / n2) / sqrt(se2) AS t
      FROM se WHERE se2 > 0
    ),
    p AS (
      SELECT n_name, t, 2.0 * {N.sql_norm_sf('abs(t)')} AS p FROM w
    ),
    r AS (
      SELECT n_name, t, p,
             row_number() OVER (ORDER BY p, n_name) AS r,
             CAST(count(*) OVER () AS DOUBLE) AS mm
      FROM p
    ),
    q AS (
      SELECT a.n_name, a.t, a.p, a.r,
             least(1.0, min(b.p * b.mm / b.r)) AS q
      FROM r a JOIN r b ON b.r >= a.r
      GROUP BY a.n_name, a.t, a.p, a.r
    )
    SELECT n_name, round(t, 6) AS t_stat, round(p, 9) AS p_value,
           CAST(r AS BIGINT) AS rank_p, round(q, 9) AS q_bh,
           CAST(q <= 0.05 AS INT) AS reject_05
    FROM q ORDER BY rank_p
    """,
)
def multiple_test_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH-adjusted per-nation Welch t family (c_acctbal vs rest-of-world).

    One scan of customer; the complement's sufficient statistics are exact
    decimal subtractions from the broadcast global sums, so the family costs
    one groupBy at any scale. Ranks and the BH suffix-min are triangular
    joins over the bounded 25-row family frame.
    """
    from ..operators.bounded_seq import ordered_row_numbers

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    xd = F.col("c_acctbal").cast("decimal(18,6)")
    xw = F.col("c_acctbal").cast("decimal(19,6)")
    g = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sxd"),
        F.sum((xw * xd).cast("decimal(37,12)")).alias("sxxd"),
    )
    tot = g.agg(
        F.sum("n").alias("nn_all"),
        F.sum("sxd").alias("sx_all"),
        F.sum("sxxd").alias("sxx_all"),
    )
    d = (
        g.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select(
            "n_name",
            F.col("n").cast("double").alias("n1"),
            F.col("sxd").cast("double").alias("sx1"),
            F.col("sxxd").cast("double").alias("sxx1"),
            (F.col("nn_all") - F.col("n")).cast("double").alias("n2"),
            (F.col("sx_all") - F.col("sxd")).cast("double").alias("sx2"),
            (F.col("sxx_all") - F.col("sxxd")).cast("double").alias("sxx2"),
        )
    )
    n1, sx1, sxx1 = F.col("n1"), F.col("sx1"), F.col("sxx1")
    n2, sx2, sxx2 = F.col("n2"), F.col("sx2"), F.col("sxx2")
    se2 = ((sxx1 - sx1 * sx1 / n1) / (n1 - 1.0)) / n1 + (
        (sxx2 - sx2 * sx2 / n2) / (n2 - 1.0)
    ) / n2
    se = (
        d.filter((n1 >= 2) & (n2 >= 2))
        .select("n_name", "n1", "n2", "sx1", "sx2", se2.alias("se2"))
    )
    t = (sx1 / n1 - sx2 / n2) / F.sqrt(F.col("se2"))
    w = se.filter(F.col("se2") > 0).select("n_name", t.alias("t"))
    p = w.select(
        "n_name", "t", (F.lit(2.0) * N.norm_sf(F.abs(F.col("t")))).alias("p")
    )
    ranked = ordered_row_numbers(p, [("p", True), ("n_name", True)], out="r")
    fr = ranked.crossJoin(
        F.broadcast(ranked.agg(F.count("*").cast("double").alias("mm")))
    )
    b = fr.select(
        F.col("r").alias("rj"),
        (F.col("p") * F.col("mm") / F.col("r")).alias("step"),
    )
    q = (
        fr.join(F.broadcast(b), F.col("rj") >= F.col("r"))
        .groupBy("n_name", "t", "p", "r")
        .agg(F.least(F.lit(1.0), F.min("step")).alias("q"))
    )
    return q.select(
        "n_name",
        F.round("t", 6).alias("t_stat"),
        F.round("p", 9).alias("p_value"),
        F.col("r").cast("bigint").alias("rank_p"),
        F.round("q", 9).alias("q_bh"),
        (F.col("q") <= 0.05).cast("int").alias("reject_05"),
    ).orderBy("rank_p")


# --- effect sizes: Cohen's d / Hedges' g / Cliff's delta ---------------------
# The reporting companion to ttest_ind and mannwhitney above: the reference
# reports raw p-values only (Statistical_test_iris_analysis.ipynb:37-160);
# effect sizes are what a reviewer asks for next. Parametric d/g from the
# same per-group decimal sufficient statistics as ttest_ind; nonparametric
# Cliff's delta = 2*U1/(n1*n2) - 1 from the same bucketed mean-rank U as
# mannwhitney — so the whole row costs the two aggregations those tests
# already pay, merged by a broadcast of two single-row frames.
@query(
    "effect_sizes_two_group",
    oracle=f"""
    WITH g AS ({_GRP_SQL}),
    ab AS (
      SELECT max(CASE WHEN grp = 'A' THEN n END) AS n1,
             max(CASE WHEN grp = 'A' THEN sx END) AS sx1,
             max(CASE WHEN grp = 'A' THEN sxx END) AS sxx1,
             max(CASE WHEN grp = 'R' THEN n END) AS n2,
             max(CASE WHEN grp = 'R' THEN sx END) AS sx2,
             max(CASE WHEN grp = 'R' THEN sxx END) AS sxx2
      FROM g
    ),
    d AS (
      SELECT n1, n2,
             (sx1 / n1 - sx2 / n2)
             / sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
                    / (n1 + n2 - 2.0)) AS cohens_d
      FROM ab
    ),
    two AS (
      SELECT l_returnflag AS grp, l_quantity AS x
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    r AS (
      SELECT grp,
             rank() OVER (ORDER BY x)
               + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS r_avg
      FROM two
    ),
    s AS (
      SELECT sum(CASE WHEN grp = 'A' THEN r_avg END) AS r1,
             CAST(sum(CAST(grp = 'A' AS BIGINT)) AS BIGINT) AS rn1,
             CAST(sum(CAST(grp = 'R' AS BIGINT)) AS BIGINT) AS rn2
      FROM r
    )
    SELECT round(cohens_d, 6) AS cohens_d,
           round(cohens_d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g,
           round(2.0 * (r1 - rn1 * (rn1 + 1) / 2.0)
                 / (CAST(rn1 AS DOUBLE) * rn2) - 1.0, 6) AS cliffs_delta,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
    FROM d CROSS JOIN s
    """,
)
def effect_sizes_two_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes between returnflag groups A and R on l_quantity."""
    g = _grp_stats(spark, sf_dir)
    ab = g.agg(
        *[
            F.max(F.when(F.col("grp") == grp, F.col(c))).alias(f"{c}{i}")
            for i, grp in ((1, "A"), (2, "R"))
            for c in ("n", "sx", "sxx")
        ]
    )
    n1, sx1, sxx1 = F.col("n1"), F.col("sx1"), F.col("sxx1")
    n2, sx2, sxx2 = F.col("n2"), F.col("sx2"), F.col("sxx2")
    cohens = (sx1 / n1 - sx2 / n2) / F.sqrt(
        ((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2)) / (n1 + n2 - 2.0)
    )
    d = ab.select("n1", "n2", cohens.alias("cohens_d"))

    li = load_table(spark, sf_dir, "lineitem")
    two = li.filter(F.col("l_returnflag").isin("A", "R")).select(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("x")
    )
    ranks = mean_ranks(two, "x")
    cg = two.groupBy("x", "grp").agg(F.count("*").alias("c"))
    s = (
        cg.join(ranks.select("x", "r_avg"), "x")
        .agg(
            F.sum(F.when(F.col("grp") == "A", F.col("c") * F.col("r_avg"))).alias("r1"),
            F.sum(F.when(F.col("grp") == "A", F.col("c"))).cast("bigint").alias("rn1"),
            F.sum(F.when(F.col("grp") == "R", F.col("c"))).cast("bigint").alias("rn2"),
        )
    )
    j = d.crossJoin(F.broadcast(s))
    u1 = F.col("r1") - F.col("rn1") * (F.col("rn1") + 1) / 2.0
    delta = F.lit(2.0) * u1 / (F.col("rn1").cast("double") * F.col("rn2")) - 1.0
    return j.select(
        F.round("cohens_d", 6).alias("cohens_d"),
        F.round(
            F.col("cohens_d")
            * (1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2")) - 9.0)),
            6,
        ).alias("hedges_g"),
        F.round(delta, 6).alias("cliffs_delta"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
    )


# --- Cochran-Armitage trend test ----------------------------------------------
# The ordered companion to T8's chi2 independence test: when the grouping is
# ORDINAL (order priority 1..5), the question is a monotone trend in the
# success proportion, not mere dependence. T = sum_i w_i (r_i - R/N n_i) with
# scores w_i = the priority rank; Var(T) = R/N (1 - R/N) (sum w^2 n
# - (sum w n)^2 / N); chi2 = T^2 / Var, df = 1. Every sufficient statistic
# is an exact BIGINT from ONE map-side-combined groupBy; the statistic is a
# fixed double expression over the pivoted single row, so both engines
# compute the identical IEEE sequence.
@query(
    "trend_cochran_armitage",
    oracle="""
    WITH g AS (
      SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice > 150000.0 AS BIGINT)) AS BIGINT) AS r
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(r) AS DOUBLE) AS rr,
             CAST(sum(w * r) AS DOUBLE) AS swr,
             CAST(sum(w * n) AS DOUBLE) AS swn,
             CAST(sum(w * w * n) AS DOUBLE) AS swwn,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    t AS (
      SELECT k, nn, rr, swr - rr / nn * swn AS tt,
             rr / nn * (1.0 - rr / nn) * (swwn - swn * swn / nn) AS vv
      FROM s
    )
    SELECT round(tt, 6) AS t_stat, round(vv, 6) AS var_t,
           round(tt * tt / vv, 6) AS ca_chi2, CAST(1 AS BIGINT) AS df,
           k AS n_levels
    FROM t WHERE vv > 0
    """,
)
def trend_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend in P(high-value order) across the ordered priority levels."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("o_totalprice") > 150000.0).cast("bigint"))
        .cast("bigint")
        .alias("r"),
    )
    s = g.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("r").cast("double").alias("rr"),
        F.sum(F.col("w") * F.col("r")).cast("double").alias("swr"),
        F.sum(F.col("w") * F.col("n")).cast("double").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).cast("double").alias("swwn"),
        F.count("*").alias("k"),
    )
    tt = F.col("swr") - F.col("rr") / F.col("nn") * F.col("swn")
    vv = (
        F.col("rr")
        / F.col("nn")
        * (1.0 - F.col("rr") / F.col("nn"))
        * (F.col("swwn") - F.col("swn") * F.col("swn") / F.col("nn"))
    )
    t = s.select("k", "nn", "rr", tt.alias("tt"), vv.alias("vv"))
    return t.filter("vv > 0").select(
        F.round("tt", 6).alias("t_stat"),
        F.round("vv", 6).alias("var_t"),
        F.round(F.col("tt") * F.col("tt") / F.col("vv"), 6).alias("ca_chi2"),
        F.lit(1).cast("bigint").alias("df"),
        F.col("k").alias("n_levels"),
    )


# --- Bartlett's test for homogeneity of variances ----------------------------
# The parametric companion to levene_brown_forsythe: the reference checks the
# equal-variance assumption before its pooled-variance t tests
# (Statistical_test_iris_analysis.ipynb:37-160 runs scipy tests whose
# textbook precondition this is). Sufficient statistics are one decimal-exact
# groupBy (n, sum x, sum x^2 per returnflag group); the <=3-row group frame is
# PIVOTED into fixed (A, N, R) columns so every double reduction is written in
# one textual order — bit-identical across engines and partitionings (a
# 3-term double SUM would be order-dependent).
@query(
    "bartlett_test",
    oracle=f"""
    WITH g AS ({_GRP_SQL}),
    ab AS (
      SELECT max(CASE WHEN grp = 'A' THEN n END) AS n1,
             max(CASE WHEN grp = 'A' THEN sx END) AS sx1,
             max(CASE WHEN grp = 'A' THEN sxx END) AS sxx1,
             max(CASE WHEN grp = 'N' THEN n END) AS n2,
             max(CASE WHEN grp = 'N' THEN sx END) AS sx2,
             max(CASE WHEN grp = 'N' THEN sxx END) AS sxx2,
             max(CASE WHEN grp = 'R' THEN n END) AS n3,
             max(CASE WHEN grp = 'R' THEN sx END) AS sx3,
             max(CASE WHEN grp = 'R' THEN sxx END) AS sxx3
      FROM g
    ),
    v AS (
      SELECT n1, n2, n3, n1 + n2 + n3 AS nn,
             (sxx1 - sx1 * sx1 / n1) / (n1 - 1.0) AS v1,
             (sxx2 - sx2 * sx2 / n2) / (n2 - 1.0) AS v2,
             (sxx3 - sx3 * sx3 / n3) / (n3 - 1.0) AS v3
      FROM ab
    ),
    p AS (
      SELECT nn,
             ((n1 - 1.0) * v1 + (n2 - 1.0) * v2 + (n3 - 1.0) * v3)
               / (nn - 3.0) AS sp2,
             (n1 - 1.0) * ln(v1) + (n2 - 1.0) * ln(v2)
               + (n3 - 1.0) * ln(v3) AS slnv,
             1.0 + (1.0 / (n1 - 1.0) + 1.0 / (n2 - 1.0) + 1.0 / (n3 - 1.0)
                    - 1.0 / (nn - 3.0)) / 6.0 AS cc
      FROM v
    )
    SELECT round(((nn - 3.0) * ln(sp2) - slnv) / cc, 6) AS bartlett_stat,
           CAST(2 AS BIGINT) AS df, round(cc, 6) AS c_factor
    FROM p
    """,
)
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett T for equal variance of l_quantity across the three
    returnflag groups. One decimal-exact sufficient-statistics scan; the
    group frame is pivoted to fixed columns so the ln/variance arithmetic
    has a single evaluation order (cross-engine bit-stable)."""
    g = _grp_stats(spark, sf_dir)
    ab = g.agg(
        *[
            F.max(F.when(F.col("grp") == grp, F.col(c))).alias(f"{c}{i}")
            for i, grp in ((1, "A"), (2, "N"), (3, "R"))
            for c in ("n", "sx", "sxx")
        ]
    )

    def var_i(i: int):
        n, sx, sxx = F.col(f"n{i}"), F.col(f"sx{i}"), F.col(f"sxx{i}")
        return (sxx - sx * sx / n) / (n - 1.0)

    v = ab.select(
        "n1", "n2", "n3",
        (F.col("n1") + F.col("n2") + F.col("n3")).alias("nn"),
        var_i(1).alias("v1"), var_i(2).alias("v2"), var_i(3).alias("v3"),
    )
    sp2 = (
        (F.col("n1") - 1.0) * F.col("v1")
        + (F.col("n2") - 1.0) * F.col("v2")
        + (F.col("n3") - 1.0) * F.col("v3")
    ) / (F.col("nn") - 3.0)
    slnv = (
        (F.col("n1") - 1.0) * F.log(F.col("v1"))
        + (F.col("n2") - 1.0) * F.log(F.col("v2"))
        + (F.col("n3") - 1.0) * F.log(F.col("v3"))
    )
    cc = 1.0 + (
        1.0 / (F.col("n1") - 1.0)
        + 1.0 / (F.col("n2") - 1.0)
        + 1.0 / (F.col("n3") - 1.0)
        - 1.0 / (F.col("nn") - 3.0)
    ) / 6.0
    p = v.select(F.col("nn"), sp2.alias("sp2"), slnv.alias("slnv"), cc.alias("cc"))
    t = ((F.col("nn") - 3.0) * F.log(F.col("sp2")) - F.col("slnv")) / F.col("cc")
    return p.select(
        F.round(t, 6).alias("bartlett_stat"),
        F.lit(2).cast("bigint").alias("df"),
        F.round(F.col("cc"), 6).alias("c_factor"),
    )


# --- Mood's median test ------------------------------------------------------
# The k-sample median test: does each returnflag group straddle the GRAND
# median of l_quantity the same way? Convention pinned here (and in the
# oracle): the grand median is the lower weighted median — the smallest
# distinct value whose cumulative count reaches ceil(N/2) — and ties at the
# median count as "not above" (scipy.stats.median_test ties='below'). Data
# passes: ONE (group, value) histogram groupBy; the cumulative scan runs as a
# broadcast triangular join on the <=50-row value histogram (repo convention:
# no unpartitioned window), and the k x 2 chi-square is evaluated over fixed
# pivoted (A, N, R) columns in one textual order.
@query(
    "mood_median_test",
    oracle="""
    WITH gh AS (
      SELECT l_returnflag AS grp, l_quantity AS x, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    xh AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM gh GROUP BY x),
    nt AS (SELECT CAST(sum(cx) AS BIGINT) AS n FROM xh),
    cum AS (
      SELECT a.x, CAST(sum(b.cx) AS BIGINT) AS cumc
      FROM xh a JOIN xh b ON b.x <= a.x GROUP BY a.x
    ),
    med AS (
      SELECT min(x) AS med FROM cum, nt
      WHERE cumc >= CAST(ceil(n / 2.0) AS BIGINT)
    ),
    g AS (
      SELECT grp, CAST(sum(c) AS BIGINT) AS ni,
             CAST(sum(CASE WHEN x > med THEN c ELSE 0 END) AS BIGINT) AS ai
      FROM gh, med GROUP BY grp
    ),
    ab AS (
      SELECT CAST(max(CASE WHEN grp = 'A' THEN ni END) AS DOUBLE) AS n1,
             CAST(max(CASE WHEN grp = 'A' THEN ai END) AS DOUBLE) AS a1,
             CAST(max(CASE WHEN grp = 'N' THEN ni END) AS DOUBLE) AS n2,
             CAST(max(CASE WHEN grp = 'N' THEN ai END) AS DOUBLE) AS a2,
             CAST(max(CASE WHEN grp = 'R' THEN ni END) AS DOUBLE) AS n3,
             CAST(max(CASE WHEN grp = 'R' THEN ai END) AS DOUBLE) AS a3
      FROM g
    ),
    t AS (
      SELECT n1, a1, n2, a2, n3, a3,
             n1 + n2 + n3 AS nn, a1 + a2 + a3 AS aa
      FROM ab
    )
    SELECT round(
             pow(a1 - n1 * aa / nn, 2) / (n1 * aa / nn)
             + pow((n1 - a1) - n1 * (nn - aa) / nn, 2) / (n1 * (nn - aa) / nn)
             + pow(a2 - n2 * aa / nn, 2) / (n2 * aa / nn)
             + pow((n2 - a2) - n2 * (nn - aa) / nn, 2) / (n2 * (nn - aa) / nn)
             + pow(a3 - n3 * aa / nn, 2) / (n3 * aa / nn)
             + pow((n3 - a3) - n3 * (nn - aa) / nn, 2) / (n3 * (nn - aa) / nn),
             6) AS chi2_stat,
           CAST(2 AS BIGINT) AS df,
           (SELECT CAST(med AS DOUBLE) FROM med) AS grand_median,
           CAST(aa AS BIGINT) AS above_total
    FROM t
    """,
)
def mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median chi-square across returnflag groups of l_quantity."""
    from ..operators.bounded_seq import exclusive_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    gh = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("x")
    ).agg(F.count("*").cast("bigint").alias("c"))
    xh = gh.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    nt = xh.agg(F.sum("cx").cast("bigint").alias("n"))
    cum = (
        exclusive_prefix_sums(xh, "x", ["cx"])
        .join(xh, "x")
        .select("x", (F.col("prev_cx") + F.col("cx")).alias("cumc"))
    )
    med = (
        cum.crossJoin(F.broadcast(nt))
        .filter(F.col("cumc") >= F.ceil(F.col("n") / 2.0).cast("bigint"))
        .agg(F.min("x").alias("med"))
    )
    g = (
        gh.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum("c").cast("bigint").alias("ni"),
            F.sum(F.when(F.col("x") > F.col("med"), F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("ai"),
        )
    )
    ab = g.agg(
        *[
            F.max(F.when(F.col("grp") == grp, F.col(c))).cast("double").alias(f"{c[0]}{i}")
            for i, grp in ((1, "A"), (2, "N"), (3, "R"))
            for c in ("ni", "ai")
        ]
    )
    t = ab.select(
        "n1", "a1", "n2", "a2", "n3", "a3",
        (F.col("n1") + F.col("n2") + F.col("n3")).alias("nn"),
        (F.col("a1") + F.col("a2") + F.col("a3")).alias("aa"),
    )

    def cell(i: int):
        n, a = F.col(f"n{i}"), F.col(f"a{i}")
        nn, aa = F.col("nn"), F.col("aa")
        ea = n * aa / nn
        eb = n * (nn - aa) / nn
        return F.pow(a - ea, F.lit(2)) / ea + F.pow((n - a) - eb, F.lit(2)) / eb

    chi2 = cell(1) + cell(2) + cell(3)
    return t.crossJoin(F.broadcast(med)).select(
        F.round(chi2, 6).alias("chi2_stat"),
        F.lit(2).cast("bigint").alias("df"),
        F.col("med").cast("double").alias("grand_median"),
        F.col("aa").cast("bigint").alias("above_total"),
    )


# --- Mann-Kendall trend test -------------------------------------------------
# Nonparametric monotone-trend test over the monthly revenue series — the
# robust companion to trend_cochran_armitage (which needs pre-binned ordered
# groups). The series is the calendar-bounded monthly rollup (<=84 rows at
# ANY scale factor: one exact-cents groupBy scan is the only full-table
# pass); S and the tie-corrected variance run as a broadcast triangular
# pair join + tie-group histogram on that bounded frame. All pair terms are
# integers, so S is exact; the z continuity correction and two-sided p
# (portable A&S normal tail) are closed-form doubles.
_MK_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_MK_MONTHLY = f"""
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
         CAST(sum({_MK_CENTS}) AS BIGINT) AS v
  FROM orders GROUP BY m
"""


@query(
    "mann_kendall_trend",
    oracle=f"""
    WITH monthly AS ({_MK_MONTHLY}),
    pairs AS (
      SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM monthly),
    ties AS (
      SELECT coalesce(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0) AS tsum
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY v)
      WHERE t > 1
    ),
    z AS (
      SELECT s, n,
             (n * (n - 1.0) * (2.0 * n + 5.0) - tsum) / 18.0 AS var_s
      FROM pairs, nn, ties
    ),
    zz AS (
      SELECT s, n, var_s,
             CASE WHEN s > 0 THEN (s - 1.0) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1.0) / sqrt(var_s)
                  ELSE 0.0 END AS z
      FROM z
    )
    SELECT s AS s_stat, n AS n_periods, round(var_s, 6) AS var_s,
           round(z, 6) AS z_stat,
           round(2.0 * {N.sql_norm_sf('abs(z)')}, 6) AS p_two_sided
    FROM zz
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S / z / p over the monthly revenue series."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
            F.expr(N.spark_fround_int("o_totalprice * 100")).alias("cents"),
        )
        .groupBy("m")
        .agg(F.sum("cents").cast("bigint").alias("v"))
    )
    a = monthly.select(F.col("m").alias("am"), F.col("v").alias("av"))
    b = monthly.select(F.col("m").alias("bm"), F.col("v").alias("bv"))
    pairs = (
        a.join(F.broadcast(b), F.col("am") < F.col("bm"))
        .agg(
            F.sum(
                F.when(F.col("bv") > F.col("av"), 1)
                .when(F.col("bv") < F.col("av"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    nn = monthly.agg(F.count("*").cast("bigint").alias("n"))
    t = F.col("t")
    ties = (
        monthly.groupBy("v")
        .agg(F.count("*").cast("bigint").alias("t"))
        .filter(t > 1)
        .agg(
            F.coalesce(
                F.sum(t * (t - 1) * (2 * t + 5)).cast("bigint"), F.lit(0).cast("bigint")
            ).alias("tsum")
        )
    )
    z = pairs.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties)).select(
        "s",
        "n",
        (
            (F.col("n") * (F.col("n") - 1.0) * (2.0 * F.col("n") + 5.0) - F.col("tsum"))
            / 18.0
        ).alias("var_s"),
    )
    zexpr = (
        F.when(F.col("s") > 0, (F.col("s") - 1.0) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1.0) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    zz = z.select("s", "n", "var_s", zexpr.alias("z"))
    return zz.select(
        F.col("s").alias("s_stat"),
        F.col("n").alias("n_periods"),
        F.round("var_s", 6).alias("var_s"),
        F.round("z", 6).alias("z_stat"),
        F.round(2.0 * N.norm_sf(F.abs(F.col("z"))), 6).alias("p_two_sided"),
    )


# --- Theil-Sen robust slope --------------------------------------------------
# The estimator Mann-Kendall tests for: median pairwise slope of the monthly
# revenue series. Convention pinned in both engines: the LOWER median — the
# smallest slope whose <=-count reaches ceil(n_pairs/2) — selected by a
# broadcast triangular join over the bounded distinct-slope histogram (repo
# convention: no unpartitioned window). Slopes divide an exact integer cents
# difference by an exact integer month gap, so both engines compare
# identical doubles.
@query(
    "theil_sen_slope",
    oracle=f"""
    WITH monthly AS ({_MK_MONTHLY}),
    slopes AS (
      SELECT CAST(b.v - a.v AS DOUBLE)
               / CAST(date_diff('month', a.m, b.m) AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM slopes),
    dist AS (SELECT slope, CAST(count(*) AS BIGINT) AS c FROM slopes GROUP BY slope),
    cum AS (
      SELECT d1.slope, CAST(sum(d2.c) AS BIGINT) AS cumc
      FROM dist d1 JOIN dist d2 ON d2.slope <= d1.slope GROUP BY d1.slope
    ),
    med AS (
      SELECT min(slope) AS med FROM cum, np
      WHERE cumc >= CAST(ceil(n_pairs / 2.0) AS BIGINT)
    )
    SELECT round((SELECT med FROM med), 6) AS slope_cents_per_month,
           (SELECT CAST(count(*) AS BIGINT) FROM monthly) AS n_points,
           (SELECT n_pairs FROM np) AS n_pairs
    """,
)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen median slope (cents/month) of monthly revenue."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
            F.expr(N.spark_fround_int("o_totalprice * 100")).alias("cents"),
        )
        .groupBy("m")
        .agg(F.sum("cents").cast("bigint").alias("v"))
    )
    a = monthly.select(F.col("m").alias("am"), F.col("v").alias("av"))
    b = monthly.select(F.col("m").alias("bm"), F.col("v").alias("bv"))
    # try_divide, not "/": the downstream s2 <= slope join infers an
    # isnotnull(slope) constraint that Catalyst pushes INTO this join's
    # condition ahead of am < bm, so ANSI "/" would raise DIVIDE_BY_ZERO on
    # the am >= bm pairs it probes. Real pairs always have gap >= 1 month.
    slopes = a.join(F.broadcast(b), F.col("am") < F.col("bm")).select(
        F.try_divide(
            (F.col("bv") - F.col("av")).cast("double"),
            F.months_between(F.col("bm"), F.col("am")).cast("double"),
        ).alias("slope")
    )
    np_ = slopes.agg(F.count("*").cast("bigint").alias("n_pairs"))
    dist = slopes.groupBy("slope").agg(F.count("*").cast("bigint").alias("c"))
    d2 = dist.select(F.col("slope").alias("s2"), F.col("c").alias("c2"))
    cum = (
        dist.join(F.broadcast(d2), F.col("s2") <= F.col("slope"))
        .groupBy("slope")
        .agg(F.sum("c2").cast("bigint").alias("cumc"))
    )
    med = (
        cum.crossJoin(F.broadcast(np_))
        .filter(F.col("cumc") >= F.ceil(F.col("n_pairs") / 2.0).cast("bigint"))
        .agg(F.min("slope").alias("med"))
    )
    npoints = monthly.agg(F.count("*").cast("bigint").alias("n_points"))
    return (
        med.crossJoin(F.broadcast(npoints))
        .crossJoin(F.broadcast(np_))
        .select(
            F.round("med", 6).alias("slope_cents_per_month"),
            F.col("n_points"),
            F.col("n_pairs"),
        )
    )


# --- CUPED variance reduction ------------------------------------------------
# The experimentation-platform companion to ab_test_ztest: variance reduction
# of a post-period metric using the pre-period value of the same metric as
# the CUPED covariate (Deng et al., WSDM 2013). Units are customers; X = pre-1998
# revenue cents, Y = 1998+ revenue cents, both exact integer sums from
# ONE orders scan + one per-customer groupBy. theta = cov(X,Y)/var(X) and
# var(Y - theta X) = var(Y) - cov^2/var(X) come closed-form from the global
# sufficient statistics (single row; fixed evaluation order, so double math
# is engine- and partitioning-stable). Cross products are summed as
# DECIMAL(38,0) — one factor widened to 19 digits so DuckDB leaves its
# int64 multiply kernel.
@query(
    "ab_cuped_adjustment",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(sum(CAST(CAST(x AS DECIMAL(19,0))
                           * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(CAST(x AS DECIMAL(19,0))
                           * CAST(x AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(CAST(y AS DECIMAL(19,0))
                           * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM per_cust
    ),
    m AS (
      SELECT n,
             (sxx - sx * sx / n) / n AS var_x,
             (syy - sy * sy / n) / n AS var_y,
             (sxy - sx * sy / n) / n AS cov_xy
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_units,
           round(cov_xy / var_x, 6) AS theta,
           round(var_y, 6) AS var_y,
           round(var_y - cov_xy * cov_xy / var_x, 6) AS var_y_adj,
           round(cov_xy * cov_xy / (var_x * var_y), 6) AS var_reduction
    FROM m
    """,
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED theta and variance reduction from pre/post per-customer revenue."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(N.spark_fround_int("o_totalprice * 100"))
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < cut, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("o_orderdate") >= cut, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("y"),
    )
    x19 = F.col("x").cast("decimal(19,0)")
    y19 = F.col("y").cast("decimal(19,0)")
    s = per_cust.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum((x19 * y19).cast("decimal(38,0)")).cast("double").alias("sxy"),
        F.sum((x19 * x19).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((y19 * y19).cast("decimal(38,0)")).cast("double").alias("syy"),
    )
    m = s.select(
        "n",
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")).alias("var_x"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / F.col("n")).alias("var_y"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.col("n")).alias("cov_xy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_units"),
        F.round(F.col("cov_xy") / F.col("var_x"), 6).alias("theta"),
        F.round(F.col("var_y"), 6).alias("var_y"),
        F.round(
            F.col("var_y") - F.col("cov_xy") * F.col("cov_xy") / F.col("var_x"), 6
        ).alias("var_y_adj"),
        F.round(
            F.col("cov_xy") * F.col("cov_xy") / (F.col("var_x") * F.col("var_y")), 6
        ).alias("var_reduction"),
    )


# --- post-hoc power + minimum detectable effect for the A/B readout ----------
# Completes the experimentation trio (ab_test_ztest -> ab_cuped_adjustment ->
# here): given the observed arms, how much power did the test have, and what
# effect COULD it have detected at 80% power? Same per-user conversion frame
# as ab_test_ztest; both normal tails of the power integral use the portable
# A&S polynomial (power = SF(z_crit - e) + SF(z_crit + e), e = |d|/se_alt),
# so Spark and DuckDB evaluate the identical Horner text. z constants are
# literals: 1.959964 = z_{0.975}, 0.841621 = z_{0.8}.
@query(
    "ab_test_power",
    oracle=f"""
    WITH conv AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS grp,
             CAST(max(CAST(event_type = 'purchase' AND value > 80 AS INT))
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
             CAST(sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
      FROM conv
    ),
    p AS (
      SELECT n_a, n_b,
             CAST(x_a AS DOUBLE) / n_a AS p_a,
             CAST(x_b AS DOUBLE) / n_b AS p_b,
             CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pp
      FROM g
    ),
    e AS (
      SELECT n_a, n_b, p_a, p_b,
             abs(p_a - p_b) AS d,
             sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) AS se_null,
             sqrt(p_a * (1.0 - p_a) / n_a + p_b * (1.0 - p_b) / n_b) AS se_alt
      FROM p
    ),
    z AS (SELECT n_a, n_b, p_a, p_b, d, se_null,
                 d / nullif(se_alt, 0) AS eff FROM e)
    SELECT n_a, n_b, round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
           round(d, 6) AS abs_diff,
           round({N.sql_norm_sf('1.959964 - eff')}
                 + {N.sql_norm_sf('1.959964 + eff')}, 6) AS power_posthoc,
           round((1.959964 + 0.841621) * se_null, 6) AS mde_80
    FROM z
    """,
)
def ab_test_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc power and 80%-power MDE of the two-proportion A/B test."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.expr("CAST(user_id % 2 AS INT) AS grp"),
        F.expr(
            "CAST(max(CAST(event_type = 'purchase' AND value > 80 AS INT))"
            " AS BIGINT) AS converted"
        ),
    )
    g = conv.agg(
        F.expr("CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a"),
        F.expr("CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b"),
        F.expr("CAST(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a"),
        F.expr("CAST(sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b"),
    )
    p = g.select(
        "n_a",
        "n_b",
        (F.col("x_a").cast("double") / F.col("n_a")).alias("p_a"),
        (F.col("x_b").cast("double") / F.col("n_b")).alias("p_b"),
        ((F.col("x_a") + F.col("x_b")).cast("double") / (F.col("n_a") + F.col("n_b"))).alias("pp"),
    )
    e = p.select(
        "n_a", "n_b", "p_a", "p_b",
        F.abs(F.col("p_a") - F.col("p_b")).alias("d"),
        F.sqrt(
            F.col("pp") * (1.0 - F.col("pp")) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ).alias("se_null"),
        F.sqrt(
            F.col("p_a") * (1.0 - F.col("p_a")) / F.col("n_a")
            + F.col("p_b") * (1.0 - F.col("p_b")) / F.col("n_b")
        ).alias("se_alt"),
    )
    # nullif guard: a degenerate split (every arm-user converted or none
    # did) gives se_alt = 0; both engines then emit NULL power, not a crash
    # (Spark ANSI raises DIVIDE_BY_ZERO even for doubles).
    z = e.select(
        "n_a", "n_b", "p_a", "p_b", "d", "se_null",
        (F.col("d") / F.expr("nullif(se_alt, 0.0D)")).alias("eff"),
    )
    return z.select(
        "n_a",
        "n_b",
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round("d", 6).alias("abs_diff"),
        F.round(
            N.norm_sf(F.lit(1.959964) - F.col("eff"))
            + N.norm_sf(F.lit(1.959964) + F.col("eff")),
            6,
        ).alias("power_posthoc"),
        F.round((1.959964 + 0.841621) * F.col("se_null"), 6).alias("mde_80"),
    )


# --- sequential A/B monitoring: Wald SPRT over daily batches -----------------
# Simple-vs-simple Bernoulli SPRT (Wald 1945): H0 p=_SPRT_P0 vs H1
# p=_SPRT_P1 on the treatment arm's conversion stream, alpha=beta=0.05.
# Per-trial log-likelihood ratios are CONSTANTS (only k and n-k vary), so
# the whole walk is integer arithmetic over 1e9-quantized constants —
# computed ONCE here in Python and embedded as identical literals in both
# engines (the decontam llr_e9 idiom, hoisted from per-row to per-module).
import math as _math

_SPRT_P0, _SPRT_P1 = 0.03, 0.05
_SPRT_ALPHA = 0.05  # = beta
_SPRT_L1_E9 = round(_math.log(_SPRT_P1 / _SPRT_P0) * 1e9)  # per-success
_SPRT_L0_E9 = round(
    _math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e9
)  # per-failure
_SPRT_A_E9 = round(_math.log((1 - _SPRT_ALPHA) / _SPRT_ALPHA) * 1e9)


@query(
    "ab_sequential_sprt",
    oracle=f"""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             count(*) AS n_trials,
             CAST(sum(CAST(event_type = 'purchase' AND value > 80 AS INT))
                  AS BIGINT) AS n_success
      FROM events WHERE user_id % 2 = 1
      GROUP BY day
    ),
    w AS (
      SELECT day, n_trials, n_success,
             n_success * {_SPRT_L1_E9}
               + (n_trials - n_success) * {_SPRT_L0_E9} AS llr_e9
      FROM d
    ),
    c AS (
      SELECT day, n_trials, n_success, llr_e9,
             CAST(sum(llr_e9) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_llr_e9
      FROM w
    ),
    s AS (
      SELECT *,
             CAST(cum_llr_e9 >= {_SPRT_A_E9}
                  OR cum_llr_e9 <= {-_SPRT_A_E9} AS INT) AS crossed,
             CAST(coalesce(sum(CAST(cum_llr_e9 >= {_SPRT_A_E9}
                    OR cum_llr_e9 <= {-_SPRT_A_E9} AS INT))
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS BIGINT) AS prev_crossed
      FROM c
    )
    SELECT day, n_trials, n_success, llr_e9, cum_llr_e9,
           CASE WHEN prev_crossed > 0 THEN 'stopped'
                WHEN cum_llr_e9 >= {_SPRT_A_E9} THEN 'accept_h1'
                WHEN cum_llr_e9 <= {-_SPRT_A_E9} THEN 'accept_h0'
                ELSE 'continue' END AS state
    FROM s
    """,
)
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential A/B monitoring — Wald's SPRT, the always-valid
    alternative to the fixed-horizon ab_test_ztest peeking problem: each
    day's treatment-arm conversions advance a cumulative log-likelihood
    walk (H0 p={_SPRT_P0} vs H1 p={_SPRT_P1}); the experiment accepts H1
    the first day the walk reaches ln((1-α)/α), accepts H0 at the mirror
    bound, and every later day reports 'stopped'. The whole readout a
    sequential-testing dashboard renders.

    Scale shape: one fact-scan aggregate into a DATE-bounded (~30-row)
    daily table; because the Bernoulli LLR increments are constants, the
    walk is pure bigint arithmetic (1e9-quantized module literals shared
    verbatim by both engines — overflow at ~5·10^11 daily trials, far past
    any fixture decade). Cumulative and look-back passes are broadcast
    triangular prefix sums over the bounded table
    (operators/bounded_seq.py) — no single-partition window."""
    from ..operators.bounded_seq import exclusive_prefix_sums

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("user_id") % 2 == 1)
        .groupBy(
            F.expr("CAST(CAST(ts AS DATE) AS TIMESTAMP)").alias("day")
        )
        .agg(
            F.expr("count(*) AS n_trials"),
            F.expr(
                "CAST(sum(CAST(event_type = 'purchase' AND value > 80"
                " AS INT)) AS BIGINT) AS n_success"
            ),
        )
    )
    w = d.selectExpr(
        "day",
        "n_trials",
        "n_success",
        f"n_success * {_SPRT_L1_E9}"
        f" + (n_trials - n_success) * {_SPRT_L0_E9} AS llr_e9",
    )
    cum = w.join(exclusive_prefix_sums(w, "day", ["llr_e9"]), "day").selectExpr(
        "day",
        "n_trials",
        "n_success",
        "llr_e9",
        "prev_llr_e9 + llr_e9 AS cum_llr_e9",
    )
    crossed = cum.withColumn(
        "crossed",
        F.expr(
            f"CAST(cum_llr_e9 >= {_SPRT_A_E9}"
            f" OR cum_llr_e9 <= {-_SPRT_A_E9} AS INT)"
        ),
    )
    final = crossed.join(
        exclusive_prefix_sums(crossed.select("day", "crossed"), "day", ["crossed"]),
        "day",
    )
    return final.selectExpr(
        "day",
        "n_trials",
        "n_success",
        "llr_e9",
        "cum_llr_e9",
        f"CASE WHEN prev_crossed > 0 THEN 'stopped'"
        f" WHEN cum_llr_e9 >= {_SPRT_A_E9} THEN 'accept_h1'"
        f" WHEN cum_llr_e9 <= {-_SPRT_A_E9} THEN 'accept_h0'"
        f" ELSE 'continue' END AS state",
    )


# --- Wald-Wolfowitz runs test on the daily order series ----------------------
_RT_DAILY = """
  SELECT epoch_us(o_orderdate) // 86400000000 AS d, count(*) AS x
  FROM orders GROUP BY d
"""


@query(
    "runs_test_daily",
    oracle=f"""
    WITH daily AS ({_RT_DAILY}),
    diff AS (
      SELECT a.d, CASE WHEN a.x > b.x THEN 1 ELSE -1 END AS s
      FROM daily a JOIN daily b ON b.d = a.d - 1
      WHERE a.x <> b.x
    ),
    seq AS (SELECT d, s, lag(s) OVER (ORDER BY d) AS ps FROM diff),
    c AS (
      SELECT coalesce(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0) AS n1,
             coalesce(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END), 0) AS n2,
             coalesce(sum(CASE WHEN ps IS NOT NULL AND ps <> s
                               THEN 1 ELSE 0 END), 0)
               + CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS r
      FROM seq
    )
    SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down,
           CAST(r AS BIGINT) AS n_runs,
           round(1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / nullif(CAST(n1 + n2 AS DOUBLE), 0.0), 6) AS expected_runs,
           round((CAST(r AS DOUBLE)
                  - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     / nullif(CAST(n1 + n2 AS DOUBLE), 0.0)))
                 / nullif(sqrt(
                     (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                         - CAST(n1 + n2 AS DOUBLE)))
                     / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                        * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 0.0), 6) AS z
    FROM c
    """,
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily order-count
    direction: sign of the day-over-day change (zero diffs dropped, gap
    days excluded by the d-1 equi-join — NOT a lag that would silently
    bridge calendar gaps), number of runs R, and the normal-approximation
    z against E[R] = 1 + 2·n1·n2/n. All counting is integer and the z
    formula is the identical double expression in both engines.

    Scale shape: the fact compresses to the calendar-bounded daily table
    in one map-side-combined agg; the diff is a self equi-join on d-1 and
    the predecessor sign rides ONE broadcast triangular pass (sign packed
    into max(2·d2 + [s2>0]) so no second join is needed) — no
    unpartitioned window anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").alias(
            "d"
        )
    ).agg(F.count("*").alias("x"))
    prev = daily.select((F.col("d") + 1).alias("d"), F.col("x").alias("xp"))
    diff = (
        daily.join(F.broadcast(prev), "d")
        .filter(F.col("x") != F.col("xp"))
        .select(
            "d",
            F.when(F.col("x") > F.col("xp"), F.lit(1)).otherwise(F.lit(-1)).alias("s"),
        )
    )
    # predecessor sign via one triangular pass: max(2*d2 + [s2 = +1]) over
    # d2 < d carries both the predecessor day (quotient) and its sign
    # (parity) — decode with % 2
    f2 = diff.select(F.col("d").alias("d2"), F.col("s").alias("s2"))
    withprev = (
        diff.join(F.broadcast(f2), F.col("d2") < F.col("d"), "left")
        .groupBy("d", "s")
        .agg(
            F.max(
                2 * F.col("d2") + F.when(F.col("s2") == 1, 1).otherwise(0)
            ).alias("packed")
        )
        .select(
            "d",
            "s",
            F.when(F.col("packed").isNull(), F.lit(None).cast("int"))
            .otherwise(2 * (F.col("packed") % 2).cast("int") - 1)
            .alias("ps"),
        )
    )
    c = withprev.agg(
        F.coalesce(F.sum(F.when(F.col("s") == 1, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n1"),
        F.coalesce(F.sum(F.when(F.col("s") == -1, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n2"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ps").isNotNull() & (F.col("ps") != F.col("s")), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            + F.when(F.count("*") > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("r"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    mu = 1.0 + 2.0 * n1d * n2d / F.nullif(nd, F.lit(0.0))
    var = (2.0 * n1d * n2d * (2.0 * n1d * n2d - nd)) / (nd * nd * (nd - 1.0))
    return c.select(
        F.col("n1").alias("n_up"),
        F.col("n2").alias("n_down"),
        F.col("r").alias("n_runs"),
        F.round(mu, 6).alias("expected_runs"),
        F.round(
            (F.col("r").cast("double") - mu)
            / F.nullif(F.sqrt(var), F.lit(0.0)),
            6,
        ).alias("z"),
    )


# --- Huber robust regression via quantized IRLS -------------------------------
# y = l_extendedprice on x = l_quantity: OLS start, then two Huber reweight
# rounds (delta = $20k). The IRLS weight w = min(1, delta/|r|) is QUANTIZED
# to 1e-6 (an integer 0..1e6) so every weighted sufficient statistic is an
# exact integer/decimal sum — order-free across engines — and the closed-form
# 2x2 solve is one identical double expression per round. Betas are rounded
# 6dp between rounds so both engines feed bit-equal coefficients forward.
_HUB_DELTA = 20000.0
_HUB_ROUNDS = 2
_HUB_WSCALE = 1_000_000


def _hub_r(b0: str, b1: str) -> str:
    # residual in dollars; identical text in both engines
    return f"(CAST(yc AS DOUBLE) / 100.0 - ({b0} + {b1} * CAST(xi AS DOUBLE)))"


def _hub_w(b0: str, b1: str) -> str:
    r = _hub_r(b0, b1)
    return (
        f"(CASE WHEN abs({r}) <= {_HUB_DELTA} THEN 1.0"
        f" ELSE {_HUB_DELTA} / abs({r}) END)"
    )


def _hub_beta_sql(n: str, sx: str, sy: str, sxx: str, sxy: str) -> tuple[str, str]:
    """(b1_expr, b0_expr_given_b1) — b1 in dollars/unit, b0 in dollars,
    from cents-scaled sums; b0 takes the literal ROUNDED b1 column."""
    b1 = (
        f"round((CAST({n} AS DOUBLE) * CAST({sxy} AS DOUBLE)"
        f" - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
        f" / nullif(CAST({n} AS DOUBLE) * CAST({sxx} AS DOUBLE)"
        f" - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE), 0.0) / 100.0, 6)"
    )
    b0 = (
        f"round((CAST({sy} AS DOUBLE) / 100.0 - b1 * CAST({sx} AS DOUBLE))"
        f" / nullif(CAST({n} AS DOUBLE), 0.0), 6)"
    )
    return b1, b0


def _hub_oracle() -> str:
    import usw_big_data_analysis_spark.functions.numeric as _N

    b1_0, b0_0 = _hub_beta_sql("n", "sx", "sy", "sxx", "sxy")
    parts = [
        f"""li AS (
      SELECT {_N.sql_iscaled("l_quantity", 0)} AS xi,
             {_N.sql_iscaled("l_extendedprice", 2)} AS yc
      FROM lineitem
    ),
    s0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(xi) AS BIGINT) AS sx,
             CAST(sum(yc) AS BIGINT) AS sy,
             CAST(sum(CAST(xi * xi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(xi * yc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      FROM li
    ),
    b0a AS (SELECT n, sx, sy, {b1_0} AS b1 FROM s0),
    br0 AS (SELECT b1, {b0_0} AS b0,
                   CAST(n AS BIGINT) * {_HUB_WSCALE} AS sum_w6,
                   CAST(0 AS BIGINT) AS n_down FROM b0a)"""
    ]
    for i in range(1, _HUB_ROUNDS + 1):
        w = _hub_w("b0", "b1")
        b1_i, b0_i = _hub_beta_sql("sw", "swx", "swy", "swxx", "swxy")
        parts.append(f"""w{i} AS (
      SELECT xi, yc, CAST(round({w} * {_HUB_WSCALE}) AS BIGINT) AS wi
      FROM li, br{i - 1}
    ),
    s{i} AS (
      SELECT CAST(sum(wi) AS DECIMAL(38,0)) AS sw,
             CAST(sum(CAST(wi * xi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS swx,
             CAST(sum(CAST(wi * yc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS swy,
             CAST(sum(CAST(wi * xi * xi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS swxx,
             CAST(sum(CAST(wi * xi * yc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS swxy,
             CAST(sum(wi) AS BIGINT) AS sum_w6,
             CAST(sum(CASE WHEN wi < {_HUB_WSCALE} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_down
      FROM w{i}
    ),
    b{i}a AS (SELECT sw, swx, swy, sum_w6, n_down, {b1_i} AS b1 FROM s{i}),
    br{i} AS (SELECT b1, {b0_i} AS b0, sum_w6, n_down FROM b{i}a)""")
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS iteration, b0 AS beta0, b1 AS beta1, sum_w6, n_down"
        f" FROM br{i}"
        for i in range(_HUB_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + sel


@query("linreg_huber_irls", oracle=_hub_oracle())
def linreg_huber_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber robust simple regression (extendedprice ~ quantity) by IRLS:
    OLS seed, then {r} reweight rounds with w = min(1, delta/|residual|),
    delta = $20k. Emits one row per round (beta0, beta1, total quantized
    weight, downweighted-row count) so the trajectory itself is the
    oracle-checked artifact.

    Scale shape: each round is ONE map-side-combined aggregation over the
    fact — {r1} scans total, chained lazily through broadcast one-row beta
    frames (no driver collect). Exactness: weights quantized to 1e-6
    integers, so every weighted moment is an exact DECIMAL sum; the 2x2
    normal-equation solve happens on correctly-rounded doubles with betas
    re-rounded 6dp before feeding the next round — bit-equal trajectories
    in both engines.""".format(r=_HUB_ROUNDS, r1=_HUB_ROUNDS + 1)
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"{N.spark_iscaled('l_quantity', 0)} AS xi",
        f"{N.spark_iscaled('l_extendedprice', 2)} AS yc",
    )
    b1_0, b0_0 = _hub_beta_sql("n", "sx", "sy", "sxx", "sxy")
    s0 = li.selectExpr(
        "xi", "yc", "CAST(xi AS DECIMAL(38,0)) * xi AS xx",
        "CAST(xi AS DECIMAL(38,0)) * yc AS xy",
    ).agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("CAST(sum(xi) AS BIGINT) AS sx"),
        F.expr("CAST(sum(yc) AS BIGINT) AS sy"),
        F.expr("CAST(sum(xx) AS DECIMAL(38,0)) AS sxx"),
        F.expr("CAST(sum(xy) AS DECIMAL(38,0)) AS sxy"),
    )
    br = (
        s0.selectExpr("n", "sx", "sy", f"{b1_0} AS b1")
        .selectExpr(
            "b1",
            f"{b0_0} AS b0",
            f"CAST(n AS BIGINT) * {_HUB_WSCALE} AS sum_w6",
            "CAST(0 AS BIGINT) AS n_down",
        )
    )
    out = [br.selectExpr(
        "0 AS iteration", "b0 AS beta0", "b1 AS beta1", "sum_w6", "n_down"
    )]
    for i in range(1, _HUB_ROUNDS + 1):
        w = _hub_w("b0", "b1")
        wi_expr = f"CAST({N.spark_fround_int(f'{w} * {_HUB_WSCALE}')} AS BIGINT)"
        wtab = li.crossJoin(F.broadcast(br.select("b0", "b1"))).selectExpr(
            "xi", "yc", f"{wi_expr} AS wi"
        )
        s = wtab.selectExpr(
            "wi",
            "CAST(wi AS DECIMAL(38,0)) * xi AS wx",
            "CAST(wi AS DECIMAL(38,0)) * yc AS wy",
            "CAST(wi AS DECIMAL(38,0)) * xi * xi AS wxx",
            "CAST(wi AS DECIMAL(38,0)) * xi * yc AS wxy",
        ).agg(
            F.expr("CAST(sum(CAST(wi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw"),
            F.expr("CAST(sum(wx) AS DECIMAL(38,0)) AS swx"),
            F.expr("CAST(sum(wy) AS DECIMAL(38,0)) AS swy"),
            F.expr("CAST(sum(wxx) AS DECIMAL(38,0)) AS swxx"),
            F.expr("CAST(sum(wxy) AS DECIMAL(38,0)) AS swxy"),
            F.expr("CAST(sum(wi) AS BIGINT) AS sum_w6"),
            F.expr(
                f"CAST(sum(CASE WHEN wi < {_HUB_WSCALE} THEN 1 ELSE 0 END)"
                " AS BIGINT) AS n_down"
            ),
        )
        b1_i, b0_i = _hub_beta_sql("sw", "swx", "swy", "swxx", "swxy")
        br = s.selectExpr(
            "sw", "swx", "swy", "sum_w6", "n_down", f"{b1_i} AS b1"
        ).selectExpr("b1", f"{b0_i} AS b0", "sum_w6", "n_down")
        out.append(br.selectExpr(
            f"{i} AS iteration", "b0 AS beta0", "b1 AS beta1", "sum_w6", "n_down"
        ))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


# --- difference-in-differences with normal-approximation SE ------------------
# Completes the experimentation family (ztest, power, CUPED, SPRT) with the
# observational workhorse: assignment is the deterministic o_custkey % 2
# hash-split (the same state-free unit split split_modk pins), the period
# cut is 1996-01-01, and the outcome is order revenue in integer cents.
_DID_CUT = "1996-01-01"


@query(
    "ab_diff_in_diff",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(o_custkey % 2 AS INT) AS treated,
             CAST(o_orderdate >= TIMESTAMP '{_DID_CUT}' AS INT) AS post,
             CAST(round(o_totalprice * 100) AS BIGINT) AS yc
      FROM orders
    ),
    cells AS (
      SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yc) AS BIGINT) AS s,
             CAST(sum(CAST(CAST(yc AS DECIMAL(19,0))
                           * CAST(yc AS DECIMAL(19,0)) AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS ss
      FROM obs GROUP BY treated, post
    ),
    m AS (
      SELECT treated, post, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_d,
             (CAST(ss AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0) / 10000.0 AS var_d
      FROM cells
    ),
    wide AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 1 THEN mean_d END) AS t_post,
        max(CASE WHEN treated = 1 AND post = 0 THEN mean_d END) AS t_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN mean_d END) AS c_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN mean_d END) AS c_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN var_d / n END) AS v_tp,
        max(CASE WHEN treated = 1 AND post = 0 THEN var_d / n END) AS v_tr,
        max(CASE WHEN treated = 0 AND post = 1 THEN var_d / n END) AS v_cp,
        max(CASE WHEN treated = 0 AND post = 0 THEN var_d / n END) AS v_cr,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM m
    )
    SELECT n_total,
           round(t_pre, 6) AS treated_pre, round(t_post, 6) AS treated_post,
           round(c_pre, 6) AS control_pre, round(c_post, 6) AS control_post,
           round((t_post - t_pre) - (c_post - c_pre), 6) AS did,
           round(sqrt(v_tp + v_tr + v_cp + v_cr), 6) AS se,
           round(((t_post - t_pre) - (c_post - c_pre))
                 / nullif(sqrt(v_tp + v_tr + v_cp + v_cr), 0.0), 6) AS z
    FROM wide
    """,
)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: hash-split units (o_custkey % 2, the
    state-free assignment convention), period cut {cut}, outcome = order
    revenue. DiD = (T_post − T_pre) − (C_post − C_pre) with the
    independent-cells normal SE √(Σ var_cell/n_cell) and its z.

    Exactness: one fact scan to four cells of integer sufficient
    statistics (cents sums, DECIMAL squares); every derived double is the
    identical expression in both engines. Scale shape: a 4-group
    map-side-combined aggregate — nothing after the scan exceeds 4
    rows.""".format(cut=_DID_CUT)
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.selectExpr(
        "CAST(o_custkey % 2 AS INT) AS treated",
        f"CAST(o_orderdate >= CAST('{_DID_CUT}' AS TIMESTAMP_NTZ) AS INT)"
        " AS post",
        f"{N.spark_fround_int('o_totalprice * 100')} AS yc",
    )
    cells = obs.groupBy("treated", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("yc").cast("bigint").alias("s"),
        F.sum(
            (F.col("yc").cast("decimal(19,0)") * F.col("yc").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    m = cells.selectExpr(
        "treated",
        "post",
        "n",
        "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_d",
        "(CAST(ss AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - 1.0) / 10000.0 AS var_d",
    )
    wide = m.agg(
        F.expr("max(CASE WHEN treated = 1 AND post = 1 THEN mean_d END) AS t_post"),
        F.expr("max(CASE WHEN treated = 1 AND post = 0 THEN mean_d END) AS t_pre"),
        F.expr("max(CASE WHEN treated = 0 AND post = 1 THEN mean_d END) AS c_post"),
        F.expr("max(CASE WHEN treated = 0 AND post = 0 THEN mean_d END) AS c_pre"),
        F.expr("max(CASE WHEN treated = 1 AND post = 1 THEN var_d / n END) AS v_tp"),
        F.expr("max(CASE WHEN treated = 1 AND post = 0 THEN var_d / n END) AS v_tr"),
        F.expr("max(CASE WHEN treated = 0 AND post = 1 THEN var_d / n END) AS v_cp"),
        F.expr("max(CASE WHEN treated = 0 AND post = 0 THEN var_d / n END) AS v_cr"),
        F.expr("CAST(sum(n) AS BIGINT) AS n_total"),
    )
    return wide.selectExpr(
        "n_total",
        "round(t_pre, 6) AS treated_pre",
        "round(t_post, 6) AS treated_post",
        "round(c_pre, 6) AS control_pre",
        "round(c_post, 6) AS control_post",
        "round((t_post - t_pre) - (c_post - c_pre), 6) AS did",
        "round(sqrt(v_tp + v_tr + v_cp + v_cr), 6) AS se",
        "round(((t_post - t_pre) - (c_post - c_pre))"
        " / nullif(sqrt(v_tp + v_tr + v_cp + v_cr), 0.0), 6) AS z",
    )


# --- ratio-metric A/B comparison via the delta method ------------------------
# Revenue-per-order is a RATIO of two unit-level quantities; naive per-row
# t-tests are wrong because the denominator varies by unit. Delta method
# (the experimentation-platform standard): R = sum(X)/sum(Y) per arm,
# Var(R) = (var_x - 2R cov + R^2 var_y) / (n * ybar^2).
@query(
    "ab_ratio_delta_method",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(o_custkey % 2 AS INT) AS arm,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(CAST(x AS DECIMAL(19,0))
                           * CAST(x AS DECIMAL(19,0)) AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(CAST(x AS DECIMAL(19,0))
                           * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(CAST(y AS DECIMAL(19,0))
                           * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS syy
      FROM per_cust GROUP BY arm
    ),
    m AS (
      SELECT arm, n,
             CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) / 100.0 AS r,
             ((CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)
              - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * ((CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0))
              + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * ((CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)))
             / (CAST(n AS DOUBLE)
                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) / 10000.0 AS v
      FROM s
    ),
    wide AS (
      SELECT max(CASE WHEN arm = 1 THEN r END) AS r_t,
             max(CASE WHEN arm = 0 THEN r END) AS r_c,
             max(CASE WHEN arm = 1 THEN v END) AS v_t,
             max(CASE WHEN arm = 0 THEN v END) AS v_c,
             max(CASE WHEN arm = 1 THEN n END) AS n_t,
             max(CASE WHEN arm = 0 THEN n END) AS n_c
      FROM m
    )
    SELECT CAST(n_t AS BIGINT) AS n_treat, CAST(n_c AS BIGINT) AS n_control,
           round(r_t, 6) AS ratio_treat, round(r_c, 6) AS ratio_control,
           round(r_t - r_c, 6) AS diff,
           round(sqrt(v_t + v_c), 6) AS se,
           round((r_t - r_c) / nullif(sqrt(v_t + v_c), 0.0), 6) AS z
    FROM wide
    """,
)
def ab_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method comparison of a ratio metric (revenue per order,
    unit = customer) between the hash-split arms: per-arm R = ΣX/ΣY and
    Var(R) = (s²_x − 2R·s_xy + R²·s²_y)/(n·ȳ²), then the two-arm z. The
    correct test when the denominator varies per unit — a per-row t-test
    on x/y is biased by unit weighting.

    Exactness: per-customer X (cents) and Y (orders) are integers; arm
    moments are DECIMAL cross-product sums; everything double-valued is
    the identical expression in both engines. One fact scan → per-unit
    groupBy → 2-row arm aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr("CAST(any_value(o_custkey % 2) AS INT) AS arm"),
        F.expr(
            f"CAST(sum({N.spark_fround_int('o_totalprice * 100')}) AS BIGINT) AS x"
        ),
        F.expr("CAST(count(*) AS BIGINT) AS y"),
    )
    x19 = F.col("x").cast("decimal(19,0)")
    y19 = F.col("y").cast("decimal(19,0)")
    s = per_cust.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((x19 * x19).cast("decimal(38,0)")).cast("decimal(38,0)").alias("sxx"),
        F.sum((x19 * y19).cast("decimal(38,0)")).cast("decimal(38,0)").alias("sxy"),
        F.sum((y19 * y19).cast("decimal(38,0)")).cast("decimal(38,0)").alias("syy"),
    )
    m = s.selectExpr(
        "arm",
        "n",
        "CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) / 100.0 AS r",
        """((CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0)
          - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
            * ((CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0))
          + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
            * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
            * ((CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0)))
         / (CAST(n AS DOUBLE)
            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) / 10000.0 AS v""",
    )
    wide = m.agg(
        F.expr("max(CASE WHEN arm = 1 THEN r END) AS r_t"),
        F.expr("max(CASE WHEN arm = 0 THEN r END) AS r_c"),
        F.expr("max(CASE WHEN arm = 1 THEN v END) AS v_t"),
        F.expr("max(CASE WHEN arm = 0 THEN v END) AS v_c"),
        F.expr("max(CASE WHEN arm = 1 THEN n END) AS n_t"),
        F.expr("max(CASE WHEN arm = 0 THEN n END) AS n_c"),
    )
    return wide.selectExpr(
        "CAST(n_t AS BIGINT) AS n_treat",
        "CAST(n_c AS BIGINT) AS n_control",
        "round(r_t, 6) AS ratio_treat",
        "round(r_c, 6) AS ratio_control",
        "round(r_t - r_c, 6) AS diff",
        "round(sqrt(v_t + v_c), 6) AS se",
        "round((r_t - r_c) / nullif(sqrt(v_t + v_c), 0.0), 6) AS z",
    )


# --- TOST equivalence test between the experiment arms -----------------------
# ab_test_ztest asks "is there a difference?"; TOST (two one-sided tests,
# Schuirmann 1987) asks the release-gating question "is the difference
# PROVABLY within +/- delta?" — absence of significance is NOT equivalence.
_TOST_DELTA = 2000.0  # dollars


def _tost_onesided_p(z: str) -> str:
    """P(Z > z) for a possibly-negative z, via the non-negative-input
    portable tail (identical literal text both engines)."""
    return (
        f"(CASE WHEN {z} >= 0.0 THEN {N.sql_norm_sf(z)}"
        f" ELSE 1.0 - {N.sql_norm_sf(f'-({z})')} END)"
    )


@query(
    "ab_tost_equivalence",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(o_custkey % 2 AS INT) AS arm,
             CAST(round(o_totalprice * 100) AS BIGINT) AS yc
      FROM orders
    ),
    s AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yc) AS BIGINT) AS sy,
             CAST(sum(CAST(CAST(yc AS DECIMAL(19,0))
                           * CAST(yc AS DECIMAL(19,0)) AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS syy
      FROM obs GROUP BY arm
    ),
    m AS (
      SELECT arm, n, CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_d,
             (CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0) / 10000.0 / CAST(n AS DOUBLE) AS vn
      FROM s
    ),
    wide AS (
      SELECT max(CASE WHEN arm = 1 THEN mean_d END)
               - max(CASE WHEN arm = 0 THEN mean_d END) AS diff,
             sqrt(max(CASE WHEN arm = 1 THEN vn END)
                  + max(CASE WHEN arm = 0 THEN vn END)) AS se
      FROM m
    ),
    zz AS (
      SELECT diff, se,
             (diff + {_TOST_DELTA}) / nullif(se, 0.0) AS z_lower,
             ({_TOST_DELTA} - diff) / nullif(se, 0.0) AS z_upper
      FROM wide
    )
    SELECT round(diff, 6) AS diff, round(se, 6) AS se,
           round(z_lower, 6) AS z_lower, round(z_upper, 6) AS z_upper,
           round(greatest({_tost_onesided_p('z_lower')},
                          {_tost_onesided_p('z_upper')}), 6) AS p_tost,
           CAST(greatest({_tost_onesided_p('z_lower')},
                         {_tost_onesided_p('z_upper')}) < 0.05 AS INT)
             AS equivalent
    FROM zz
    """,
)
def ab_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence between the hash-split arms on mean order value,
    margin ±${d:.0f}: both one-sided z tests must reject (p_tost =
    max(p_lower, p_upper) < 0.05) to declare the arms equivalent — the
    release-gating complement to ab_test_ztest, since a non-significant
    difference is not evidence of no difference. p-values ride the
    portable Zelen-Severo normal tail (same contract as
    multiple_test_fdr_bh). One fact scan to two cells of integer/DECIMAL
    sufficient statistics.""".format(d=_TOST_DELTA)
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.selectExpr(
        "CAST(o_custkey % 2 AS INT) AS arm",
        f"{N.spark_fround_int('o_totalprice * 100')} AS yc",
    )
    y19 = F.col("yc").cast("decimal(19,0)")
    s = obs.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("yc").cast("bigint").alias("sy"),
        F.sum((y19 * y19).cast("decimal(38,0)")).cast("decimal(38,0)").alias("syy"),
    )
    m = s.selectExpr(
        "arm",
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_d",
        "(CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - 1.0) / 10000.0 / CAST(n AS DOUBLE) AS vn",
    )
    wide = m.agg(
        F.expr(
            "max(CASE WHEN arm = 1 THEN mean_d END)"
            " - max(CASE WHEN arm = 0 THEN mean_d END) AS diff"
        ),
        F.expr(
            "sqrt(max(CASE WHEN arm = 1 THEN vn END)"
            " + max(CASE WHEN arm = 0 THEN vn END)) AS se"
        ),
    )
    zz = wide.selectExpr(
        "diff",
        "se",
        f"(diff + {_TOST_DELTA}) / nullif(se, 0.0) AS z_lower",
        f"({_TOST_DELTA} - diff) / nullif(se, 0.0) AS z_upper",
    )

    def _p(z: str) -> str:
        return (
            f"(CASE WHEN {z} >= 0.0 THEN {N.sql_norm_sf(z)}"
            f" ELSE 1.0 - {N.sql_norm_sf(f'-({z})')} END)"
        )

    return zz.selectExpr(
        "round(diff, 6) AS diff",
        "round(se, 6) AS se",
        "round(z_lower, 6) AS z_lower",
        "round(z_upper, 6) AS z_upper",
        f"round(greatest({_p('z_lower')}, {_p('z_upper')}), 6) AS p_tost",
        f"CAST(greatest({_p('z_lower')}, {_p('z_upper')}) < 0.05 AS INT)"
        " AS equivalent",
    )


# --- segment-level uplift (two-model difference with CIs) ----------------------
@query(
    "ab_uplift_by_segment",
    oracle="""
    WITH obs AS (
      SELECT c_nationkey % 5 AS segment,
             CAST(o_custkey % 2 AS INT) AS treated,
             CAST(o_totalprice > 150000.0 AS INT) AS converted
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cells AS (
      SELECT segment, treated, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS x
      FROM obs GROUP BY segment, treated
    ),
    wide AS (
      SELECT segment,
             max(CASE WHEN treated = 1 THEN n END) AS n_t,
             max(CASE WHEN treated = 1 THEN x END) AS x_t,
             max(CASE WHEN treated = 0 THEN n END) AS n_c,
             max(CASE WHEN treated = 0 THEN x END) AS x_c
      FROM cells GROUP BY segment
    )
    SELECT CAST(segment AS BIGINT) AS segment, n_t, n_c,
           round(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE), 6) AS rate_treat,
           round(CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS rate_control,
           round(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS uplift,
           round(sqrt(
             (CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE))
               * (1.0 - CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE))
               / CAST(n_t AS DOUBLE)
             + (CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE))
               * (1.0 - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE))
               / CAST(n_c AS DOUBLE)), 6) AS se
    FROM wide
    """,
)
def ab_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level uplift readout (the heterogeneous-treatment-effect
    table a targeting decision consumes): per nation-hash segment, the
    treated-vs-control conversion difference with its two-proportion SE —
    where ab_test_ztest reports ONE global effect, this is the
    per-segment breakdown that decides WHO gets the treatment. Integer
    cell counts, identical double expressions; one fact scan through the
    broadcastable customer dimension join."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    obs = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).selectExpr(
        "c_nationkey % 5 AS segment",
        "CAST(o_custkey % 2 AS INT) AS treated",
        "CAST(o_totalprice > 150000.0D AS INT) AS converted",
    )
    cells = obs.groupBy("segment", "treated").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("x"),
    )
    wide = cells.groupBy("segment").agg(
        F.expr("max(CASE WHEN treated = 1 THEN n END) AS n_t"),
        F.expr("max(CASE WHEN treated = 1 THEN x END) AS x_t"),
        F.expr("max(CASE WHEN treated = 0 THEN n END) AS n_c"),
        F.expr("max(CASE WHEN treated = 0 THEN x END) AS x_c"),
    )
    return wide.selectExpr(
        "CAST(segment AS BIGINT) AS segment",
        "n_t",
        "n_c",
        "round(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE), 6) AS rate_treat",
        "round(CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS rate_control",
        "round(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS uplift",
        """round(sqrt(
             (CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE))
               * (1.0 - CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE))
               / CAST(n_t AS DOUBLE)
             + (CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE))
               * (1.0 - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE))
               / CAST(n_c AS DOUBLE)), 6) AS se""",
    )
