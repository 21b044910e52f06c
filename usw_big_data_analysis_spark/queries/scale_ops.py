"""Approximate-at-scale operators with verified error contracts: the
sketches and bounded-memory passes that replace exact operators once a
single key group or value buffer stops fitting — HyperLogLog distinct
counts, t-digest-style approximate percentiles, and exact heavy hitters
via the mergeable Misra-Gries candidate pass + exact verification join.

The correctness model for approximations: the oracle states the EXACT
answer plus a literal TRUE tolerance flag; the Spark side computes both
the sketch and the exact value and emits whether the sketch landed within
tolerance. A sketch regression (or a tolerance lie) breaks the hash match
— so the approximate path is gated as strictly as the exact ones.

Scale notes (100 TB):
- approx_distinct_audit: HLL partials merge associatively — one map-side
  sketch per partition, tiny shuffle payload, no giant distinct shuffle.
- approx_percentile_audit: percentile_approx's quantile summary is
  mergeable bounded state; the exact `percentile` companion is the
  test-SF referee only (its value buffer is the thing being replaced).
- heavy_hitters_mg: the two-phase exact-top-frequency pattern — a
  capacity-bounded Misra-Gries pass per partition (mergeable, O(CAP)
  state, guaranteed superset of every key with freq > n/CAP), then an
  exact count of the ≤ CAP·partitions candidates via broadcast semi-join.
  Output is EXACT despite constant memory — the pattern that makes
  "top offending keys" tractable when a full groupBy would blow the
  shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

# --- HyperLogLog distinct-count audit ---------------------------------------
_ADC_COLS = ("l_partkey", "l_suppkey", "l_orderkey")


@query(
    "approx_distinct_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, count(DISTINCT {c}) AS n_exact,
            TRUE AS within_5pct FROM lineitem"""
        for c in _ADC_COLS
    ),
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ (rsd 2%) vs exact distinct per key column, emitting whether
    the sketch landed within 5% — the mergeable-sketch path that replaces
    count(DISTINCT) when the distinct shuffle stops fitting. One scan,
    both estimates per column, melted via stack. (rsd buys sketch size:
    0.5% needed a ~10 MiB task binary; 2% is a few KiB per column.)"""
    li = load_table(spark, sf_dir, "lineitem")
    # two 1-row aggregations, cross-joined: mixing the HLL sketches into
    # the same Aggregate as the multi-column countDistinct makes Catalyst
    # plan ALL of it through the distinct-Expand (4 streams x fact rows,
    # sketches re-evaluated per expanded row) — measured 4.9s combined vs
    # 0.95s + 0.66s split at sf0.1 (optimization r07, guide §1.1/§2.4)
    wide_a = li.agg(
        *[F.approx_count_distinct(c, 0.02).alias(f"a_{c}") for c in _ADC_COLS]
    )
    wide_e = li.agg(*[F.countDistinct(c).alias(f"e_{c}") for c in _ADC_COLS])
    wide = wide_a.crossJoin(wide_e)
    stack = ", ".join(f"'{c}', a_{c}, e_{c}" for c in _ADC_COLS)
    return wide.select(
        F.expr(f"stack({len(_ADC_COLS)}, {stack}) AS (col_name, a, n_exact)")
    ).select(
        "col_name",
        "n_exact",
        # Oracle pins TRUE ⇒ asserted accuracy invariant, deterministic
        # under pinned pyspark==4.1.2 HLL++ (see rollup_distinct_hll_audit).
        (F.abs(F.col("a") - F.col("n_exact")) * 20 <= F.col("n_exact")).alias(
            "within_5pct"
        ),
    )


# --- approximate percentile audit -------------------------------------------
_QS = (0.25, 0.5, 0.75, 0.9)


@query(
    "approx_percentile_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT CAST({q} AS DOUBLE) AS q,
            quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), {q})
              AS cents_exact,
            TRUE AS within_1pct FROM orders"""
        for q in _QS
    ),
)
def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (mergeable quantile summary, accuracy 10000) vs
    the exact interpolated percentile over order cents, per quantile, with
    a 1% relative-error contract. The exact companion is the referee; at
    100 TB only the sketch runs (its state is bounded by the accuracy
    parameter, not the data)."""
    orders = load_table(spark, sf_dir, "orders")
    qlist = "array(" + ", ".join(f"{q}D" for q in _QS) + ")"
    cents = N.spark_fround_int("o_totalprice * 100")
    wide = orders.agg(
        F.expr(f"percentile_approx({cents}, {qlist}, 10000)").alias("apx"),
        F.expr(f"percentile({cents}, {qlist})").alias("exact"),
    )
    z = wide.select(
        F.posexplode(F.arrays_zip(F.col("apx"), F.col("exact"))).alias("i", "z")
    )
    return z.select(
        F.element_at(F.array(*[F.lit(float(q)) for q in _QS]), F.col("i") + 1).alias(
            "q"
        ),
        F.col("z.exact").alias("cents_exact"),
        (
            F.abs(F.col("z.apx").cast("double") - F.col("z.exact"))
            <= F.col("z.exact") * 0.01
        ).alias("within_1pct"),
    )


# --- exact heavy hitters via Misra-Gries candidates + verify ----------------
_MG_CAP = 200  # candidate capacity == 1/phi (phi = 1/200 frequency threshold)


def _mg_partials(batches):
    """Per-partition mergeable Misra-Gries summary over the `pk` column:
    capacity-bounded counters; when full, subtract the (CAP+1)-th largest
    count from all and drop non-positives (total decrement ≤ n_p/(CAP+1),
    so every key with partition count > n_p/CAP survives)."""
    counters = pd.Series(dtype="int64")
    for pdf in batches:
        batch = pdf["pk"].value_counts()
        counters = counters.add(batch, fill_value=0)
        if len(counters) > _MG_CAP:
            m = counters.nlargest(_MG_CAP + 1).iloc[-1]
            counters = counters - m
            counters = counters[counters > 0]
    yield pd.DataFrame({"pk": counters.index.astype("int64")})


# The fixture keys are near-uniform (no key reaches a 1/200 share), so the
# heavy-hitter stream derives a deterministically SKEWED key: a third of
# rows collapse onto 7 hot keys (~4.8% share each), the rest spread over
# the ~2000-key part domain (~0.03% each) — hot keys clear the threshold,
# the tail exercises the MG decrement path (domain >> CAP).
_SKEW_KEY_SQL = (
    "CASE WHEN l_orderkey % 3 = 0 THEN l_partkey % 7 "
    "ELSE l_partkey + 100 END"
)


@query(
    "heavy_hitters_mg",
    oracle=f"""
    WITH keyed AS (SELECT {_SKEW_KEY_SQL} AS pk FROM lineitem)
    SELECT pk, count(*) AS n
    FROM keyed GROUP BY pk
    HAVING count(*) * 200 > (SELECT count(*) FROM keyed)
    """,
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All keys with frequency > n/200, EXACTLY, in constant executor
    memory: a Misra-Gries candidate pass per partition (mapInPandas,
    ≤ {cap} counters — guaranteed to retain every true heavy hitter), then
    an exact count restricted to the candidate set via broadcast semi-join
    and the strict HAVING threshold. The full groupBy the oracle runs is
    exactly what this pattern avoids at scale — candidates are
    ≤ CAP·partitions keys however large the key domain is.""".format(
        cap=_MG_CAP
    )
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.expr(_SKEW_KEY_SQL).alias("pk"))
    cands = keys.mapInPandas(_mg_partials, "pk bigint").distinct()
    n_total = li.agg(F.count("*").alias("n_total"))
    return (
        keys.join(F.broadcast(cands), "pk", "left_semi")
        .groupBy("pk")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("n") * _MG_CAP > F.col("n_total"))
        .select("pk", "n")
    )


# --- Neyman-allocation stratified sampling ------------------------------------
# Variance-optimal survey sampling (Neyman 1934): sample n_h ∝ N_h·S_h rows
# from stratum h — the allocation that minimizes the estimator variance of a
# stratified mean at a fixed total budget. The training-mix use: spend a
# labeling/eval budget where the target variable is most dispersed instead of
# uniformly or proportionally.
from .dedup import _h_spark, _h_sql  # noqa: E402  (portable md5 hash)

_NEY_TARGET = 1000
_NEY_M = 1_000_000
_NEY_KEY = "concat_ws(':', 'ney', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))"


@query(
    "stratified_sample_neyman",
    oracle=f"""
    WITH proj AS (
      SELECT l_returnflag AS stratum, {N.sql_iscaled('l_extendedprice', 2)} AS i,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    st AS (
      SELECT stratum, count(*) AS n_rows, sum(i) AS s,
             {N.sql_isum_items('i * i', 'ss')}
      FROM proj GROUP BY stratum
    ),
    sw0 AS (
      SELECT stratum, n_rows,
             round(sqrt(greatest({N.sql_isum_value('ss', 4)} / n_rows
                   - (CAST(s AS DOUBLE) / 100.0 / n_rows)
                   * (CAST(s AS DOUBLE) / 100.0 / n_rows), 0.0)), 6) AS s_h
      FROM st
    ),
    sw AS (
      SELECT stratum, n_rows, s_h,
             CAST(round(s_h * {_NEY_M}.0, 0) AS DECIMAL(38,0))
               * CAST(n_rows AS DECIMAL(38,0)) AS w
      FROM sw0
    ),
    tot AS (SELECT sum(w) AS w_tot, CAST(sum(n_rows) AS DOUBLE) AS nt FROM sw),
    alloc AS (
      SELECT stratum, n_rows, s_h,
             CASE WHEN w_tot > 0
                  THEN CAST(round({_NEY_TARGET}.0 * CAST(w AS DOUBLE)
                                  / CAST(w_tot AS DOUBLE), 0) AS BIGINT)
                  ELSE CAST(round({_NEY_TARGET}.0 * n_rows / nt, 0) AS BIGINT)
             END AS n_target
      FROM sw, tot
    ),
    kept AS (
      SELECT p.stratum, count(*) AS n_sampled
      FROM proj p JOIN alloc a USING (stratum)
      WHERE {_h_sql(_NEY_KEY)} % {_NEY_M}
            < least(CAST(round({_NEY_M}.0 * a.n_target / a.n_rows, 0) AS BIGINT),
                    {_NEY_M})
      GROUP BY p.stratum
    )
    SELECT a.stratum, a.n_rows, a.s_h, a.n_target,
           CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM alloc a LEFT JOIN kept k USING (stratum)
    """,
)
def stratified_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample of lineitem (strata = returnflag,
    budget 1000 rows): per-stratum size and EXACT population std from one
    integer-sufficient-statistics agg; allocation n_h ∝ N_h·S_h computed
    through exact DECIMAL weights (micro-scaled std × count — order-free,
    unlike a double sum); the draw is a hash-Bernoulli keep at rate
    n_h/N_h (state-free, partition/retry-independent — `sample()`'s
    seeded RNG guarantees none of that). Zero-variance corpora fall back
    to proportional allocation. Two fact scans (stats, then draw) is the
    honest cost of calibrated sampling; both are shuffle-light (one
    3-group agg; one broadcast join + filter + 3-group count). sqrt is
    IEEE-correctly-rounded on exact integer-sum inputs, so both engines
    see identical doubles before the 6dp round."""
    li = load_table(spark, sf_dir, "lineitem")
    proj = li.selectExpr(
        "l_returnflag AS stratum",
        f"{N.spark_iscaled('l_extendedprice', 2)} AS i",
        "l_orderkey",
        "l_linenumber",
    )
    st = proj.groupBy("stratum").agg(
        F.expr("count(*) AS n_rows"),
        F.expr("sum(i) AS s"),
        *[F.expr(e) for e in N.spark_isum_items("i * i", "ss")],
    )
    std = (
        f"sqrt(greatest({N.spark_isum_value('ss', 4)} / n_rows"
        " - (CAST(s AS DOUBLE) / 100.0 / n_rows)"
        " * (CAST(s AS DOUBLE) / 100.0 / n_rows), 0.0D))"
    )
    sw = st.selectExpr(
        "stratum", "n_rows", f"{N.spark_fround(std, 6)} AS s_h"
    ).selectExpr(
        "stratum",
        "n_rows",
        "s_h",
        f"CAST({N.spark_fround_int(f's_h * {_NEY_M}.0D')} AS DECIMAL(38,0))"
        " * CAST(n_rows AS DECIMAL(38,0)) AS w",
    )
    tot = sw.agg(
        F.expr("sum(w) AS w_tot"), F.expr("CAST(sum(n_rows) AS DOUBLE) AS nt")
    )
    alloc = sw.crossJoin(F.broadcast(tot)).selectExpr(
        "stratum",
        "n_rows",
        "s_h",
        f"""CASE WHEN w_tot > 0 THEN {N.spark_fround_int(
            f"{_NEY_TARGET}.0D * CAST(w AS DOUBLE) / CAST(w_tot AS DOUBLE)"
        )} ELSE {N.spark_fround_int(f"{_NEY_TARGET}.0D * n_rows / nt")} END
        AS n_target""",
    )
    thr = F.least(
        F.expr(N.spark_fround_int(f"{_NEY_M}.0D * n_target / n_rows")),
        F.lit(_NEY_M).cast("bigint"),
    )
    h = _h_spark(F.expr(_NEY_KEY.replace("VARCHAR", "STRING")))
    kept = (
        proj.join(F.broadcast(alloc.select("stratum", "n_rows", "n_target")), "stratum")
        .filter(h % _NEY_M < thr)
        .groupBy("stratum")
        .agg(F.count("*").alias("n_sampled"))
    )
    return alloc.join(kept, "stratum", "left").select(
        "stratum",
        "n_rows",
        "s_h",
        "n_target",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("bigint")).alias("n_sampled"),
    )


# --- join-explosion pre-flight audit ------------------------------------------
_JX_TOPK = 5


@query(
    "join_explosion_audit",
    oracle=f"""
    WITH f AS (
      SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_all,
             CAST(sum(CAST(n AS DECIMAL(38,0)) * n) AS DOUBLE) AS pairs_all
      FROM f
    ),
    top AS (
      SELECT CAST(k AS VARCHAR) AS key_label, n AS n_rows,
             CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) AS pair_rows
      FROM f ORDER BY n DESC, k ASC LIMIT {_JX_TOPK}
    )
    SELECT key_label, n_rows, pair_rows,
           round(pair_rows / (SELECT pairs_all FROM tot), 6) AS pair_share
    FROM top
    UNION ALL
    SELECT 'ALL', n_all, pairs_all, 1.0 FROM tot
    """,
)
def join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict a self-equi-join's output size BEFORE running it: the
    exact row count of lineitem x lineitem ON l_partkey is sum over keys
    of f(k)^2 — computable from the key histogram alone at a tiny
    fraction of the join's cost. Emits the total predicted pair count
    and the top-{k} offending keys with their share — the pre-flight a
    100 TB pipeline runs to choose broadcast/salt/abort instead of
    discovering the explosion as a 10-hour shuffle. One groupBy for the
    histogram; top keys via TakeOrderedAndProject; exact DECIMAL pair
    sums (f^2 overflows int64 once a key holds >3e9 rows).""".format(
        k=_JX_TOPK
    )
    li = load_table(spark, sf_dir, "lineitem")
    f = li.groupBy(F.col("l_partkey").alias("k")).agg(F.count("*").alias("n"))
    tot = f.agg(
        F.expr("CAST(sum(n) AS BIGINT) AS n_all"),
        F.expr("CAST(sum(CAST(n AS DECIMAL(38,0)) * n) AS DOUBLE) AS pairs_all"),
    )
    top = (
        f.orderBy(F.desc("n"), F.asc("k"))
        .limit(_JX_TOPK)
        .selectExpr(
            "CAST(k AS STRING) AS key_label",
            "n AS n_rows",
            "CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) AS pair_rows",
        )
    )
    top_shared = top.crossJoin(F.broadcast(tot)).select(
        "key_label",
        "n_rows",
        "pair_rows",
        F.round(F.col("pair_rows") / F.col("pairs_all"), 6).alias("pair_share"),
    )
    all_row = tot.select(
        F.lit("ALL").alias("key_label"),
        F.col("n_all").alias("n_rows"),
        F.col("pairs_all").alias("pair_rows"),
        F.lit(1.0).alias("pair_share"),
    )
    return top_shared.unionByName(all_row)


# --- df.stat.freqItems containment audit --------------------------------------
_FI_SUPPORT = 0.04  # the 7 hot keys hold ~4.8% each; tail keys ~0.03%


@query(
    "freq_items_audit",
    oracle=f"""
    WITH keyed AS (SELECT {_SKEW_KEY_SQL} AS pk FROM lineitem)
    SELECT pk, count(*) AS n, TRUE AS in_sketch
    FROM keyed GROUP BY pk
    HAVING count(*) > (SELECT count(*) FROM keyed) * {_FI_SUPPORT}
    """,
)
def freq_items_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in single-pass frequent-items sketch
    (``df.stat.freqItems``, the Karp-Schenker-Papadimitriou one-pass
    counter) under the verified-approximation contract: the sketch
    GUARANTEES a superset of every item above the support threshold, so
    the audit emits the exact over-threshold items with an in_sketch
    containment flag the oracle pins to TRUE — a sketch regression breaks
    the hash. Same two-phase shape as heavy_hitters_mg but exercising the
    engine's own implementation; the exact companion groupBy is the
    test-SF referee only."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(F.expr(_SKEW_KEY_SQL).alias("pk"))
    fi = keyed.stat.freqItems(["pk"], support=_FI_SUPPORT)  # 1-row array
    tot = keyed.agg(F.count("*").alias("n_total"))
    exact = (
        keyed.groupBy("pk")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("n_total") * _FI_SUPPORT)
    )
    return exact.crossJoin(F.broadcast(fi)).select(
        "pk",
        "n",
        F.array_contains(F.col("pk_freqItems"), F.col("pk")).alias("in_sketch"),
    )


# --- Count-Min Sketch heavy-key audit -----------------------------------------
# The third sketch family next to HLL (distinct) and Misra-Gries (candidates):
# a Count-Min Sketch (Cormode & Muthukrishnan 2005) answers point-frequency
# queries from D*W integers of mergeable state with one-sided error
# (estimate >= truth, overcount <= e/W * N w.p. 1 - e^-D per query). The
# 100 TB shape: the sketch build is ONE scan whose groupBy cardinality is
# bounded by D*W (4096 cells) after map-side combine — the per-partition
# partial aggregate IS the per-partition sketch and the shuffle moves only
# merged cells, never keys. The exact top-20 companion groupBy is the
# test-SF referee (exactly what the sketch replaces at scale).
_CMS_D = 4
_CMS_W = 512
_CMS_P = 2147483647
_CMS_A = (2654435761, 2246822519, 3266489917, 668265263)
_CMS_B = (1013904223, 1664525, 374761393, 2654435769)


def _cms_bucket(j: int, key: str) -> str:
    # key reduced mod P first so (k%P)*A stays under 2^63 however large the
    # key domain grows at scale; all-bigint arithmetic, identical text in
    # both engines (both follow dividend-sign %, inputs all non-negative).
    return (
        f"(((({key}) % {_CMS_P}) * {_CMS_A[j]} + {_CMS_B[j]})"
        f" % {_CMS_P}) % {_CMS_W}"
    )


_CMS_TOPK = 20


@query(
    "heavy_hitters_cms",
    oracle=f"""
    WITH keyed AS (SELECT {_SKEW_KEY_SQL} AS pk FROM lineitem),
    cells AS (
      SELECT d, bucket, count(*) AS cell_n FROM (
        {" UNION ALL ".join(
            f"SELECT {j} AS d, {_cms_bucket(j, 'pk')} AS bucket FROM keyed"
            for j in range(_CMS_D))}
      ) GROUP BY d, bucket
    ),
    exact AS (
      SELECT pk, count(*) AS n_exact,
             row_number() OVER (ORDER BY count(*) DESC, pk ASC) AS rk
      FROM keyed GROUP BY pk
    ),
    top AS (SELECT pk, n_exact FROM exact WHERE rk <= {_CMS_TOPK}),
    probes AS (
      {" UNION ALL ".join(
          f"SELECT pk, n_exact, {j} AS d, {_cms_bucket(j, 'pk')} AS bucket FROM top"
          for j in range(_CMS_D))}
    )
    SELECT p.pk, p.n_exact,
           min(c.cell_n) AS n_est,
           min(c.cell_n) - p.n_exact AS overcount
    FROM probes p JOIN cells c USING (d, bucket)
    GROUP BY p.pk, p.n_exact
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point-frequency audit over the skewed key domain:
    build a {d}x{w} CMS in one scan (stack to (depth, bucket) pairs, map-
    side-combined groupBy bounded at {d}*{w} cells), then probe it for the
    exact top-{k} keys and emit estimate, truth, and the (always >= 0)
    overcount — all-integer arithmetic, so the audit is bit-deterministic
    and a sketch regression breaks the driver hash. The exact companion
    groupBy exists only as the test-SF referee; at 100 TB the sketch (a
    4 KiB mergeable state) replaces it for point lookups.""".format(
        d=_CMS_D, w=_CMS_W, k=_CMS_TOPK
    )
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(F.expr(_SKEW_KEY_SQL).alias("pk"))

    stack_cells = ", ".join(
        f"{j}L, CAST({_cms_bucket(j, 'pk')} AS BIGINT)" for j in range(_CMS_D)
    )
    cells = (
        keyed.selectExpr(f"stack({_CMS_D}, {stack_cells}) AS (d, bucket)")
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cell_n"))
    )

    exact = keyed.groupBy("pk").agg(F.count("*").alias("n_exact"))
    # Deterministic top-20 via TakeOrderedAndProject (per-partition top-K
    # merged at the driver) — never an unpartitioned row_number window over
    # the full key domain, which would single-partition at scale.
    top = exact.orderBy(F.col("n_exact").desc(), F.col("pk").asc()).limit(
        _CMS_TOPK
    )
    probes = top.selectExpr(
        "pk",
        "n_exact",
        f"stack({_CMS_D}, {stack_cells}) AS (d, bucket)",
    )
    return (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("pk", "n_exact")
        .agg(
            F.min("cell_n").alias("n_est"),
            (F.min("cell_n") - F.col("n_exact")).alias("overcount"),
        )
    )


# --- actionable skew-salting plan ---------------------------------------------
# key_skew_audit/key_skew_gini DETECT skew; this op emits the PLAN a shuffle
# planner consumes: for every key whose group exceeds the target bucket size
# (n/200, the same threshold family as heavy_hitters_mg), the salt factor
# ceil(n_k/target) that splits it into near-target sub-buckets, and the
# resulting worst bucket. Pure integer arithmetic end to end.
@query(
    "skew_salt_plan",
    oracle=f"""
    WITH keyed AS (SELECT {_SKEW_KEY_SQL} AS pk FROM lineitem),
    tot AS (
      SELECT greatest(count(*) // 200, 1) AS target,
             CAST(count(*) AS BIGINT) AS n_total
      FROM keyed
    ),
    hist AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM keyed GROUP BY pk)
    SELECT pk, n,
           CAST((n + target - 1) // target AS BIGINT) AS salt_factor,
           CAST((n + (n + target - 1) // target - 1)
                // ((n + target - 1) // target) AS BIGINT) AS bucket_after,
           CAST(target AS BIGINT) AS target_bucket
    FROM hist, tot
    WHERE n > target
    """,
)
def skew_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting plan for the skewed join/agg key domain: every key whose
    group exceeds the n/200 target bucket gets salt_factor =
    ceil(n_k/target) (append salt = hash(row) % factor to the key on the
    big side, explode the small side by factor), and the plan reports the
    post-salt worst bucket ceil(n_k/factor) — by construction ≤ target
    + 1 residue. This is the DECISION artifact the salted-join operators
    (join_salted_skew, dedup_minhash_salted) consume as a constant; here
    it is computed from the data so the choice is auditable.

    Scale shape: one map-side-combined histogram groupBy (cardinality =
    key domain), one scalar broadcast; integer arithmetic only."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(F.expr(_SKEW_KEY_SQL).alias("pk"))
    tot = keyed.agg(
        F.expr("greatest(count(*) div 200, 1) AS target"),
        F.expr("CAST(count(*) AS BIGINT) AS n_total"),
    )
    hist = keyed.groupBy("pk").agg(F.count("*").cast("bigint").alias("n"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("target"))
        .selectExpr(
            "pk",
            "n",
            "CAST((n + target - 1) div target AS BIGINT) AS salt_factor",
            "CAST((n + (n + target - 1) div target - 1)"
            " div ((n + target - 1) div target) AS BIGINT) AS bucket_after",
            "CAST(target AS BIGINT) AS target_bucket",
        )
    )


# --- HLL audience-overlap audit (inclusion-exclusion on sketches) -------------
_OVL_CUT = "1996-01-01"


@query(
    "approx_overlap_audit",
    oracle=f"""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate < TIMESTAMP '{_OVL_CUT}'),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '{_OVL_CUT}'),
    i AS (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b),
    u AS (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
           (SELECT CAST(count(*) AS BIGINT) FROM i) AS n_intersect,
           (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_union,
           TRUE AS within_10pct
    """,
)
def approx_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from mergeable sketches: |A∩B| ≈
    HLL(A) + HLL(B) − HLL(A∪B) (inclusion-exclusion — sketches cannot
    intersect directly), audited against the exact overlap of early
    (< {cut}) vs late customer cohorts with a 10% contract the oracle
    pins TRUE. The verified-approximation shape of this module: at
    100 TB only the three HLLs run (each a map-side mergeable few-KiB
    state); the exact distinct/INTERSECT companions are the test-SF
    referee. Error note: inclusion-exclusion DIFFERENCES the sketch
    errors, so the relative error on a small intersection can far exceed
    the per-sketch rsd — the cohorts here overlap heavily on purpose,
    which is exactly when the estimator is usable.""".format(cut=_OVL_CUT)
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(_OVL_CUT).cast("timestamp_ntz")
    a = orders.filter(F.col("o_orderdate") < cut).select("o_custkey")
    b = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    u = a.unionByName(b)
    est = (
        a.agg(F.approx_count_distinct("o_custkey", 0.02).alias("ea"))
        .crossJoin(
            F.broadcast(
                b.agg(F.approx_count_distinct("o_custkey", 0.02).alias("eb"))
            )
        )
        .crossJoin(
            F.broadcast(
                u.agg(F.approx_count_distinct("o_custkey", 0.02).alias("eu"))
            )
        )
    )
    exact = (
        a.distinct()
        .agg(F.count("*").cast("bigint").alias("n_a"))
        .crossJoin(
            F.broadcast(b.distinct().agg(F.count("*").cast("bigint").alias("n_b")))
        )
        .crossJoin(
            F.broadcast(
                a.distinct()
                .join(b.distinct(), "o_custkey", "left_semi")
                .agg(F.count("*").cast("bigint").alias("n_intersect"))
            )
        )
        .crossJoin(
            F.broadcast(
                u.distinct().agg(F.count("*").cast("bigint").alias("n_union"))
            )
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_a",
        "n_b",
        "n_intersect",
        "n_union",
        # Oracle pins TRUE ⇒ asserted accuracy invariant (see the
        # rollup_distinct_hll_audit note): deterministic under the pinned
        # pyspark==4.1.2 HLL++; a flip after a Spark upgrade is a real
        # accuracy regression, not a parity artifact (ADVICE r6).
        (
            F.abs(
                (F.col("ea") + F.col("eb") - F.col("eu")).cast("double")
                - F.col("n_intersect").cast("double")
            )
            * 10.0
            <= F.col("n_intersect").cast("double")
        ).alias("within_10pct"),
    )
