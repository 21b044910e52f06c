"""ML preprocessing operators (SURVEY.md §2.9 M1-M11) — fit-on-train /
transform-both semantics, expressed relationally.

Each "fit" is an aggregation over the train split producing a tiny parameter
frame (means/medians/modes/quantiles/codes) that is broadcast-joined back —
exactly how a Spark pipeline distributes sklearn's fit/transform split. The
spark.ml Estimator forms (Imputer, StandardScaler, StringIndexer, PCA) live
in ``operators/ml_ops.py``; these queries are the oracle-checkable SQL
equivalents.

Train/test here = deterministic key-modulo split (seeded-random splits can't
be reproduced in two engines; see metrics.split_modk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions import numeric as N
from ..operators.bounded_seq import dense_codes
from ..operators.rank_ops import mean_ranks
from ..registry import query
from ..sources import load_table

# shared: lineitem with injected nulls + split tag
_BASE_SQL = """
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 5 = 4 THEN 'test' ELSE 'train' END AS split,
         CASE WHEN l_linenumber % 7 = 0 THEN NULL ELSE l_quantity END AS q,
         CASE WHEN l_linenumber % 9 = 0 THEN NULL ELSE l_returnflag END AS flag
  FROM lineitem
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 5 == 4, "test").otherwise("train").alias("split"),
        F.when(F.col("l_linenumber") % 7 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("q"),
        F.when(F.col("l_linenumber") % 9 == 0, None)
        .otherwise(F.col("l_returnflag"))
        .alias("flag"),
    )


# --- M1: mean imputation (teamProject/sap.py:94) ----------------------------
@query(
    "impute_mean",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    fit AS (SELECT {N.sql_davg('q')} AS fill FROM base WHERE split = 'train'),
    filled AS (
      SELECT base.split, coalesce(base.q, fit.fill) AS qf,
             CAST(base.q IS NULL AS BIGINT) AS was_null
      FROM base CROSS JOIN fit
    )
    SELECT split,
           round(CAST(sum(CAST(qf AS DECIMAL(25,10))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_filled,
           CAST(sum(was_null) AS BIGINT) AS n_imputed
    FROM filled GROUP BY split
    """,
)
def impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    fit = base.filter(F.col("split") == "train").agg(N.davg("q").alias("fill"))
    filled = base.crossJoin(F.broadcast(fit)).select(
        "split",
        F.coalesce("q", "fill").alias("qf"),
        F.col("q").isNull().cast("bigint").alias("was_null"),
    )
    return filled.groupBy("split").agg(
        F.round(
            F.sum(F.col("qf").cast("decimal(25,10)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_filled"),
        F.sum("was_null").alias("n_imputed"),
    )


# --- M2: median imputation (legacy/modeling.py:127-129) ---------------------
@query(
    "impute_median",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    fit AS (SELECT quantile_cont(q, 0.5) AS fill FROM base WHERE split = 'train'),
    filled AS (
      SELECT base.split, coalesce(base.q, fit.fill) AS qf,
             CAST(base.q IS NULL AS BIGINT) AS was_null
      FROM base CROSS JOIN fit
    )
    SELECT split,
           round(CAST(sum(CAST(qf AS DECIMAL(25,10))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_filled,
           CAST(sum(was_null) AS BIGINT) AS n_imputed
    FROM filled GROUP BY split
    """,
)
def impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-median fill (pandas median is exact interpolated — matching it
    requires percentile, not percentile_approx; at 100 TB switch to approx
    and accept the reference-divergence, or bucket-exact median)."""
    base = _base(spark, sf_dir)
    fit = base.filter(F.col("split") == "train").agg(
        F.expr("percentile(q, 0.5)").alias("fill")
    )
    filled = base.crossJoin(F.broadcast(fit)).select(
        "split",
        F.coalesce("q", "fill").alias("qf"),
        F.col("q").isNull().cast("bigint").alias("was_null"),
    )
    return filled.groupBy("split").agg(
        F.round(
            F.sum(F.col("qf").cast("decimal(25,10)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_filled"),
        F.sum("was_null").alias("n_imputed"),
    )


# --- M3: mode imputation, smallest-value ties (legacy/modeling.py:113-122) --
@query(
    "impute_mode",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    fit AS (
      SELECT flag AS fill FROM base
      WHERE split = 'train' AND flag IS NOT NULL
      GROUP BY flag ORDER BY count(*) DESC, flag ASC LIMIT 1
    ),
    filled AS (
      SELECT base.split, coalesce(base.flag, fit.fill) AS ff
      FROM base CROSS JOIN fit
    )
    SELECT split, ff AS value, count(*) AS n
    FROM filled GROUP BY split, ff
    """,
)
def impute_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas mode() tie-break = smallest value first — ORDER BY count DESC,
    value ASC replicates it deterministically."""
    base = _base(spark, sf_dir)
    fit = (
        base.filter((F.col("split") == "train") & F.col("flag").isNotNull())
        .groupBy("flag")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("flag"))
        .limit(1)
        .select(F.col("flag").alias("fill"))
    )
    filled = base.crossJoin(F.broadcast(fit)).select(
        "split", F.coalesce("flag", "fill").alias("ff")
    )
    return filled.groupBy("split", F.col("ff").alias("value")).agg(
        F.count("*").alias("n")
    )


# --- M4: standard scaling (teamProject/utils/preprocessing.py:64-65) --------
@query(
    "scale_standard",
    oracle=f"""
    WITH fit AS (
      SELECT {N.sql_davg('l_extendedprice')} AS m, {N.sql_dstd('l_extendedprice')} AS s
      FROM lineitem
    ),
    z AS (
      SELECT l.l_returnflag, (l.l_extendedprice - fit.m) / fit.s AS z
      FROM lineitem l CROSS JOIN fit
    )
    SELECT l_returnflag,
           round(CAST(sum(CAST(z AS DECIMAL(25,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_z,
           round(min(z), 6) AS min_z, round(max(z), 6) AS max_z
    FROM z GROUP BY l_returnflag
    """,
)
def scale_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fit = li.agg(
        N.davg("l_extendedprice").alias("m"), N.dstd("l_extendedprice").alias("s")
    )
    z = li.crossJoin(F.broadcast(fit)).select(
        "l_returnflag",
        ((F.col("l_extendedprice") - F.col("m")) / F.col("s")).alias("z"),
    )
    return z.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("z").cast("decimal(25,12)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_z"),
        F.round(F.min("z"), 6).alias("min_z"),
        F.round(F.max("z"), 6).alias("max_z"),
    )


# --- M5: robust scaling (teamProject/utils/preprocessing.py:7) --------------
@query(
    "scale_robust",
    oracle="""
    WITH fit AS (
      SELECT quantile_cont(l_extendedprice, 0.5) AS med,
             quantile_cont(l_extendedprice, 0.75)
               - quantile_cont(l_extendedprice, 0.25) AS iqr
      FROM lineitem
    ),
    z AS (
      SELECT l.l_returnflag, (l.l_extendedprice - fit.med) / fit.iqr AS z
      FROM lineitem l CROSS JOIN fit
    )
    SELECT l_returnflag,
           round(CAST(sum(CAST(z AS DECIMAL(25,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_z,
           round(min(z), 6) AS min_z, round(max(z), 6) AS max_z
    FROM z GROUP BY l_returnflag
    """,
)
def scale_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one array-percentile aggregate instead of three scalar ones (the
    # exact percentile buffer is built and merged ONCE — 8.4s -> 3.0s at
    # sf0.1), fed per-DISTINCT-VALUE counts via percentile's frequency
    # argument: the buffer is itself a value→count map, so the map-side
    # combined pre-count collapses fact rows before the buffer merge
    # (2.3s -> 1.5s fit; bit-identical quantiles — optimization r07,
    # guide §2.3)
    fit = (
        li.groupBy("l_extendedprice")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.expr(
                "percentile(l_extendedprice,"
                " array(0.25D, 0.5D, 0.75D), cnt)"
            ).alias("q")
        )
        .select(
            F.col("q")[1].alias("med"),
            (F.col("q")[2] - F.col("q")[0]).alias("iqr"),
        )
    )
    z = li.crossJoin(F.broadcast(fit)).select(
        "l_returnflag",
        ((F.col("l_extendedprice") - F.col("med")) / F.col("iqr")).alias("z"),
    )
    return z.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("z").cast("decimal(25,12)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_z"),
        F.round(F.min("z"), 6).alias("min_z"),
        F.round(F.max("z"), 6).alias("max_z"),
    )


# --- M6: power transform, fixed λ (qda_single_model_search.py:69-71) --------
@query(
    "scale_power",
    oracle="""
    WITH yj AS (
      SELECT l_returnflag,
             round((pow(l_quantity + 1.0, 0.5) - 1.0) / 0.5, 8) AS y
      FROM lineitem
    )
    SELECT l_returnflag,
           round(CAST(sum(CAST(y AS DECIMAL(25,8))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_y,
           round(min(y), 6) AS min_y, round(max(y), 6) AS max_y
    FROM yj GROUP BY l_returnflag
    """,
)
def scale_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yeo-Johnson for x≥0 at fixed λ=0.5: ((x+1)^λ − 1)/λ. The λ MLE fit is
    a driver-side 1-D optimization over decimal-summed log-likelihood terms
    (operators/ml_ops.py); the transform itself is pure Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    y = N.fround((F.pow(F.col("l_quantity") + 1.0, F.lit(0.5)) - 1.0) / 0.5, 8)
    yj = li.select("l_returnflag", y.alias("y"))
    return yj.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("y").cast("decimal(25,8)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_y"),
        F.round(F.min("y"), 6).alias("min_y"),
        F.round(F.max("y"), 6).alias("max_y"),
    )


# --- M7: quantile (ECDF) transform (qda_single_model_search.py:73-76) -------
@query(
    "scale_quantile",
    oracle="""
    WITH e AS (
      SELECT l_returnflag,
             (rank() OVER (ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0)
               / count(*) OVER () AS u
      FROM lineitem
    )
    SELECT l_returnflag,
           round(CAST(sum(CAST(u AS DECIMAL(25,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_u,
           round(min(u), 6) AS min_u, round(max(u), 6) AS max_u
    FROM e GROUP BY l_returnflag
    """,
)
def scale_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuantileTransformer(uniform) ≡ mean-rank ECDF. u = mean_rank/n per
    DISTINCT value (bucketed ``mean_ranks`` — no row-level window). The
    group mean replicates the oracle's per-row DECIMAL(25,12) rounding by
    multiplying each value's rounded u by its multiplicity in exact decimal
    (25,12 × 10,0 → 36,12 product, no precision loss)."""
    li = load_table(spark, sf_dir, "lineitem")
    xg = li.select(
        F.col("l_quantity").alias("x"), F.col("l_returnflag").alias("grp")
    )
    ranks = mean_ranks(xg, "x")
    tot = ranks.agg(F.sum("cnt").alias("nn"))
    umap = ranks.crossJoin(F.broadcast(tot)).select(
        "x", (F.col("r_avg") / F.col("nn")).alias("u")
    )
    cg = xg.groupBy("x", "grp").agg(F.count("*").alias("c"))
    e = cg.join(umap, "x")
    term = F.col("u").cast("decimal(25,12)") * F.col("c").cast("decimal(10,0)")
    return e.groupBy(F.col("grp").alias("l_returnflag")).agg(
        F.round(
            F.sum(term).cast("double") / F.sum("c").cast("double"), 6
        ).alias("mean_u"),
        F.round(F.min("u"), 6).alias("min_u"),
        F.round(F.max("u"), 6).alias("max_u"),
    )


# --- M8: label encoding (wine…03….ipynb:1474-1477) --------------------------
@query(
    "encode_label",
    oracle="""
    SELECT c_mktsegment AS value,
           CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INT) AS code
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def encode_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sklearn LabelEncoder = sorted-distinct → contiguous codes (StringIndexer
    with alphabetDesc ordering differs; this matches the reference exactly)."""
    cust = load_table(spark, sf_dir, "customer").select("c_mktsegment")
    return dense_codes(cust, "c_mktsegment").select(
        F.col("c_mktsegment").alias("value"), "code"
    )


# --- M9: categorical codes fit-on-train, unknown→NULL (lightgbm_model.py:50-62)
@query(
    "encode_cat_int",
    oracle="""
    WITH train AS (SELECT p_brand FROM part WHERE p_partkey % 4 <> 0),
    codes AS (
      SELECT p_brand AS value,
             CAST(dense_rank() OVER (ORDER BY p_brand) - 1 AS INT) AS code
      FROM (SELECT DISTINCT p_brand FROM train)
    )
    SELECT t.p_brand AS value, c.code, count(*) AS n_test
    FROM (SELECT p_brand FROM part WHERE p_partkey % 4 = 0) t
    LEFT JOIN codes c ON t.p_brand = c.value
    GROUP BY t.p_brand, c.code
    """,
)
def encode_cat_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    train = part.filter(F.col("p_partkey") % 4 != 0).select("p_brand")
    codes = dense_codes(train, "p_brand").select(
        F.col("p_brand").alias("value"), "code"
    )
    test = part.filter(F.col("p_partkey") % 4 == 0).select("p_brand")
    return (
        test.join(F.broadcast(codes), test.p_brand == codes.value, "left")
        .groupBy(F.col("p_brand").alias("value"), "code")
        .agg(F.count("*").alias("n_test"))
    )


# --- feature hashing (the hashing trick): fixed-width categorical encoding
_HASH_BUCKETS = 64


@query(
    "encode_hash_trick",
    oracle=f"""
    WITH cat AS (
      SELECT c.c_custkey,
             concat(c.c_mktsegment, '#', n.n_name) AS category
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    hashed AS (
      SELECT category,
             CAST(concat('0x', substring(md5(category), 1, 15)) AS BIGINT)
               % {_HASH_BUCKETS} AS bucket
      FROM cat
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT category) AS BIGINT) AS n_categories,
           CAST(count(DISTINCT category) > 1 AS INT) AS has_collision
    FROM hashed GROUP BY bucket
    """,
)
def encode_hash_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical values map to a fixed bucket space
    via a stateless hash — no fitted vocabulary, no driver-side code table,
    no unseen-category failure mode, which is why it is THE categorical
    encoder that survives 100 TB (spark.ml FeatureHasher is this operator;
    the md5-derived integer here keeps the bucket arithmetic identical in
    both engines). Output audits the collision profile per bucket — the
    dimensioning decision a production pipeline monitors."""
    from .dedup import _h_spark

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cat = customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
    ).select(F.concat_ws("#", "c_mktsegment", "n_name").alias("category"))
    hashed = cat.select(
        "category", (_h_spark(F.col("category")) % _HASH_BUCKETS).alias("bucket")
    )
    return hashed.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("category").alias("n_categories"),
        (F.countDistinct("category") > 1).cast("int").alias("has_collision"),
    )


# --- M10: correlation-based pruning (teamProject/utils/preprocessing.py:110-137)
_M10_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_M10_PAIRS = [
    (a, b) for i, a in enumerate(_M10_COLS) for b in _M10_COLS[i + 1 :]
]
_M10_TAU = 0.003


@query(
    "prune_corr",
    oracle="WITH s AS (SELECT "
    + ", ".join(
        f"{N.sql_dcorr(a, b)} AS c_{i}" for i, (a, b) in enumerate(_M10_PAIRS)
    )
    + " FROM lineitem) SELECT col_x, col_y, corr_xy, "
    + f"CASE WHEN abs(corr_xy) > {_M10_TAU} THEN col_y END AS dropped FROM ("
    + " UNION ALL ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, c_{i} AS corr_xy FROM s"
        for i, (a, b) in enumerate(_M10_PAIRS)
    )
    + ")",
)
def prune_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle |corr|>τ scan; the LATER column of each hot pair is
    dropped (keep-first-occurrence order, replicating the reference's
    np.triu scan). τ tuned to the fixture's correlation range.

    Sufficient statistics via the corr_matrix integer-lane machinery
    (optimization r07, guide §1.2): the per-pair dcorr form repeated
    every marginal decimal sum per pair and ran 4 decimal squares + 6
    decimal cross-products per row — the scaled-bigint lanes compute the
    same exact sums (2dp inputs are exact at scale 100; products exact at
    10^4) and the assembled round-6 Pearson is the identical formula on
    identical values (2.3s → 0.6s at sf0.1; parity re-verified at
    sf0.001 + sf0.01 + sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = list(_M10_COLS)
    proj = li.selectExpr(
        *[f"{N.spark_iscaled(c, 2)} AS i_{c}" for c in cols]
    )
    aggs = ["count(*) AS n_raw"]
    for c in cols:
        aggs.append(f"sum(i_{c}) AS s_{c}")
        aggs += N.spark_isum_items(f"i_{c} * i_{c}", f"ss_{c}")
    for i, (a, b) in enumerate(_M10_PAIRS):
        aggs += N.spark_isum_items(f"i_{a} * i_{b}", f"sp_{i}")
    one = proj.agg(F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]])
    vals = ["CAST(n_raw AS DOUBLE) AS n"]
    for c in cols:
        vals.append(f"(CAST(s_{c} AS DOUBLE) / 100.0) AS sx_{c}")
        vals.append(f"{N.spark_isum_value(f'ss_{c}', 4)} AS ss_v_{c}")
    for i, (a, b) in enumerate(_M10_PAIRS):
        vals.append(f"{N.spark_isum_value(f'sp_{i}', 4)} AS sp_v_{i}")
    v = one.selectExpr(*vals)
    agg = v.selectExpr(
        *[
            f"round((n * sp_v_{i} - sx_{a} * sx_{b}) / "
            f"sqrt((n * ss_v_{a} - sx_{a} * sx_{a}) "
            f"* (n * ss_v_{b} - sx_{b} * sx_{b})), 6) AS c_{i}"
            for i, (a, b) in enumerate(_M10_PAIRS)
        ]
    )
    stack = ", ".join(f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(_M10_PAIRS))
    long = agg.selectExpr(
        f"stack({len(_M10_PAIRS)}, {stack}) AS (col_x, col_y, corr_xy)"
    )
    return long.select(
        "col_x",
        "col_y",
        "corr_xy",
        F.when(F.abs("corr_xy") > _M10_TAU, F.col("col_y")).alias("dropped"),
    )


# --- M11: categorical detection from schema/metadata (legacy:86-100) --------
@query(
    "infer_categorical",
    oracle="""
    SELECT * FROM (VALUES
      ('l_orderkey', 'bigint', FALSE), ('l_partkey', 'bigint', FALSE),
      ('l_suppkey', 'bigint', FALSE), ('l_linenumber', 'int', FALSE),
      ('l_quantity', 'double', FALSE), ('l_extendedprice', 'double', FALSE),
      ('l_discount', 'double', FALSE), ('l_tax', 'double', FALSE),
      ('l_returnflag', 'string', TRUE), ('l_linestatus', 'string', TRUE),
      ('l_shipdate', 'timestamp_ntz', FALSE)
    ) t(col_name, data_type, is_categorical)
    """,
)
def infer_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dtype-driven categorical detection over df.schema (driver metadata —
    the distributed data is never touched). Oracle enumerates the expected
    classification for the fixed fixture schema."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = [
        (f.name, f.dataType.simpleString(), isinstance(f.dataType, StringType))
        for f in li.schema.fields
    ]
    return spark.createDataFrame(
        rows, "col_name string, data_type string, is_categorical boolean"
    )


# --- smoothed target (mean) encoding, fit-on-train ---------------------------
_TE_M = 20  # prior pseudo-count


@query(
    "target_encoding_smoothed",
    oracle=f"""
    WITH base AS (
      SELECT p_brand,
             CAST(p_partkey % 4 = 0 AS INT) AS is_test,
             CAST(p_size >= 25 AS INT) AS y
      FROM part
    ),
    prior AS (
      SELECT CAST(sum(y) AS DOUBLE) / count(*) AS p
      FROM base WHERE is_test = 0
    ),
    fit AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_train,
             CAST(sum(y) AS BIGINT) AS pos
      FROM base WHERE is_test = 0 GROUP BY p_brand
    )
    SELECT f.p_brand AS value, f.n_train,
           round((f.pos + {_TE_M} * pr.p) / (f.n_train + {_TE_M}), 6) AS enc,
           CAST(count(*) AS BIGINT) AS n_test
    FROM base b
    JOIN fit f ON b.p_brand = f.p_brand
    CROSS JOIN prior pr
    WHERE b.is_test = 1
    GROUP BY f.p_brand, f.n_train, f.pos, pr.p
    """,
)
def target_encoding_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (the category-encoders / CatBoost-prep
    standard): enc(c) = (pos_c + m·prior) / (n_c + m) with pseudo-count
    m={_TE_M}, FIT ON TRAIN ONLY, applied to the test split — the
    leakage-safe mean encoding the reference's notebooks hand-roll with
    groupby().mean().

    Scale shape: the fit is one map-side-combined aggregate producing a
    |categories|-row parameter frame; the prior is a scalar; both
    broadcast onto the test scan. Encoded value is double arithmetic over
    exact integer counts, rounded 6dp."""
    part = load_table(spark, sf_dir, "part")
    base = part.selectExpr(
        "p_brand",
        "CAST(p_partkey % 4 = 0 AS INT) AS is_test",
        "CAST(p_size >= 25 AS INT) AS y",
    )
    train = base.filter("is_test = 0")
    prior = train.agg(F.expr("CAST(sum(y) AS DOUBLE) / count(*) AS p"))
    fit = train.groupBy("p_brand").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_train"),
        F.expr("CAST(sum(y) AS BIGINT) AS pos"),
    )
    return (
        base.filter("is_test = 1")
        .join(F.broadcast(fit), "p_brand")
        .crossJoin(F.broadcast(prior))
        .groupBy("p_brand", "n_train", "pos", "p")
        .agg(F.expr("CAST(count(*) AS BIGINT) AS n_test"))
        .selectExpr(
            "p_brand AS value",
            "n_train",
            f"round((pos + {_TE_M} * p) / (n_train + {_TE_M}), 6) AS enc",
            "n_test",
        )
    )


# --- weight-of-evidence encoding + information value -------------------------
@query(
    "woe_iv_encoding",
    oracle="""
    WITH base AS (
      SELECT p_brand, CAST(p_size >= 25 AS INT) AS y FROM part
    ),
    tot AS (
      SELECT CAST(sum(y) AS BIGINT) AS pos_all,
             CAST(count(*) - sum(y) AS BIGINT) AS neg_all
      FROM base
    ),
    g AS (
      SELECT p_brand, CAST(sum(y) AS BIGINT) AS pos,
             CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM base GROUP BY p_brand
    ),
    w AS (
      SELECT g.p_brand, g.pos, g.neg,
             round(ln(greatest(CAST(g.pos AS DOUBLE) / t.pos_all, 1e-15)
                      / greatest(CAST(g.neg AS DOUBLE) / t.neg_all, 1e-15)),
                   8) AS woe,
             (CAST(g.pos AS DOUBLE) / t.pos_all
              - CAST(g.neg AS DOUBLE) / t.neg_all) AS dshare
      FROM g CROSS JOIN tot t
    )
    SELECT p_brand AS value, pos, neg, woe,
           round(dshare * woe, 8) AS iv_term
    FROM w
    """,
)
def woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding with per-category information-value
    terms — the credit-scoring / risk-model categorical audit:
    WoE(c) = ln((pos_c/pos_all) / (neg_c/neg_all)), IV term =
    (pos-share - neg-share)·WoE (sum over categories = model IV). The
    1e-15 clip absorbs empty cells (metric_logloss convention), and ln is
    rounded 8dp so both engines agree to the bit.

    Scale shape: one map-side-combined category aggregate + a broadcast
    scalar totals row — the fact is scanned once."""
    part = load_table(spark, sf_dir, "part")
    base = part.selectExpr("p_brand", "CAST(p_size >= 25 AS INT) AS y")
    tot = base.agg(
        F.expr("CAST(sum(y) AS BIGINT) AS pos_all"),
        F.expr("CAST(count(*) - sum(y) AS BIGINT) AS neg_all"),
    )
    g = base.groupBy("p_brand").agg(
        F.expr("CAST(sum(y) AS BIGINT) AS pos"),
        F.expr("CAST(count(*) - sum(y) AS BIGINT) AS neg"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .selectExpr(
            "p_brand AS value",
            "pos",
            "neg",
            "round(ln(greatest(CAST(pos AS DOUBLE) / pos_all, 1e-15)"
            " / greatest(CAST(neg AS DOUBLE) / neg_all, 1e-15)), 8) AS woe",
            "round((CAST(pos AS DOUBLE) / pos_all"
            " - CAST(neg AS DOUBLE) / neg_all)"
            " * round(ln(greatest(CAST(pos AS DOUBLE) / pos_all, 1e-15)"
            " / greatest(CAST(neg AS DOUBLE) / neg_all, 1e-15)), 8), 8)"
            " AS iv_term",
        )
    )


# --- PSI: population stability index between splits --------------------------
_PSI_BINS = 10


@query(
    "drift_psi",
    oracle=f"""
    WITH base AS (
      SELECT CAST(o_orderkey % 4 = 0 AS INT) AS is_test, o_totalprice AS x
      FROM orders
    ),
    b AS (
      SELECT min(x) AS mn, max(x) AS mx FROM base WHERE is_test = 0
    ),
    binned AS (
      SELECT is_test,
             greatest(least(CAST(floor((x - mn) / ((mx - mn) / {_PSI_BINS}))
                                 AS INT), {_PSI_BINS - 1}), 0) AS bin
      FROM base CROSS JOIN b
    ),
    cnt AS (
      SELECT bin,
             CAST(sum(CASE WHEN is_test = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(sum(CASE WHEN is_test = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS DOUBLE) AS t_ref,
             CAST(sum(n_new) AS DOUBLE) AS t_new
      FROM cnt
    )
    SELECT c.bin, c.n_ref, c.n_new,
           round((greatest(c.n_new / t.t_new, 1e-6)
                  - greatest(c.n_ref / t.t_ref, 1e-6))
                 * round(ln(greatest(c.n_new / t.t_new, 1e-6)
                            / greatest(c.n_ref / t.t_ref, 1e-6)), 8),
                 8) AS psi_term
    FROM cnt c CROSS JOIN tot t
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference (train) and new
    (test) splits of o_totalprice, binned on the REFERENCE split's range
    ({_PSI_BINS} equal-width bins) — the production drift monitor (PSI >
    0.2 = retrain). Per-bin term = (p_new - p_ref)·ln(p_new/p_ref); the
    1e-6 floor is the industry empty-bin convention, ln rounded 8dp (the
    repo's logloss convention) so both engines agree bit-for-bit.

    Scale shape: reference min/max is one scalar agg broadcast onto a
    single binning scan; everything after runs on the {_PSI_BINS}-row
    bin table."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.selectExpr(
        "CAST(o_orderkey % 4 = 0 AS INT) AS is_test", "o_totalprice AS x"
    )
    b = base.filter("is_test = 0").agg(
        F.expr("min(x) AS mn"), F.expr("max(x) AS mx")
    )
    binned = base.crossJoin(F.broadcast(b)).selectExpr(
        "is_test",
        f"greatest(least(CAST(floor((x - mn) / ((mx - mn) / {_PSI_BINS}))"
        f" AS INT), {_PSI_BINS - 1}), 0) AS bin",
    )
    cnt = binned.groupBy("bin").agg(
        F.expr(
            "CAST(sum(CASE WHEN is_test = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_ref"
        ),
        F.expr(
            "CAST(sum(CASE WHEN is_test = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_new"
        ),
    )
    tot = cnt.agg(
        F.expr("CAST(sum(n_ref) AS DOUBLE) AS t_ref"),
        F.expr("CAST(sum(n_new) AS DOUBLE) AS t_new"),
    )
    return cnt.crossJoin(F.broadcast(tot)).selectExpr(
        "bin",
        "n_ref",
        "n_new",
        "round((greatest(n_new / t_new, 1e-6)"
        " - greatest(n_ref / t_ref, 1e-6))"
        " * round(ln(greatest(n_new / t_new, 1e-6)"
        " / greatest(n_ref / t_ref, 1e-6)), 8), 8) AS psi_term",
    )


# --- deterministic majority-class downsampling -------------------------------
@query(
    "class_downsample_balanced",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_returnflag <> 'N' AS INT) AS majority
      FROM lineitem
    ),
    cnt AS (
      SELECT CAST(sum(majority) AS BIGINT) AS n_maj,
             CAST(count(*) - sum(majority) AS BIGINT) AS n_min
      FROM base
    ),
    kept AS (
      SELECT b.majority
      FROM base b CROSS JOIN cnt
      WHERE b.majority = 0
         OR (CAST(concat('0x', substring(md5(CAST(b.l_orderkey * 100000 + b.l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000)
              * cnt.n_maj < cnt.n_min * 1000000
    )
    SELECT CAST(majority AS INT) AS majority, count(*) AS n_kept
    FROM kept GROUP BY majority
    """,
)
def class_downsample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-class downsampling to ~1:1 via hash-Bernoulli keep (keep
    probability n_min/n_maj decided by a per-row key hash against an
    integer threshold) — the imbalance fix that needs NO shuffle, no
    sampling state, and reproduces exactly on any engine/cluster (the
    mixture_temperature trick applied to class balance).

    Portability: the keep decision hashes the row key through md5 (the
    repo's engine-portable hash convention — Spark's hash() and DuckDB's
    hash() are different functions); the modulus comparison is pure
    integer arithmetic, so kept-set membership is identical on both
    engines. Output is the per-class kept count."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.selectExpr(
        "l_orderkey", "l_linenumber", "CAST(l_returnflag <> 'N' AS INT) AS majority"
    )
    cnt = base.agg(
        F.expr("CAST(sum(majority) AS BIGINT) AS n_maj"),
        F.expr("CAST(count(*) - sum(majority) AS BIGINT) AS n_min"),
    )
    kept = base.crossJoin(F.broadcast(cnt)).filter(
        F.expr(
            "majority = 0 OR (CAST(conv(substring("
            "md5(CAST(l_orderkey * 100000 + l_linenumber AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT) % 1000000) * n_maj < n_min * 1000000"
        )
    )
    return kept.groupBy(F.expr("CAST(majority AS INT)").alias("majority")).agg(
        F.expr("count(*) AS n_kept")
    )


# --- per-feature KS drift matrix ---------------------------------------------
_KS_MELT = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, {c} AS x, CAST(l_orderkey % 4 = 0 AS INT) AS g"
    " FROM lineitem"
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
)


@query(
    "drift_ks_matrix",
    oracle=f"""
    WITH m AS ({_KS_MELT}),
    c AS (
      SELECT col_name, x,
             CAST(sum(1 - g) AS BIGINT) AS c1,
             CAST(sum(g) AS BIGINT) AS c2
      FROM m GROUP BY col_name, x
    ),
    cum AS (
      SELECT col_name,
             sum(c1) OVER (PARTITION BY col_name ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             sum(c2) OVER (PARTITION BY col_name ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
      FROM c
    ),
    n AS (
      SELECT col_name, CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2
      FROM c GROUP BY col_name
    )
    SELECT cum.col_name, n.n1, n.n2,
           CAST(max(abs(CAST(n.n2 AS HUGEINT) * cum.cum1
                        - CAST(n.n1 AS HUGEINT) * cum.cum2)) AS BIGINT)
             AS d_num,
           round(CAST(max(abs(CAST(n.n2 AS HUGEINT) * cum.cum1
                              - CAST(n.n1 AS HUGEINT) * cum.cum2)) AS BIGINT)
                 / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)), 6) AS d_stat
    FROM cum JOIN n ON cum.col_name = n.col_name
    GROUP BY cum.col_name, n.n1, n.n2
    """,
)
def drift_ks_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature Kolmogorov-Smirnov drift matrix between the train and
    test splits — ks_2samp generalized to every numeric column in one
    pass (the feature-drift scan run next to drift_psi's binned view; KS
    needs no binning choice). D is kept EXACT integer by
    cross-multiplying the ECDF numerators (|n2·cum1 − n1·cum2| in
    128-bit), one double division at the end.

    Scale shape: the melt feeds a per-(col, value) conditional-count
    aggregate (map-side combined); cumulative passes are COLUMN-
    partitioned windows over distinct values — parallel across features,
    never a single-partition move. (Per-column value cardinality is the
    scale knob; for continuous doubles at 100 TB, pre-quantize like
    metric_auroc or bucket with rank_ops.)"""
    li = load_table(spark, sf_dir, "lineitem")
    melt = li.selectExpr(
        "stack(4, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice,"
        " 'l_discount', l_discount, 'l_tax', l_tax) AS (col_name, x)",
        "CAST(l_orderkey % 4 = 0 AS INT) AS g",
    )
    # materialized: c feeds the ECDF window AND the per-column totals —
    # two differently-keyed consumers that otherwise each re-run the
    # fact melt + conditional-count aggregate (optimization r07, §2.4)
    c = melt.groupBy("col_name", "x").agg(
        F.expr("CAST(sum(1 - g) AS BIGINT) AS c1"),
        F.expr("CAST(sum(g) AS BIGINT) AS c2"),
    ).localCheckpoint()
    w = Window.partitionBy("col_name").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = c.select(
        "col_name",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    n = c.groupBy("col_name").agg(
        F.expr("CAST(sum(c1) AS BIGINT) AS n1"),
        F.expr("CAST(sum(c2) AS BIGINT) AS n2"),
    )
    return (
        cum.join(F.broadcast(n), "col_name")
        .groupBy("col_name", "n1", "n2")
        .agg(
            F.expr(
                "CAST(max(abs(CAST(n2 AS DECIMAL(38,0)) * cum1"
                " - CAST(n1 AS DECIMAL(38,0)) * cum2)) AS BIGINT) AS d_num"
            )
        )
        .selectExpr(
            "col_name",
            "n1",
            "n2",
            "d_num",
            "round(d_num / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)"
            " AS d_stat",
        )
    )


# --- exact 1-D Wasserstein (earth-mover) drift -------------------------------
# Quantization contract (both engines): prices bin at $100 granularity, so
# the ordered pass runs over a range-bounded table (~1.1k bins for TPC-H
# prices at ANY scale factor — cardinality is set by the price domain, not
# the row count). W1 on the binned marginals is the exact EMD of the
# quantized distributions.
_EMD_BINW = 100
_EMD_PIVOT = 1997


@query(
    "drift_emd_price",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(l_extendedprice / {_EMD_BINW}.0) AS BIGINT) AS bin,
             CAST(year(l_shipdate) <= {_EMD_PIVOT} AS INT) AS a
      FROM lineitem
    ),
    c AS (
      SELECT bin, CAST(sum(a) AS BIGINT) AS na,
             CAST(sum(1 - a) AS BIGINT) AS nb
      FROM b GROUP BY bin
    ),
    n AS (
      SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
      FROM c
    ),
    cum AS (
      SELECT bin,
             CAST(sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             CAST(sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
             lead(bin) OVER (ORDER BY bin) AS nxt
      FROM c
    ),
    t AS (
      SELECT count(*) AS n_bins,
             CAST(sum(CAST(abs(n.tb * cum.ca - n.ta * cum.cb)
                           * coalesce(cum.nxt - cum.bin, 0)
                           AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(max(abs(n.tb * cum.ca - n.ta * cum.cb)) AS BIGINT) AS dmax,
             any_value(n.ta) AS ta, any_value(n.tb) AS tb
      FROM cum CROSS JOIN n
    )
    SELECT ta AS n_a, tb AS n_b, n_bins,
           round({_EMD_BINW}.0 * s
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6) AS w1_price,
           round(dmax / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6)
             AS ks_price
    FROM t
    """,
)
def drift_emd_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between the early
    (shipdate year ≤ {_EMD_PIVOT}) and late price distributions, the drift
    metric PSI and KS can't replace: it weights mass by how FAR it moved
    (W1 = ∫|F_A − F_B| dx). On the ${_EMD_BINW}-quantized ECDFs,
    W1 = binw · Σᵢ |F_A(vᵢ) − F_B(vᵢ)| · (vᵢ₊₁ − vᵢ) over occupied bins;
    the KS sup-gap on the same compression falls out for free.

    Scale shape: ONE fact scan into a range-bounded (~1.1k-row) bin
    histogram with map-side combine; cumulative counts and the next-bin
    gap come from broadcast triangular joins over that bounded table
    (operators/bounded_seq.py) — no single-partition window anywhere. ECDF
    gaps are cross-multiplied (|tb·ca − ta·cb|, exact bigint: per-term
    ≤ ta·tb·range < 2^63 through sf≈15; beyond that widen the product to
    the DECIMAL(18,0) lanes) and accumulated in DECIMAL(38,0); the two
    output stats each cost one final IEEE division."""
    from ..operators.bounded_seq import exclusive_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    b = li.selectExpr(
        f"CAST(floor(l_extendedprice / {_EMD_BINW}.0D) AS BIGINT) AS bin",
        f"CAST(year(l_shipdate) <= {_EMD_PIVOT} AS INT) AS a",
    )
    c = b.groupBy("bin").agg(
        F.expr("CAST(sum(a) AS BIGINT) AS na"),
        F.expr("CAST(sum(1 - a) AS BIGINT) AS nb"),
    )
    n = c.agg(
        F.expr("CAST(sum(na) AS BIGINT) AS ta"),
        F.expr("CAST(sum(nb) AS BIGINT) AS tb"),
    )
    prev = exclusive_prefix_sums(c, "bin", ["na", "nb"])
    nxt = (
        c.select("bin")
        .join(
            F.broadcast(c.select(F.col("bin").alias("__nb"))),
            F.col("__nb") > F.col("bin"),
            "left",
        )
        .groupBy("bin")
        .agg(F.min("__nb").alias("nxt"))
    )
    cum = (
        c.join(prev, "bin")
        .join(nxt, "bin")
        .selectExpr(
            "bin",
            "prev_na + na AS ca",
            "prev_nb + nb AS cb",
            "nxt",
        )
    )
    t = cum.crossJoin(F.broadcast(n)).agg(
        F.expr("count(*) AS n_bins"),
        F.expr(
            "CAST(sum(CAST(abs(tb * ca - ta * cb)"
            " * coalesce(nxt - bin, 0) AS DECIMAL(38,0))) AS DOUBLE) AS s"
        ),
        F.expr("CAST(max(abs(tb * ca - ta * cb)) AS BIGINT) AS dmax"),
        F.expr("any_value(ta) AS ta"),
        F.expr("any_value(tb) AS tb"),
    )
    return t.selectExpr(
        "ta AS n_a",
        "tb AS n_b",
        "n_bins",
        f"round({_EMD_BINW}.0D * s"
        " / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6) AS w1_price",
        "round(dmax / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6)"
        " AS ks_price",
    )


# --- rare-category collapse (fit on train) -----------------------------------
_RARE_MIN = 50


@query(
    "rare_category_collapse",
    oracle=f"""
    WITH base AS (
      SELECT p_type, CAST(p_partkey % 4 = 0 AS INT) AS is_test FROM part
    ),
    fit AS (
      SELECT p_type FROM base WHERE is_test = 0
      GROUP BY p_type HAVING count(*) >= {_RARE_MIN}
    )
    SELECT CASE WHEN f.p_type IS NULL THEN '__other__' ELSE b.p_type END
             AS value,
           count(*) AS n_test
    FROM base b LEFT JOIN fit f ON b.p_type = f.p_type
    WHERE b.is_test = 1
    GROUP BY value
    """,
)
def rare_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-category collapse: categories seen fewer than {_RARE_MIN}
    times on the TRAIN split map to '__other__' everywhere — the encoder
    guard that keeps one-hot/hashing dimensionality bounded and unseen
    test categories from crashing inference (they fall into the same
    bucket). Fit = one map-side aggregate producing the keep-list,
    broadcast onto the test scan."""
    part = load_table(spark, sf_dir, "part")
    base = part.selectExpr("p_type", "CAST(p_partkey % 4 = 0 AS INT) AS is_test")
    fit = (
        base.filter("is_test = 0")
        .groupBy("p_type")
        .agg(F.count("*").alias("c"))
        .filter(f"c >= {_RARE_MIN}")
        .select("p_type")
        .withColumn("keep", F.lit(1))
    )
    return (
        base.filter("is_test = 1")
        .join(F.broadcast(fit), "p_type", "left")
        .selectExpr(
            "CASE WHEN keep IS NULL THEN '__other__' ELSE p_type END AS value"
        )
        .groupBy("value")
        .agg(F.expr("count(*) AS n_test"))
    )


# --- leave-one-out target encoding --------------------------------------------
@query(
    "target_encoding_loo",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             CAST(o_totalprice > 150000.0 AS INT) AS y
      FROM orders
    ),
    g AS (
      SELECT cat, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM base GROUP BY cat
    ),
    enc AS (
      SELECT b.cat, g.n, g.s,
             CAST(g.s - b.y AS DOUBLE) / (g.n - 1) AS loo
      FROM base b JOIN g USING (cat)
      WHERE g.n > 1
    )
    SELECT cat, n,
           round(CAST(s AS DOUBLE) / n, 6) AS naive_mean,
           round(CAST(sum(CAST(round(loo * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 / n, 6) AS loo_mean_avg,
           round(max(loo) - min(loo), 6) AS loo_spread
    FROM enc GROUP BY cat, n, s
    """,
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the self-exclusion form that kills
    target leakage WITHOUT a train/apply split: enc_i = (S_c − y_i)/(n_c − 1),
    from one category aggregate broadcast back onto the scan (no window,
    no EXCLUDE-frame support needed — the algebra does it). The audit
    output pins the defining law avg_i(enc_i) == naive category mean
    (exact: Σ(S−y_i) = nS − S) plus the spread the self-exclusion
    introduces. Per-row encodings are 6dp-quantized and integer-summed so
    the averaged emission is partition-order-proof."""
    from ..functions import numeric as N

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("y"),
    )
    g = base.groupBy("cat").agg(
        F.count("*").alias("n"), F.sum("y").cast("bigint").alias("s")
    )
    enc = (
        base.join(F.broadcast(g), "cat")
        .filter(F.col("n") > 1)
        .withColumn(
            "loo",
            (F.col("s") - F.col("y")).cast("double") / (F.col("n") - 1),
        )
    )
    return enc.groupBy("cat", "n", "s").agg(
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("naive_mean"),
        # fround_int, not iscaled: loo carries arbitrary decimals (the
        # /(n-1) division), outside iscaled's <=scale-decimals contract —
        # the exact-fraction half-away form matches DuckDB round() on
        # every double
        F.round(
            F.sum(N.fround_int(F.col("loo") * 1000000.0)).cast("double")
            / 1000000.0
            / F.col("n"),
            6,
        ).alias("loo_mean_avg"),
        F.round(F.max("loo") - F.min("loo"), 6).alias("loo_spread"),
    ).drop("s")


# --- variance inflation factors (multicollinearity audit) --------------------
# The EDA step that sits next to prune_corr in any feature review: VIF_j =
# 1/(1 - R²_j) of feature j regressed on the others, computed CLOSED-FORM
# from the exact Pearson matrix via principal minors: VIF_j =
# det(R₋ⱼ)/det(R). Determinant expressions are generated ONCE in Python
# and embedded as identical literal arithmetic in both engines, over
# correlations rounded to 6dp — every operation after the sufficient
# statistics is deterministic IEEE on identical expression trees.
_VIF_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _vif_r_sym(i: int, j: int) -> str:
    if i == j:
        return "1.0"
    a, b = (i, j) if i < j else (j, i)
    return f"r{a}{b}"


def _vif_det_sql(idx: tuple[int, ...]) -> str:
    """Leibniz determinant of the correlation submatrix R[idx, idx]."""
    from itertools import permutations

    def parity(p: tuple[int, ...]) -> int:
        inv = sum(
            1
            for x in range(len(p))
            for y in range(x + 1, len(p))
            if p[x] > p[y]
        )
        return -1 if inv % 2 else 1

    terms = []
    for perm in permutations(range(len(idx))):
        prod = " * ".join(_vif_r_sym(idx[i], idx[perm[i]]) for i in range(len(idx)))
        terms.append(("+ " if parity(perm) > 0 else "- ") + f"({prod})")
    return "(" + " ".join(terms) + ")"


def _vif_stats_parts() -> list[str]:
    """Sufficient-statistic aggregate list (identical text both engines)."""
    parts = ["CAST(count(*) AS DOUBLE) AS n"]
    for i, c in enumerate(_VIF_COLS):
        parts.append(f"{N.sql_dsum(c)} AS sx{i}")
        parts.append(
            f"CAST(sum(CAST(CAST({c} AS DECIMAL(25,6))"
            f" * CAST({c} AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
            f" AS DOUBLE) AS ss{i}"
        )
    for i in range(len(_VIF_COLS)):
        for j in range(i + 1, len(_VIF_COLS)):
            parts.append(
                f"CAST(sum(CAST(CAST({_VIF_COLS[i]} AS DECIMAL(25,6))"
                f" * CAST({_VIF_COLS[j]} AS DECIMAL(25,6)) AS DECIMAL(38,10)))"
                f" AS DOUBLE) AS sp{i}{j}"
            )
    return parts


def _vif_stats_sql() -> str:
    return ", ".join(_vif_stats_parts())


def _vif_corr_parts() -> list[str]:
    parts = []
    for i in range(len(_VIF_COLS)):
        for j in range(i + 1, len(_VIF_COLS)):
            parts.append(
                f"round((n * sp{i}{j} - sx{i} * sx{j})"
                f" / sqrt((n * ss{i} - sx{i} * sx{i})"
                f" * (n * ss{j} - sx{j} * sx{j})), 6) AS r{i}{j}"
            )
    return parts


def _vif_corr_sql() -> str:
    return ", ".join(_vif_corr_parts())


def _vif_select_sql() -> str:
    k = len(_VIF_COLS)
    full = _vif_det_sql(tuple(range(k)))
    rows = []
    for j, c in enumerate(_VIF_COLS):
        minor = _vif_det_sql(tuple(i for i in range(k) if i != j))
        rows.append(
            f"'{c}', round(1.0 - {full} / nullif({minor}, 0), 6),"
            f" round({minor} / nullif({full}, 0), 6)"
        )
    return (
        f"stack({k}, " + ", ".join(rows) + ") AS (feature, r2_others, vif)"
    )


@query(
    "feature_vif",
    oracle=f"""
    WITH s AS (SELECT {_vif_stats_sql()} FROM lineitem),
    r AS (SELECT {_vif_corr_sql()} FROM s),
    u AS (
      {" UNION ALL ".join(
        "SELECT '" + c + "' AS feature,"
        + " round(1.0 - " + _vif_det_sql(tuple(range(len(_VIF_COLS))))
        + " / nullif(" + _vif_det_sql(tuple(i for i in range(len(_VIF_COLS)) if i != j)) + ", 0), 6) AS r2_others,"
        + " round(" + _vif_det_sql(tuple(i for i in range(len(_VIF_COLS)) if i != j))
        + " / nullif(" + _vif_det_sql(tuple(range(len(_VIF_COLS)))) + ", 0), 6) AS vif"
        + " FROM r"
        for j, c in enumerate(_VIF_COLS))}
    )
    SELECT feature, r2_others, vif FROM u
    """,
)
def feature_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors over the lineitem numeric features — the
    multicollinearity audit run before any linear model (and the principled
    companion to prune_corr's threshold rule): VIF_j = det(R₋ⱼ)/det(R)
    from the exact Pearson matrix, R²_j = 1 − det(R)/det(R₋ⱼ).

    Scale shape: ONE map-side-combined aggregation pass collects all 15
    sufficient statistics; everything after is scalar arithmetic on a
    one-row frame (Python-generated Leibniz determinants over 6dp-rounded
    correlations — identical literal expressions in both engines,
    NULLIF-guarded against a singular matrix).

    The Spark-side statistics ride the corr_matrix integer lanes
    (optimization r07, guide §1.2) instead of the oracle's decimal casts:
    2dp inputs scale exactly to bigints, products are exact at 10^4, and
    the determinants consume only 6dp-ROUNDED correlations, so the swap
    is value-identical (2.3s → 0.6s at sf0.1; parity re-verified at
    sf0.001 + sf0.01 + sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = len(_VIF_COLS)
    proj = li.selectExpr(
        *[f"{N.spark_iscaled(c, 2)} AS i_{i}" for i, c in enumerate(_VIF_COLS)]
    )
    aggs = ["count(*) AS n_raw"]
    for i in range(k):
        aggs.append(f"sum(i_{i}) AS s{i}")
        aggs += N.spark_isum_items(f"i_{i} * i_{i}", f"ssl{i}")
    for i in range(k):
        for j in range(i + 1, k):
            aggs += N.spark_isum_items(f"i_{i} * i_{j}", f"spl{i}{j}")
    stats = proj.agg(F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]])
    vals = ["CAST(n_raw AS DOUBLE) AS n"]
    for i in range(k):
        vals.append(f"(CAST(s{i} AS DOUBLE) / 100.0) AS sx{i}")
        vals.append(f"{N.spark_isum_value(f'ssl{i}', 4)} AS ss{i}")
    for i in range(k):
        for j in range(i + 1, k):
            vals.append(f"{N.spark_isum_value(f'spl{i}{j}', 4)} AS sp{i}{j}")
    one = stats.selectExpr(*vals)
    r = one.selectExpr(*_vif_corr_parts())
    return r.selectExpr(_vif_select_sql())


# --- mutual information feature screen ----------------------------------------
# Complements the linear screens (corr_target, prune_corr, feature_vif) and
# the supervised encoder (woe_iv_encoding) with the model-free dependence
# measure: MI in nats between a bucketed numeric feature and the class
# column, plus marginal entropies and normalized MI.
_FMI_BUCKET = "least(CAST(floor(l_extendedprice / 20000.0) AS BIGINT), 4)"


@query(
    "feature_mutual_info",
    oracle=f"""
    WITH cells AS (
      SELECT {_FMI_BUCKET} AS b, l_returnflag AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY b, y
    ),
    rx AS (SELECT b, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY b),
    sy AS (SELECT y, CAST(sum(c) AS BIGINT) AS s FROM cells GROUP BY y),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT CAST(sum(CAST(round(
               CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
               * ln(CAST(n AS DOUBLE) * CAST(c AS DOUBLE)
                    / (CAST(r AS DOUBLE) * CAST(s AS DOUBLE))), 9)
             AS DECIMAL(25,12))) AS DOUBLE) AS mi_nats
      FROM cells JOIN rx USING (b) JOIN sy USING (y), tot
    ),
    hx AS (
      SELECT CAST(sum(CAST(round(
               -(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(25,12))) AS DOUBLE) AS h_x
      FROM rx, tot
    ),
    hy AS (
      SELECT CAST(sum(CAST(round(
               -(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(25,12))) AS DOUBLE) AS h_y
      FROM sy, tot
    )
    SELECT n, round(mi_nats, 6) AS mi_nats,
           round(h_x, 6) AS h_x, round(h_y, 6) AS h_y,
           round(mi_nats / nullif(sqrt(h_x * h_y), 0.0), 6) AS nmi
    FROM mi, hx, hy, tot
    """,
)
def feature_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between the bucketed price feature and
    the return flag, with marginal entropies and the sqrt-normalized MI —
    the model-free dependence screen that catches what Pearson screens
    (corr_target, prune_corr) miss on non-linear relationships.

    Exactness: the joint table is one map-side-combined groupBy to <= 15
    integer cells; each plogp/MI term is one identical int→double
    expression, 9dp-quantized into DECIMAL before summing so the tiny
    across-cells sums are order-free (the norm_mean convention). One fact
    scan; everything downstream is constant-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.expr(_FMI_BUCKET).alias("b"), F.col("l_returnflag").alias("y")
    ).agg(F.count("*").cast("bigint").alias("c"))
    rx = cells.groupBy("b").agg(F.sum("c").cast("bigint").alias("r"))
    sy = cells.groupBy("y").agg(F.sum("c").cast("bigint").alias("s"))
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    nd = F.col("n").cast("double")
    mi_term = (
        F.col("c").cast("double")
        / nd
        * F.log(
            nd
            * F.col("c").cast("double")
            / (F.col("r").cast("double") * F.col("s").cast("double"))
        )
    )
    mi = (
        cells.join(F.broadcast(rx), "b")
        .join(F.broadcast(sy), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(N.fround(mi_term, 9).cast("decimal(25,12)"))
            .cast("double")
            .alias("mi_nats")
        )
    )
    hx = rx.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            N.fround(
                -(F.col("r").cast("double") / nd)
                * F.log(F.col("r").cast("double") / nd),
                9,
            ).cast("decimal(25,12)")
        )
        .cast("double")
        .alias("h_x")
    )
    hy = sy.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            N.fround(
                -(F.col("s").cast("double") / nd)
                * F.log(F.col("s").cast("double") / nd),
                9,
            ).cast("decimal(25,12)")
        )
        .cast("double")
        .alias("h_y")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_x", 6).alias("h_x"),
            F.round("h_y", 6).alias("h_y"),
            F.round(
                F.col("mi_nats")
                / F.nullif(F.sqrt(F.col("h_x") * F.col("h_y")), F.lit(0.0)),
                6,
            ).alias("nmi"),
        )
    )


# --- empirical-Bayes rate shrinkage (beta-binomial, method of moments) -------
# The "small denominators lie" fix every per-group rate table needs: fit a
# beta prior to the observed per-part return rates by method of moments,
# then shrink each part's rate toward the prior mean in proportion to its
# evidence: (x + alpha)/(n + alpha + beta). target_encoding_smoothed fixes
# the same pathology with a HAND-PICKED smoothing constant; here the data
# chooses it.
@query(
    "rate_shrinkage_eb",
    oracle="""
    WITH g AS (
      SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS x
      FROM lineitem GROUP BY l_partkey
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 9)
                           AS DECIMAL(25,12))) AS DOUBLE) AS sp,
             CAST(sum(CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                                 * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                           AS DECIMAL(25,12))) AS DOUBLE) AS spp
      FROM g
    ),
    prior AS (
      SELECT k, sp / k AS m,
             (spp - sp * sp / k) / (k - 1.0) AS v
      FROM mo
    ),
    ab AS (
      SELECT m, v,
             greatest(m * (1.0 - m) / nullif(v, 0.0) - 1.0, 0.1) AS s
      FROM prior
    )
    SELECT g.pk, g.n, g.x,
           round(CAST(g.x AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS rate_raw,
           round(m, 6) AS prior_mean,
           round((CAST(g.x AS DOUBLE) + m * s)
                 / (CAST(g.n AS DOUBLE) + s), 6) AS rate_shrunk
    FROM g, ab
    """,
)
def rate_shrinkage_eb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-part return rates: a beta prior is
    fit by method of moments over the observed rates (prior strength
    s = m(1-m)/v - 1, floored at 0.1 against a degenerate zero-variance
    corpus), and each part's rate shrinks toward the prior mean with
    weight proportional to its evidence. Low-n parts move most — the
    principled version of target_encoding_smoothed's fixed constant.

    Exactness: per-part counts are integers; the across-parts moment sums
    quantize each rate to 9dp DECIMAL (order-free); the shrinkage is one
    identical double expression. One fact scan, one part-keyed groupBy,
    one broadcast scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("bigint"))
        .cast("bigint")
        .alias("x"),
    )
    rate = F.col("x").cast("double") / F.col("n").cast("double")
    mo = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(N.fround(rate, 9).cast("decimal(25,12)"))
        .cast("double")
        .alias("sp"),
        F.sum(N.fround(rate * rate, 9).cast("decimal(25,12)"))
        .cast("double")
        .alias("spp"),
    )
    ab = mo.selectExpr(
        "sp / k AS m",
        "greatest((sp / k) * (1.0 - sp / k)"
        " / nullif((spp - sp * sp / k) / (k - 1.0), 0.0) - 1.0, 0.1) AS s",
    )
    return g.crossJoin(F.broadcast(ab)).select(
        "pk",
        "n",
        "x",
        F.round(rate, 6).alias("rate_raw"),
        F.round(F.col("m"), 6).alias("prior_mean"),
        F.round(
            (F.col("x").cast("double") + F.col("m") * F.col("s"))
            / (F.col("n").cast("double") + F.col("s")),
            6,
        ).alias("rate_shrunk"),
    )


# --- M16: one-hot encoding (pd.get_dummies) ----------------------------------
# Reference: final-assignment/experiments/comparison/
# compare_ensemble_with_without_dt.py:81-82, legacy/overfitting_experiment.py:
# 134-135, legacy/ensemble_best_models.py:96 — pd.get_dummies(X) before the
# ensemble fits. get_dummies derives the dummy columns from the DATA
# (sorted distinct categories), so the Spark side fits the category list
# first (a bounded-domain distinct, collected — c_mktsegment has 5 values at
# every SF) and generates one `(col = cat)::int` expression per category:
# a pure when-block that stays inside whole-stage codegen, no pivot shuffle.
# The oracle enumerates the same TPC-H segment domain statically. Output is
# the per-nation dummy-column sums (scale-sane: 25 rows at any SF) plus the
# row count — equal sums over every dummy ⇔ equal encodings row-by-row up
# to permutation within nation, which is what the hash compare needs.
_OH_SEGMENTS = (
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
)


@query(
    "encode_onehot",
    oracle="""
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n,
           {cols}
    FROM customer
    GROUP BY c_nationkey
    """.format(
        cols=",\n           ".join(
            f"CAST(sum(CAST(c_mktsegment = '{s}' AS INT)) AS BIGINT)"
            f" AS mkt_{s.lower()}"
            for s in _OH_SEGMENTS
        )
    ),
)
def encode_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.get_dummies fidelity: fit = sorted distinct categories (collected;
    the category domain is bounded by definition of one-hot — a column whose
    distinct count scales with data has no dummy representation), transform =
    one generated indicator expression per category. The fit collect is a
    5-row scalar frame, never the fact table; the transform is expression-only
    (codegen), so the encode adds zero shuffles before the nation rollup."""
    cust = load_table(spark, sf_dir, "customer")
    cats = [
        r[0]
        for r in cust.select("c_mktsegment").distinct().orderBy("c_mktsegment").collect()
    ]
    dummies = [
        (F.col("c_mktsegment") == c).cast("int").alias(f"mkt_{c.lower()}")
        for c in cats
    ]
    enc = cust.select(F.col("c_nationkey").alias("nationkey"), *dummies)
    return enc.groupBy("nationkey").agg(
        F.count("*").cast("bigint").alias("n"),
        *[F.sum(f"mkt_{c.lower()}").cast("bigint").alias(f"mkt_{c.lower()}") for c in cats],
    )
