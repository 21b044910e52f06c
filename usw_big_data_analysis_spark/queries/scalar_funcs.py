"""Scalar / expression functions (SURVEY.md §2.8 F1-F12).

The reference's ad-hoc apply/map lambdas all reduce to built-in column
expressions (no Python in the hot path). libm-backed functions (exp/log/pow)
can differ from DuckDB by 1 ulp, so their outputs are rounded to 6dp on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table
from ._shared import _PRED_SQL, _TRUTH_SQL, pred_frame, truth_frame


# --- F1: trim whitespace (0.meta_data_check.ipynb strip cell) ---------------
@query(
    "str_strip",
    oracle="""
    SELECT c_custkey, trim(concat('  ', c_name, '  ')) AS name_stripped
    FROM customer
    """,
)
def str_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    padded = F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))
    return cust.select("c_custkey", F.trim(padded).alias("name_stripped"))


# --- F2: split option strings code:label (1-1.data_processing.ipynb:1436) ---
@query(
    "str_split_parse",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           CAST(string_split(o_orderpriority, '-')[1] AS INT) AS code,
           string_split(o_orderpriority, '-')[2] AS label
    FROM orders
    """,
)
def str_split_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse '3-MEDIUM'-style coded strings into (code, label) — the
    metadata option-string pattern ('1:예 | 2:아니오')."""
    orders = load_table(spark, sf_dir, "orders")
    parts = F.split("o_orderpriority", "-")
    return orders.select(
        "o_orderpriority",
        parts.getItem(0).cast("int").alias("code"),
        parts.getItem(1).alias("label"),
    ).distinct()


# --- F3: sentinel recode (1-1.data_processing.ipynb:1440-1443) --------------
@query(
    "recode_replace",
    oracle="""
    SELECT CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE -1 END AS status_code,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def recode_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    code = (
        F.when(F.col("o_orderstatus") == "F", 0)
        .when(F.col("o_orderstatus") == "O", 1)
        .otherwise(-1)
    )
    return orders.groupBy(code.alias("status_code")).agg(F.count("*").alias("n"))


# --- F4: dict-map values (iris target→species; CV_iris_analysis.ipynb:420) --
@query(
    "map_label",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def map_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value→label mapping as a broadcast join to a tiny dimension (the
    scalable form of Series.map({...}))."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))


# --- F5: threshold-derived label (1-2.labeling_XYdataset.ipynb:529) ---------
@query(
    "apply_threshold_label",
    oracle="""
    SELECT CAST(o_totalprice > 200000.0 AS INT) AS label, count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def apply_threshold_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    label = (F.col("o_totalprice") > 200000.0).cast("int")
    return orders.groupBy(label.alias("label")).agg(F.count("*").alias("n"))


# --- F6: bin continuous → labeled categories (experiments/target_eda.py:48) -
@query(
    "bin_cut",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN '0_negative'
                WHEN c_acctbal < 3000 THEN '1_low'
                WHEN c_acctbal < 7000 THEN '2_mid'
                ELSE '3_high' END AS bal_bin,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def bin_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.cut with labels as a when-chain (Bucketizer is the vector-pipeline
    form; the when-chain stays in whole-stage codegen)."""
    cust = load_table(spark, sf_dir, "customer")
    bin_col = (
        F.when(F.col("c_acctbal") < 0, "0_negative")
        .when(F.col("c_acctbal") < 3000, "1_low")
        .when(F.col("c_acctbal") < 7000, "2_mid")
        .otherwise("3_high")
    )
    return cust.groupBy(bin_col.alias("bal_bin")).agg(F.count("*").alias("n"))


# --- F7: type casts (teamProject/sap.py:40; 1-1:1914) -----------------------
@query(
    "cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_quantity AS DOUBLE) AS qty_double,
           CAST(l_linenumber > 3 AS BOOLEAN) AS late_line
    FROM lineitem
    """,
)
def cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_quantity").cast("double").alias("qty_double"),
        (F.col("l_linenumber") > 3).alias("late_line"),
    )


# --- F8: fill nulls with constant (basecode.ipynb:34-36) --------------------
@query(
    "fillna_const",
    oracle="""
    WITH injected AS (
      SELECT c_mktsegment,
             CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(sum(CAST(coalesce(bal, 0.0) AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_filled,
           CAST(sum(CAST(bal IS NULL AS BIGINT)) AS BIGINT) AS n_filled
    FROM injected GROUP BY c_mktsegment
    """,
)
def fillna_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_custkey") % 5 == 0, None).otherwise(F.col("c_acctbal"))
    injected = cust.select("c_mktsegment", bal.alias("bal"))
    filled = F.coalesce(F.col("bal"), F.lit(0.0))
    return injected.groupBy("c_mktsegment").agg(
        (
            F.sum(filled.cast("decimal(25,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_filled"),
        F.sum(F.col("bal").isNull().cast("bigint")).alias("n_filled"),
    )


# --- F9: clip to range (src/ensemble/alternative.py:212,218) ----------------
@query(
    "clip",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(greatest(least(l_extendedprice, 50000.0), 5000.0)
                         AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_clipped,
           CAST(sum(CAST(l_extendedprice > 50000.0 AS BIGINT)) AS BIGINT) AS n_clipped_high,
           CAST(sum(CAST(l_extendedprice < 5000.0 AS BIGINT)) AS BIGINT) AS n_clipped_low
    FROM lineitem GROUP BY l_returnflag
    """,
)
def clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    clipped = F.greatest(F.least(F.col("l_extendedprice"), F.lit(50000.0)), F.lit(5000.0))
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(clipped.cast("decimal(25,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_clipped"),
        F.sum((F.col("l_extendedprice") > 50000.0).cast("bigint")).alias("n_clipped_high"),
        F.sum((F.col("l_extendedprice") < 5000.0).cast("bigint")).alias("n_clipped_low"),
    )


# --- F10: elementwise math (src/ensemble/alternative.py:213,220) ------------
@query(
    "math_elementwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(l_quantity + 1.0), 6) AS log_qty,
           round(exp(l_discount), 6) AS exp_disc,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(pow(l_tax, 2), 6) AS tax_sq,
           abs(l_quantity - 25.0) AS abs_dev
    FROM lineitem
    """,
)
def math_elementwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exp/log/sqrt/pow/abs; transcendentals rounded to 6dp (JVM vs libm can
    differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        N.fround(F.log(F.col("l_quantity") + 1.0), 6).alias("log_qty"),
        N.fround(F.exp("l_discount"), 6).alias("exp_disc"),
        N.fround(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        N.fround(F.pow("l_tax", F.lit(2)), 6).alias("tax_sq"),
        F.abs(F.col("l_quantity") - 25.0).alias("abs_dev"),
    )


# --- F11: boolean-derived error-type flags (error_analysis.ipynb:165-171) ---
@query(
    "flag_derive",
    oracle=f"""
    WITH t AS ({_TRUTH_SQL}), p AS ({_PRED_SQL})
    SELECT CASE WHEN t.label = 1 AND p.pred = 1 THEN 'TP'
                WHEN t.label = 0 AND p.pred = 0 THEN 'TN'
                WHEN t.label = 0 AND p.pred = 1 THEN 'FP'
                ELSE 'FN' END AS error_type,
           count(*) AS n
    FROM t JOIN p ON t.id = p.id GROUP BY 1
    """,
)
def flag_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = truth_frame(spark, sf_dir)
    p = pred_frame(spark, sf_dir)
    j = t.join(p, "id")
    flag = (
        F.when((F.col("label") == 1) & (F.col("pred") == 1), "TP")
        .when((F.col("label") == 0) & (F.col("pred") == 0), "TN")
        .when((F.col("label") == 0) & (F.col("pred") == 1), "FP")
        .otherwise("FN")
    )
    return j.groupBy(flag.alias("error_type")).agg(F.count("*").alias("n"))


# --- F12: frame-level ID equality check (experiments/utils/test.py:29) ------
@query(
    "elementwise_compare",
    oracle=f"""
    WITH t AS ({_TRUTH_SQL}), p AS ({_PRED_SQL})
    SELECT (SELECT count(*) FROM t WHERE id NOT IN (SELECT id FROM p)) AS n_unmatched,
           (SELECT count(*) FROM t) AS n_total
    """,
)
def elementwise_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a.ID == b.ID).all() re-expressed as an anti-join count (order-free)."""
    t = truth_frame(spark, sf_dir)
    p = pred_frame(spark, sf_dir)
    unmatched = t.join(p, "id", "left_anti").agg(
        F.count("*").alias("n_unmatched")
    )
    total = t.agg(F.count("*").alias("n_total"))
    return unmatched.crossJoin(total)


# --- JSON property extraction (events.props) ---------------------------------
@query(
    "json_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON `props` payload column JVM-side (`get_json_object` —
    stays in whole-stage codegen, no Python) and aggregate by the extracted
    key. The per-row parse is embarrassingly parallel; the agg is one
    map-side-combined shuffle. DuckDB's JSON extension is the independent
    parser on the oracle side."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy(k.alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("k")
    )


# --- VARIANT (Spark 4 semi-structured type) over events.props -----------------
@query(
    "json_variant_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_field
    FROM events GROUP BY 1
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT path for semi-structured columns: ``parse_json``
    once into the binary VARIANT encoding, then typed ``variant_get``
    extraction (and null-safe ``try_variant_get`` for absent fields) —
    the open-format answer to schemaless JSON columns that, unlike
    per-access ``get_json_object`` string re-parsing
    (json_extract_props), parses each row ONCE however many fields are
    read, and shreds into columnar storage in the table formats that
    support it. All JVM-side expressions; one map-combined shuffle.
    DuckDB's JSON extension is the independent parser on the oracle
    side."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("try_variant_get(v, '$.missing', 'double')")
    return (
        v.groupBy((k % 10).cast("int").alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.sum(missing.isNull().cast("bigint")).alias("n_missing_field"),
        )
    )
