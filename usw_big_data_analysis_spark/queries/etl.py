"""End-to-end metadata-driven ETL pipeline (SURVEY.md §3.1) — the full
reference lifecycle as ONE query: union years over the schema intersection
→ compiled sentinel recodes → row filter → data-dependent null-ratio column
prune → threshold label (+ leakage drop) → stratified split → summary.

Library: operators/etl_ops.py. The oracle reproduces every stage in SQL,
including the prune *decision* (ratio CTE), so the driver checks the whole
lifecycle, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..operators import etl_ops
from ..registry import query
from ..sources import load_table

_PRUNE_TAU = 0.8
_LABEL_TAU = 150000.0

# the simulated "year files": orders halved by key parity; year-a carries an
# extra column that must disappear in the schema-intersection union; `code`
# plays the KNHANES coded variable (8 = don't-know, 9 = not-applicable),
# `sparse` a mostly-null variable the ratio prune must drop.
_YEAR_SQL = """
  SELECT o_orderkey, o_totalprice,
         CAST(o_custkey % 10 AS DOUBLE) AS code,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice END AS sparse
  FROM orders WHERE o_orderkey % 2 = {parity}
"""

_META_OPTIONS = "8:모름 | 9:해당없음"


@query(
    "etl_pipeline",
    oracle=f"""
    WITH y22 AS ({_YEAR_SQL.format(parity=0)}),
    y23 AS ({_YEAR_SQL.format(parity=1)}),
    unioned AS (SELECT * FROM y22 UNION ALL SELECT * FROM y23),
    recoded AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN code = 8.0 THEN NULL
                  WHEN code = 9.0 THEN -1.0
                  ELSE code END AS code,
             sparse
      FROM unioned
    ),
    filtered AS (SELECT * FROM recoded WHERE o_totalprice >= 1000.0),
    ratios AS (
      SELECT CAST(sum(CAST(code IS NULL AS BIGINT)) AS DOUBLE) / count(*) AS r_code,
             CAST(sum(CAST(sparse IS NULL AS BIGINT)) AS DOUBLE) / count(*) AS r_sparse
      FROM filtered
    ),
    labeled AS (
      SELECT o_orderkey, code,
             CAST(o_totalprice > {_LABEL_TAU} AS INT) AS label
      FROM filtered WHERE o_totalprice IS NOT NULL
    ),
    split AS (
      SELECT label, code,
             CASE WHEN row_number() OVER (PARTITION BY label ORDER BY o_orderkey)
                       % 5 = 0
                  THEN 'test' ELSE 'train' END AS split
      FROM labeled
    )
    SELECT s.split, s.label, count(*) AS n,
           round({N.sql_davg('s.code')}, 6) AS mean_code,
           2 + CAST(r.r_code <= {_PRUNE_TAU} AS INT)
             + CAST(r.r_sparse <= {_PRUNE_TAU} AS INT) AS n_cols_kept
    FROM split s CROSS JOIN ratios r
    GROUP BY s.split, s.label, r.r_code, r.r_sparse
    """,
)
def etl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.1 lifecycle through etl_ops: everything is one lazy DAG except
    the null-ratio aggregation (inherent 2-pass — the surviving schema
    depends on the data). n_cols_kept asserts the prune decision itself:
    `sparse` (90% null) must be dropped, `code` (~10% null) kept."""
    orders = load_table(spark, sf_dir, "orders")

    def year(parity: int, with_extra: bool) -> DataFrame:
        y = orders.filter(F.col("o_orderkey") % 2 == parity).select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_custkey") % 10).cast("double").alias("code"),
            F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice")).alias(
                "sparse"
            ),
        )
        # the 2022 file has an extra variable the union must drop
        return y.withColumn("extra", F.lit("y22-only")) if with_extra else y

    y22, y23 = year(0, True), year(1, False)
    unioned = etl_ops.union_years(y22, y23)
    assert "extra" not in unioned.columns

    metas = [
        etl_ops.VarMeta(name="code", data_type="category", options=_META_OPTIONS)
    ]
    recoded = etl_ops.apply_recodes(unioned, metas)
    filtered = recoded.filter(F.col("o_totalprice") >= 1000.0)
    pruned, ratios = etl_ops.null_ratio_prune(
        filtered, ["code", "sparse"], _PRUNE_TAU
    )
    labeled = etl_ops.threshold_label(pruned, "o_totalprice", _LABEL_TAU)
    split = etl_ops.stratified_split(labeled, "label", ["o_orderkey"])
    # modeling-frame width: pruned minus the dropped label source, plus label
    n_cols_kept = len(pruned.columns) - 1 + 1
    return split.groupBy("split", "label").agg(
        F.count("*").alias("n"),
        F.round(N.davg("code"), 6).alias("mean_code"),
        F.lit(n_cols_kept).cast("int").alias("n_cols_kept"),
    )
