"""Reusable crosstab — pd.crosstab(index, cols, margins, normalize='index').

The reference builds contingency tables 10+ times
(1-2.labeling_XYdataset.ipynb:492-497,628-634; experiments/target_eda.py:
39-53,240; experiments/train_test_comparison.py:53-54,113), always the same
shape: multi-key index × class column → counts, an 'All' margin row, and
row-normalized proportions. One helper, ONE aggregation pass per table:
classes are conditional counts (never a distinct-scan pivot) and the margin
row comes from GROUPING SETS ((keys...), ()) — a single Expand + partial-agg
shuffle instead of the round-1 two-job scan+union (the bench's worst
Spark/DuckDB ratio, 34x, was exactly that second job's fixed cost).

Pass `classes` explicitly — at 100 TB a `pivot()` without values triggers a
full distinct job before planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crosstab(
    df: DataFrame,
    index_cols: list[str],
    class_col: str,
    classes: list,
    margins: bool = True,
    normalize_index: bool = True,
    margin_label: str = "All",
) -> DataFrame:
    """Counts of `class_col` values per `index_cols` group:
    columns n_<k> per class, row_total, optional margin row and p_<k>
    row proportions. Class-count column names use str(k)."""
    aggs = [
        F.sum((F.col(class_col) == k).cast("bigint")).alias(f"n_{k}")
        for k in classes
    ] + [F.count("*").alias("row_total")]
    if margins:
        grouped = df.groupingSets(
            [[F.col(c) for c in index_cols], []],
            *[F.col(c) for c in index_cols],
        )
        cells = grouped.agg(
            *[F.grouping(c).alias(f"__g_{c}") for c in index_cols], *aggs
        ).select(
            *[
                F.when(F.col(f"__g_{c}") == 1, margin_label)
                .otherwise(F.col(c))
                .alias(c)
                for c in index_cols
            ],
            *[f"n_{k}" for k in classes],
            "row_total",
        )
    else:
        cells = df.groupBy(*index_cols).agg(*aggs)
    out = cells
    if normalize_index:
        for k in classes:
            out = out.withColumn(
                f"p_{k}", F.col(f"n_{k}").cast("double") / F.col("row_total")
            )
    return out
