"""Bucketed (pre-partitioned) tables — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides.
Bucketing pays that shuffle ONCE at write time: both tables are hash-
partitioned into the same number of buckets on the join key, so every
subsequent join (and groupBy on the key) reads co-located buckets and
elides the Exchange entirely — `tests/test_bucketing.py` asserts the
Exchange disappears from the physical plan.

This is the Spark-native answer to the reference's repeated ID-keyed merges
(every `pd.merge(..., on="ID")` in final-assignment re-hashes in RAM; here
the layout amortizes it across the pipeline). Pair with `sortBy` on the
key to also elide the join's Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed parquet table (external, at `path`).
    Bucket count should divide evenly into total cores at the target scale;
    both sides of a co-located join must use the SAME count and columns."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned as a
    SortMergeJoin with NO Exchange on either side. The merge hint sits on
    the join INPUT (hints on the joined result are ignored); without it the
    planner may pick a broadcast join and skip the bucketed layout — right
    for a small side, but this operator exists for fact⋈fact."""
    return (
        spark.table(left_table).hint("merge").join(spark.table(right_table), on)
    )
