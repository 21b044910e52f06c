"""Skew mitigation: salted joins and two-level aggregations.

At 100 TB a single hot key (one customer with 10% of all rows) makes one
shuffle partition the straggler. Two standing answers, both here:

- AQE skew-join splitting (spark.sql.adaptive.skewJoin — enabled in
  session.py) handles moderate skew automatically at runtime.
- For pathological keys, SALTING redistributes deterministically: the big
  side appends salt = pmod(hash(row_id), n) to the join key; the small
  side is exploded n ways (one copy per salt). The join key becomes
  (key, salt) — the hot key's rows spread over n partitions. Cost: small
  side inflates n×, so n trades straggler time against duplication.

Salts derive from a row-unique column, NOT rand(): rand() is partition-
order dependent in Spark, breaking reproducibility (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small on key`, salted n ways. `salt_from` is any
    row-distinguishing column of `big` (an id works; uniformity, not
    uniqueness, is what matters)."""
    salted_big = big.withColumn("__salt", F.pmod(F.hash(F.col(salt_from)), n_salts))
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def two_level_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Aggregation over a skewed key in two shuffles: (key, salt) partial,
    then key final. Use when the aggregate's per-key state is big enough
    that Spark's map-side partial aggregation stops helping (e.g.
    collect_set / count-distinct on hot keys); for plain sums the built-in
    partial aggregation already does this implicitly."""
    salted = df.withColumn("__salt", F.pmod(F.hash(F.col(salt_from)), n_salts))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)
