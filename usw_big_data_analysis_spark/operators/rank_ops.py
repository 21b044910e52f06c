"""Distributed exact mean ranks — scalable scipy-style tie-averaged ranking.

The rank-based statistics (Wilcoxon T4, Mann-Whitney T5, Kruskal-Wallis T7,
Spearman T9, quantile/ECDF transform M7 — SURVEY.md §2.11/§2.9) all need the
global average rank of every value: rank ties get the MEAN of their rank
range, exactly as ``scipy.stats.rankdata`` assigns. The naive formulation —
``rank() OVER (ORDER BY x)`` — is an unpartitioned window: Spark moves the
ENTIRE input to one partition, which is the canonical 100 TB bottleneck
("WindowExec: No Partition Defined" in the logs).

A mean rank depends only on (a) how many rows order strictly below the value
and (b) how many rows tie with it — both are functions of the *distinct-value
histogram*, never of row identity. So the scalable shape mirrors
``percentile_ops``:

  phase 1: one aggregation pass per-value counts  (map-side combined: the
           fact collapses to |distinct| rows before any shuffle)
  phase 2: min/max (one tiny agg) → fixed-width range buckets over the
           value domain; per-bucket subtotals cumulate over the TINY bucket
           histogram via a broadcast triangular join (bounded_seq) — no
           unpartitioned window anywhere
  phase 3: within-bucket prefix sums via a bucket-PARTITIONED window;
           global below(x) = bucket_prev + in_bucket_prefix − cnt(x)
           mean rank r_avg(x) = below(x) + (cnt(x) + 1) / 2

No window ever sees more than one bucket's distinct values; every pass is a
full-parallel aggregation. Exactness: below and cnt are integers, so r_avg
is a half-integer — exactly representable in double and summed exactly (any
order) while rank sums stay < 2^52. Results are therefore bit-identical to
the row-level ``rank()`` formulation the DuckDB oracles use.

Reference sites (ranking semantics): scipy ``rankdata(method='average')``
as invoked by `cross-validation/wine_analysis.py:151` (wilcoxon) and
`Statistical_test_iris_analysis.ipynb:75-76` (mannwhitneyu).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bounded_seq import exclusive_prefix_sums

_NBUCKETS = 1024


def mean_ranks(df: DataFrame, col: str, nbuckets: int = _NBUCKETS) -> DataFrame:
    """Return (``col``, ``cnt``, ``r_avg``): per DISTINCT value of ``col``,
    its multiplicity and its scipy tie-averaged global mean rank (1-based).

    Nulls are excluded (scipy drops NaNs before ranking). Join the result
    back on ``col`` to decorate rows, or combine ``cnt``/``r_avg`` directly
    for rank-sum statistics — decorating is rarely needed.
    """
    pv = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )

    mm = pv.agg(
        F.min(col).cast("double").alias("mn"),
        F.max(col).cast("double").alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / float(nbuckets)
    bounds = mm.select("mn", F.when(width == 0.0, F.lit(1.0)).otherwise(width).alias("w"))

    vb = pv.crossJoin(F.broadcast(bounds)).select(
        col,
        "cnt",
        F.least(
            F.floor((F.col(col).cast("double") - F.col("mn")) / F.col("w")).cast("int"),
            F.lit(nbuckets - 1),
        ).alias("b"),
    )

    hist = vb.groupBy("b").agg(F.sum("cnt").alias("bc"))
    offsets = exclusive_prefix_sums(hist, "b", ["bc"]).withColumnRenamed(
        "prev_bc", "bucket_prev"
    )

    wv = Window.partitionBy("b").orderBy(col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    below = F.col("bucket_prev") + F.sum("cnt").over(wv) - F.col("cnt")
    return vb.join(F.broadcast(offsets), "b").select(
        col,
        "cnt",
        (below + (F.col("cnt") + 1) / 2.0).alias("r_avg"),
    )
