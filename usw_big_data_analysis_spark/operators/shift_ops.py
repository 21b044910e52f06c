"""Distributed cyclic lead — next-row-in-global-order without a global sort.

``feature_importance_perm`` (SURVEY.md §2.9 M15) needs a deterministic
derangement of a column: row i receives row i+1's value in the global
(order key) order, and the last row wraps around to the first. The naive
formulation — ``lead(v) OVER (ORDER BY k)`` — is an unpartitioned window:
Spark moves the ENTIRE input to one partition ("WindowExec: No Partition
Defined"), the canonical 100 TB bottleneck.

But the next row in global order is almost always the next row in the SAME
range bucket of the leading order key; only each bucket's last row needs a
value from elsewhere, and that value is exactly the first row of the next
non-empty bucket (or the global first row, for the last bucket). So the
scalable shape mirrors ``rank_ops`` / ``percentile_ops``:

  phase 1: min/max of the leading key (one tiny agg) → fixed-width range
           buckets; bucket id is a pure projection, no shuffle
  phase 2: ``lead`` under a bucket-PARTITIONED window — a parallel
           hash-partitioned sort, never SinglePartition
  phase 3: per-bucket first rows (one map-side-combined ``min(struct)``
           agg → ≤ n_buckets rows); the TINY firsts table chains each
           bucket to the next non-empty one via broadcast triangular
           joins (bounded_seq convention — no unpartitioned window
           anywhere); broadcast the wrap values back

Exactness: buckets are contiguous ranges of the leading key, so
(bucket, order…) order ≡ global order and the stitched result is
bit-identical to the single-window formulation the DuckDB oracle uses.
The order key must be unique per row (e.g. a primary key) — with ties the
"next row" is itself underdetermined.

Reference site (permutation-importance shuffle this derangement replaces):
wine quality ipynb feature-importance cell (SURVEY.md M15,
`wine…11….ipynb:5539-5552`); sklearn ``permutation_importance`` shuffles
in RAM — this pays the same per-partition sort cost but distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NBUCKETS = 1024


def cyclic_lead(
    df: DataFrame,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    nbuckets: int = _NBUCKETS,
) -> DataFrame:
    """Add ``{v}_next`` for each ``v`` in ``value_cols``: the value of the
    next row in the global ``order_cols`` order, the last row wrapping to
    the global first row (a cyclic shift — a genuine derangement).

    ``order_cols`` must be non-null and jointly unique per row; the leading
    order column must be numeric (it is range-bucketed).
    """
    order_cols = list(order_cols)
    value_cols = list(value_cols)
    k0 = order_cols[0]

    mm = df.agg(
        F.min(k0).cast("double").alias("mn"),
        F.max(k0).cast("double").alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / float(nbuckets)
    bounds = mm.select("mn", F.when(width == 0.0, F.lit(1.0)).otherwise(width).alias("w"))

    withb = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__b",
        F.least(
            F.floor((F.col(k0).cast("double") - F.col("mn")) / F.col("w")).cast("int"),
            F.lit(nbuckets - 1),
        ),
    ).drop("mn", "w")

    wb = Window.partitionBy("__b").orderBy(*order_cols)
    led = withb.select(
        "*",
        F.lead(k0).over(wb).alias("__nk"),
        *[F.lead(v).over(wb).alias(f"__lead_{v}") for v in value_cols],
    )

    # per-bucket first row: min over a struct whose leading fields are the
    # (unique) order key, so value fields never influence the ordering;
    # value cols already in the key are not duplicated in the struct
    fields = order_cols + [v for v in value_cols if v not in order_cols]
    firsts = withb.groupBy("__b").agg(F.min(F.struct(*fields)).alias("__s"))
    # wrap for bucket b = first row of the next non-empty bucket, or the
    # global first row for the last bucket — branch on NEXT-BUCKET
    # EXISTENCE, never on the value (a legitimately-NULL value must wrap
    # through unchanged). Chained by broadcast joins over the tiny firsts
    # table (bounded_seq convention — no unpartitioned window anywhere).
    nxt = (
        firsts.select("__b")
        .join(
            F.broadcast(firsts.select(F.col("__b").alias("__b2"))),
            F.col("__b2") > F.col("__b"),
            "left",
        )
        .groupBy("__b")
        .agg(F.min("__b2").alias("__nb"))
    )
    gfirst = firsts.agg(F.min(F.struct("__b", "__s")).alias("__g")).select(
        F.col("__g.__s").alias("__gs")
    )
    nfirsts = firsts.select(F.col("__b").alias("__nb2"), F.col("__s").alias("__ns"))
    wraps = (
        nxt.join(F.broadcast(nfirsts), F.col("__nb") == F.col("__nb2"), "left")
        .crossJoin(F.broadcast(gfirst))
        .select(
            "__b",
            *[
                F.when(F.col("__nb").isNotNull(), F.col("__ns").getField(v))
                .otherwise(F.col("__gs").getField(v))
                .alias(f"__wrap_{v}")
                for v in value_cols
            ],
        )
    )

    out = led.join(F.broadcast(wraps), "__b")
    is_last = F.col("__nk").isNull()
    return out.select(
        *df.columns,
        *[
            F.when(is_last, F.col(f"__wrap_{v}"))
            .otherwise(F.col(f"__lead_{v}"))
            .alias(f"{v}_next")
            for v in value_cols
        ],
    )
