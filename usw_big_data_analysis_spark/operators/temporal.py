"""Temporal joins — as-of and bounded range joins, Spark-native.

The reference never joins on time (all its merges are ID equi-joins,
SURVEY.md §2.3), but any event-log pipeline needs these two shapes, and
neither is a Spark built-in:

- **As-of join**: for each left row, the LATEST right row with
  ``right.ts <= left.ts`` within the same key. The naive formulation is a
  per-row correlated subquery; the scalable Spark shape is the
  union-and-carry trick: tag both sides, union them, and run
  ``last(value, ignorenulls=True)`` over a window PARTITIONED BY KEY
  ordered by (ts, side) — right rows sort before left rows at equal ts,
  so the carry respects <=. One hash shuffle on the key, no
  BroadcastNestedLoopJoin, parallel across keys.

- **Range join** (left.ts − horizon <= right.ts <= left.ts): the naive
  inequality join plans as BroadcastNestedLoop (O(n·m) — dead at scale).
  Binning both sides to ``horizon``-width buckets turns it into an
  EQUI-join on (key, bin) hitting only each row's bin and its successor,
  then the exact predicate filters the edges: O(matches) work, ordinary
  hash shuffles only.

DuckDB has native ASOF JOIN and IEJoin range joins, which makes both
oracle-checkable against genuinely independent implementations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``{c}{suffix}`` for each c
    in ``right_cols`` — taken from the latest ``right`` row with
    ``right.{ts} <= left.{ts}`` and equal ``on`` keys (null when no such
    row). ``right`` needs at most one row per (on, ts) for the match to be
    well-defined."""
    on = list(on)
    right_cols = list(right_cols)
    l2 = left.withColumn("__src", F.lit(1))
    r2 = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = Window.partitionBy(*on).orderBy(ts, "__src").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = {
        f"{c}{suffix}": F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        for c in right_cols
    }
    return u.withColumns(carried).filter(F.col("__src") == 1).drop("__src")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    horizon_s: int,
    right_cols: Sequence[str],
    suffix: str = "_r",
) -> DataFrame:
    """Inner range join: all (left, right) pairs with equal ``on`` keys and
    ``left.{ts} - horizon_s <= right.{ts} <= left.{ts}``. Both sides bin to
    ``horizon_s``-wide epoch buckets; a right row in bin b can only match
    left rows in bins b or b+1, so the left side expands 2x onto
    (key, bin) equi-join keys and the exact predicate prunes the edges."""
    on = list(on)
    right_cols = list(right_cols)
    lbin = F.floor(F.unix_micros(F.col(ts)) / (horizon_s * 1_000_000))
    # left probes its own bin and the previous one (right rows there may
    # still be within the horizon)
    l2 = left.withColumn(
        "__bin", F.explode(F.array(lbin.cast("long"), lbin.cast("long") - 1))
    )
    r2 = right.select(
        *on,
        F.col(ts).alias("__rts"),
        F.floor(F.unix_micros(F.col(ts)) / (horizon_s * 1_000_000))
        .cast("long")
        .alias("__bin"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    j = l2.join(r2, [*on, "__bin"])
    in_range = (F.col("__rts") <= F.col(ts)) & (
        F.col("__rts") >= F.col(ts) - F.expr(f"INTERVAL {horizon_s} SECONDS")
    )
    return j.filter(in_range).drop("__bin", "__rts")
