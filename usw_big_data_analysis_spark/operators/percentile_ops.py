"""Distributed exact percentiles — the two-phase bucketed design.

Exact interpolated percentiles (pandas/numpy 'linear' semantics) normally
need a global per-column sort or a per-column cumulative window — both
single-partition bottlenecks at scale. The standard scalable shape:

  phase 1: per-column min/max (one agg) → fixed bucket width W
  phase 2: histogram (col, bucket) counts (one agg, map-side combined),
           cumulated over the TINY histogram to locate, for every target
           rank r = (n-1)p + 1, the bucket containing order statistics
           floor(r) and ceil(r)
  phase 3: per-value counts ONLY inside the located buckets (a semi-join
           prunes everything else), tiny window, pick the two bracketing
           values, interpolate vlo + frac·(vhi − vlo)

Every pass is a full-parallel aggregation; no window ever sees more than
one bucket's distinct values. The result is EXACT — identical to a global
sort — so oracle-checked queries can use it interchangeably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NBUCKETS = 4096


def bucketed_exact_percentiles(
    melted: DataFrame,
    ps: list[float],
    nbuckets: int = _NBUCKETS,
    minmax: DataFrame | None = None,
    counts: bool = False,
) -> DataFrame:
    """melted: (col_name, x) long-form numeric table — or, with
    ``counts=True``, a pre-aggregated (col_name, x, cnt) distinct-value
    table (one groupBy upstream turns N fact rows into D distinct values;
    every phase below then touches D rows, never N). Returns one row per
    col_name with a `p_<idx>` column per requested percentile (use dyadic
    p values — .25/.5/.75 — if cross-engine bit-equality matters).

    Pass ``minmax`` — (col_name, mn, mx, ntot) — when the caller already
    aggregated those: it saves a full scan."""
    weight = F.col("cnt") if counts else F.lit(1).cast("bigint")
    if minmax is None:
        minmax = melted.groupBy("col_name").agg(
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
            F.sum(weight).alias("ntot")
            if counts
            else F.count("x").alias("ntot"),
        )
    w_width = (F.col("mx") - F.col("mn")) / float(nbuckets)
    bounds = minmax.select(
        "col_name", "mn", "ntot", w_width.alias("w")
    )

    with_b = melted.join(F.broadcast(bounds), "col_name").select(
        "col_name",
        "x",
        "ntot",
        weight.alias("wt"),
        bucket_expr(nbuckets).alias("b"),
    )
    hist = with_b.groupBy("col_name", "b", "ntot").agg(F.sum("wt").alias("cnt"))
    return percentiles_from_hist(with_b, hist, ps)


def bucket_expr(nbuckets: int = _NBUCKETS) -> Column:
    """Bucket index for a row carrying (x, mn, w) — shared by callers that
    build their own enriched histogram (describe fuses its moment sums into
    the phase-2 pass)."""
    return (
        F.when(F.col("w") == 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("x") - F.col("mn")) / F.col("w")).cast("int"),
                F.lit(nbuckets - 1),
            )
        )
    )


def percentiles_from_hist(
    with_b: DataFrame, hist: DataFrame, ps: list[float]
) -> DataFrame:
    """Phases 2-3 of the bucketed exact-percentile design, given
    ``with_b`` = (col_name, x, ntot, wt, b) bucketed rows and ``hist`` =
    (col_name, b, ntot, cnt) bucket counts. Callers that already aggregate
    a per-bucket pass (describe's moment-carrying histogram) hand it in
    here so the fact is not scanned a second time for the histogram."""
    spark = with_b.sparkSession

    # locate target buckets on the tiny histogram. The partition spec
    # includes ntot — an aggregate OUTPUT, never foldable — because callers
    # that melt a single column use a LITERAL col_name, which Catalyst
    # constant-folds OUT of the spec; partitioning on col_name alone then
    # plans as an unpartitioned WindowExec at runtime (the warning the repo
    # invariant bans). ntot is functionally dependent on col_name, so the
    # grouping is identical and the window input stays histogram-bounded.
    wcum = Window.partitionBy("col_name", "ntot").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marks = hist.select(
        "col_name",
        "b",
        "ntot",
        F.sum("cnt").over(wcum).alias("cum"),
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("prev"),
    )
    # VALUES literal, not createDataFrame: the latter serializes through
    # the JVM gateway (~0.2-0.3s per call) — material when the whole query
    # compiles in under a second
    values = ", ".join(
        f"({i}, CAST({p!r} AS DOUBLE))" for i, p in enumerate(ps)
    )
    pdim = spark.sql(f"SELECT * FROM VALUES {values} AS t(pi, p)")
    r = (F.col("ntot") - 1) * F.col("p") + 1
    targets = (
        marks.crossJoin(F.broadcast(pdim))
        .filter(
            ((F.col("prev") < F.floor(r)) & (F.col("cum") >= F.floor(r)))
            | ((F.col("prev") < F.ceil(r)) & (F.col("cum") >= F.ceil(r)))
        )
        .select("col_name", "b")
        .distinct()
    )

    # phase 3: exact value counts inside located buckets only; each value's
    # global rank = its bucket's histogram offset (`prev` from marks) + its
    # cumulative position WITHIN the bucket — correct even when the located
    # buckets for different ranks are far apart
    narrowed = with_b.join(targets, ["col_name", "b"], "leftsemi")
    vals = narrowed.groupBy("col_name", "b", "x", "ntot").agg(
        F.sum("wt").alias("cnt")
    )
    bucket_offsets = marks.join(targets, ["col_name", "b"], "leftsemi").select(
        "col_name", "b", F.col("prev").alias("bucket_prev")
    )
    wv = Window.partitionBy("col_name", "b").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vals.join(F.broadcast(bucket_offsets), ["col_name", "b"]).select(
        "col_name",
        "x",
        "ntot",
        (F.col("bucket_prev") + F.sum("cnt").over(wv)).alias("cum"),
        (F.col("bucket_prev") + F.sum("cnt").over(wv) - F.col("cnt")).alias("prev"),
    )
    rr = (F.col("ntot") - 1) * F.col("p") + 1
    hits = (
        ranked.crossJoin(F.broadcast(pdim))
        .groupBy("col_name", "pi", "p")
        .agg(
            F.max(
                F.when(
                    (F.col("prev") < F.floor(rr)) & (F.col("cum") >= F.floor(rr)),
                    F.col("x"),
                )
            ).alias("vlo"),
            F.max(
                F.when(
                    (F.col("prev") < F.ceil(rr)) & (F.col("cum") >= F.ceil(rr)),
                    F.col("x"),
                )
            ).alias("vhi"),
            F.max(rr - F.floor(rr)).alias("frac"),
        )
    )
    interp = F.col("vlo") + F.col("frac") * (F.col("vhi") - F.col("vlo"))
    out = hits.groupBy("col_name").agg(
        *[
            F.max(F.when(F.col("pi") == i, interp)).alias(f"p_{i}")
            for i in range(len(ps))
        ]
    )
    return out
