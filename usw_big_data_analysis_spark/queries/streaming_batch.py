"""Windowed event aggregations over `events` — the batch-checkable semantics
of the streaming operators (SURVEY.md §2.12; north-star extension).

The same window logic runs in Structured Streaming via
``streaming/ops.py`` (readStream + withWatermark + window/session_window,
validated with a memory sink in tests/test_streaming.py); these batch queries
pin the window semantics against the DuckDB oracle: tumbling = epoch-aligned
bucket, sliding = every slide-aligned window covering the event, session =
gap-split cumulative numbering.

Window starts are emitted as epoch seconds (bigint) — timestamp objects
round-trip differently across engines; epoch integers don't.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table
from ._shared import process_tmp as _process_tmp


# --- tumbling window (10 min) ----------------------------------------------
@query(
    "stream_tumbling",
    oracle=f"""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type, count(*) AS n, {N.sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "10 minutes").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"), N.dsum("value").alias("sum_value"))
    return agg.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


# --- sliding window (10 min / 5 min slide) ----------------------------------
@query(
    "stream_sliding",
    oracle=f"""
    WITH starts AS (
      SELECT CAST(floor(epoch(ts) / 300) * 300 - k * 300 AS BIGINT) AS window_start,
             event_type, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT window_start, event_type, count(*) AS n, {N.sql_dsum('value')} AS sum_value
    FROM starts GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(ts, width=10m, slide=5m): every event belongs to width/slide
    windows — the oracle enumerates both slide-aligned starts explicitly."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"), N.dsum("value").alias("sum_value"))
    return agg.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


# --- session windows (30 min gap) per user ----------------------------------
@query(
    "stream_session",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, value, epoch(ts) AS tsd,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id) > 1800
                  OR lag(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, value, tsd,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY tsd, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM t
    )
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(floor(min(tsd)) AS BIGINT) AS session_start,
           CAST(floor(max(tsd)) AS BIGINT) AS session_end,
           {N.sql_dsum('value')} AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag → new-session flag → running
    session counter → per-session aggregates. One shuffle on user_id; the
    streaming twin uses session_window(ts, '30 minutes')."""
    # materialize tsd BEFORE the first window: ordering both windows by the
    # same named column (not once by the cast-expression, once by the
    # column) lets Spark see the sort orders as identical and plan ONE Sort
    # under both Window nodes instead of re-sorting between them
    # (optimization r07, guide §2.4 — 2 Sorts -> 1, same single exchange)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.col("ts").cast("double").alias("tsd")
    )
    order = Window.partitionBy("user_id").orderBy("tsd", "event_id")
    gap = F.col("tsd") - F.lag("tsd").over(order)
    new_session = F.when(
        gap.isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    t = ev.select(
        "user_id", "event_id", "value", "tsd", new_session.alias("ns")
    )
    run = Window.partitionBy("user_id").orderBy("tsd", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = t.withColumn("session_id", F.sum("ns").over(run))
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.floor(F.min("tsd")).cast("bigint").alias("session_start"),
        F.floor(F.max("tsd")).cast("bigint").alias("session_end"),
        N.dsum("value").alias("sum_value"),
    )


# --- real Structured Streaming execution, oracle-checked ---------------------
@query(
    "stream_stateful_profile",
    oracle="""
    SELECT user_id, count(*) AS n_events, max(value) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the ACTUAL streaming engine (readStream → applyInPandasWithState
    → memory sink, drained with processAllAvailable): per-user running
    profiles from the custom stateful operator in streaming/ops.py.

    Oracle-checkable because the input is bounded and fully drained: the
    LAST update-mode emission per user is the complete profile, so
    max(n_events)/max(max_value) over all emissions equal the batch
    count(*)/max(value) per user (update mode re-emits monotone running
    values; the fixture has no NULL values, checked in FIXTURES.md terms).
    Streaming-vs-batch equivalence is also pinned in tests/test_streaming.py."""
    import uuid

    from ..streaming import ops

    name = f"q_stateful_{uuid.uuid4().hex[:8]}"
    stream = ops.read_events_stream(spark, sf_dir)
    q = (
        ops.running_user_profile(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
        .orderBy("user_id")
    )


# --- real streaming exact dedup under at-least-once delivery -----------------
@query(
    "stream_dedup_exact",
    oracle=f"""
    SELECT event_type, count(*) AS n, {N.sql_dsum('value')} AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact streaming dedup through the ACTUAL streaming engine: the event
    stream is unioned with a second read of the same source — the classic
    at-least-once redelivery shape — and ``dedup_stream`` (watermarked
    ``dropDuplicates`` on event_id, streaming/ops.py) removes the
    duplicates in-flight. Every event arrives exactly twice, so the oracle
    is the plain batch aggregate over the ORIGINAL table (event_id is
    unique in the fixture): hash-matching it proves the dedup dropped each
    duplicate and nothing else."""
    import uuid

    from ..streaming import ops

    name = f"q_dedup_{uuid.uuid4().hex[:8]}"
    once = ops.read_events_stream(spark, sf_dir)
    redelivered = once.unionByName(ops.read_events_stream(spark, sf_dir))
    q = (
        ops.dedup_stream(redelivered)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), N.dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )


# --- real stream-stream interval join ----------------------------------------
@query(
    "stream_join_range",
    oracle="""
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           l.value AS click_value, r.event_id AS purchase_id,
           r.value AS purchase_value, epoch_us(r.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 10 MINUTE
    """,
)
def stream_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join through the actual engine (two
    watermarked readStreams of the event source, filtered to clicks and
    purchases, joined on user within a 10-minute lookback; buffered-state
    eviction follows the watermark). Same oracle as the batch `join_range`
    — a bounded fully-drained stream must produce exactly the batch
    answer."""
    import uuid

    from ..streaming import ops

    name = f"q_ssjoin_{uuid.uuid4().hex[:8]}"
    clicks = ops.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = ops.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        ops.stream_range_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return spark.table(name).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "click_value",
        "purchase_id",
        "purchase_value",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
    )


# --- stream-stream LEFT OUTER interval join ----------------------------------
@query(
    "stream_join_outer",
    oracle="""
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           l.value AS click_value, r.event_id AS purchase_id,
           r.value AS purchase_value, epoch_us(r.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 10 MINUTE
    """,
)
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join through the actual engine:
    clicks with no purchase in their 10-minute lookback emit null-padded —
    but a streaming engine can only issue that verdict once the watermark
    proves no matching purchase can still arrive. The staging replays the
    events as two pinned micro-batches: (0) every real event, (1) a single
    far-future flush event (max ts + 2h, filtered out of both join sides
    AFTER the watermark node so it advances time without joining). The
    flush pushes the watermark past every click's match window, so state
    fully drains and the bounded stream must equal the batch LEFT JOIN —
    which is exactly what the oracle states. Without the flush, trailing
    unmatched clicks would sit in state forever: the required-watermark
    rule for outer stream-stream joins, demonstrated rather than assumed."""
    import shutil
    import tempfile
    import uuid

    from ..streaming import ops

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]  # scalar: stages the demo input
    # one flush event PER SIDE, keyed user_id = -1 (matches nothing): the
    # global watermark is the MIN over both sides' watermark nodes, so both
    # inputs must see far-future event time before unmatched-left state can
    # drain. The sentinel rows are dropped from the final result below.
    flush = spark.createDataFrame(
        [
            tuple([-1, mx, -1, "click", 0.0] + [None] * (len(ev.columns) - 5)),
            tuple([-2, mx, -1, "purchase", 0.0] + [None] * (len(ev.columns) - 5)),
        ],
        schema=ev.schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))

    root = os.path.join(tempfile.gettempdir(), f"usw_q_sjo_{uuid.uuid4().hex[:8]}")
    watch = os.path.join(root, "in")
    os.makedirs(watch)
    for i, part_df in enumerate((ev, flush)):
        stage = os.path.join(root, f"stage{i}")
        part_df.coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(watch, f"{i:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    name = f"q_sjoin_outer_{uuid.uuid4().hex[:8]}"
    q = (
        ops.stream_range_join(clicks, purchases, how="left_outer")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    shutil.rmtree(root, ignore_errors=True)
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)  # drop the flush sentinels
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "click_value",
            "purchase_id",
            "purchase_value",
            F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        )
    )


# --- dedup within watermark (jittered redelivery) ----------------------------
@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` through the real engine: the
    at-least-once redelivery case where the duplicate arrives with a
    DIFFERENT event time (a retried producer restamps — Kafka redelivery
    after a broker failover). Plain ``dropDuplicates`` keyed on
    (event_id, ts) would pass such duplicates through; the within-watermark
    variant keys on event_id alone and holds each first-seen key in state
    for the watermark delay, suppressing any re-arrival inside it. Staged
    as two pinned micro-batches — (0) every event, (1) every event again
    with ts + 7 s — so the drained output must equal the original table
    exactly, which is what the oracle states. State is evicted past the
    horizon, so memory is bounded by arrival skew, not history."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    jittered = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 7 SECONDS"))

    root = os.path.join(tempfile.gettempdir(), f"usw_q_ddw_{uuid.uuid4().hex[:8]}")
    watch = os.path.join(root, "in")
    os.makedirs(watch)
    for i, part_df in enumerate((ev, jittered)):
        stage = os.path.join(root, f"stage{i}")
        part_df.coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(watch, f"{i:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = f"q_ddw_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    shutil.rmtree(root, ignore_errors=True)
    return spark.table(name).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


# --- transformWithState: arbitrary per-key state (Spark 4 API) ---------------
@query(
    "stream_topk_state",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ),
    tot AS (SELECT user_id, count(*) AS n_seen FROM events GROUP BY user_id)
    SELECT t.user_id, t.n_seen,
           max(CASE WHEN rn = 1 THEN value END) AS top1_v,
           max(CASE WHEN rn = 2 THEN value END) AS top2_v,
           max(CASE WHEN rn = 3 THEN value END) AS top3_v
    FROM tot t JOIN ranked r ON t.user_id = r.user_id
    WHERE r.rn <= 3
    GROUP BY t.user_id, t.n_seen
    """,
)
def stream_topk_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator with a BOUNDED composite state: each user
    key holds its top-3 (value, event_id) pairs plus a seen-count in
    ``applyInPandasWithState`` group state, merged per micro-batch. (The
    Spark 4 ``transformWithStateInPandas`` successor API needs protobuf,
    absent in this container — the state semantics are identical; swapping
    the decorator is mechanical.) The events replay as TWO pinned
    micro-batches (split by event_id parity) so the state genuinely carries
    across batches; every batch emits the key's current (n_seen, top-3),
    and the final answer per key is the emission with the largest n_seen —
    which a fully drained bounded stream must make equal to the batch
    window top-3, exactly what the oracle states. State is O(k) per key by
    construction — the operator never buffers a key's history, which is
    the point of arbitrary-state operators at 100 TB/day."""
    import shutil
    import tempfile
    import uuid

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ev = load_table(spark, sf_dir, "events")

    root = os.path.join(tempfile.gettempdir(), f"usw_q_tws_{uuid.uuid4().hex[:8]}")
    watch = os.path.join(root, "in")
    os.makedirs(watch)
    for i, part_df in enumerate(
        (ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1))
    ):
        stage = os.path.join(root, f"stage{i}")
        part_df.coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(watch, f"{i:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("v1", DoubleType()),
            StructField("e1", LongType()),
            StructField("v2", DoubleType()),
            StructField("e2", LongType()),
            StructField("v3", DoubleType()),
            StructField("e3", LongType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_seen", LongType()),
            StructField("top1_v", DoubleType()),
            StructField("top2_v", DoubleType()),
            StructField("top3_v", DoubleType()),
        ]
    )

    def topk_fn(key, rows, state: GroupState):
        pairs: list[tuple[float, int]] = []
        n = 0
        if state.exists:
            s = state.get
            n = int(s[0])
            for v, e in ((s[1], s[2]), (s[3], s[4]), (s[5], s[6])):
                if e is not None and e >= 0:
                    pairs.append((float(v), int(e)))
        for pdf in rows:
            n += len(pdf)
            pairs.extend(
                zip(pdf["value"].astype(float), pdf["event_id"].astype(int))
            )
        # bounded merge: value DESC, event_id ASC tie-break, keep 3
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:3]
        padded = pairs + [(None, -1)] * (3 - len(pairs))
        state.update(
            (
                n,
                padded[0][0], padded[0][1],
                padded[1][0], padded[1][1],
                padded[2][0], padded[2][1],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_seen": [n],
                "top1_v": [pairs[0][0] if len(pairs) > 0 else None],
                "top2_v": [pairs[1][0] if len(pairs) > 1 else None],
                "top3_v": [pairs[2][0] if len(pairs) > 2 else None],
            }
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    emitted = (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            topk_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"q_tws_{uuid.uuid4().hex[:8]}"
    q = (
        emitted.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    shutil.rmtree(root, ignore_errors=True)
    # final answer per key = the emission after its last batch (max n_seen)
    per_key = spark.table(name).groupBy("user_id").agg(
        F.max_by(
            F.struct("n_seen", "top1_v", "top2_v", "top3_v"), F.col("n_seen")
        ).alias("s")
    )
    return per_key.select(
        "user_id", "s.n_seen", "s.top1_v", "s.top2_v", "s.top3_v"
    )


# --- streaming file sink (exactly-once) -------------------------------------
@query(
    "stream_sink_files",
    oracle=f"""
    SELECT event_type, count(*) AS n, {N.sql_dsum('value')} AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_sink_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once file sink: the event stream writes parquet through
    the streaming commit log (checkpoint + _spark_metadata manifest — a
    failed/retried micro-batch can never double-count), then a batch read
    of the sink aggregates per type. Hash-matching the batch aggregate
    over the ORIGINAL table proves the sink delivered every event exactly
    once. This is the bronze-layer landing pattern: at scale the same
    query runs continuously and each micro-batch appends atomically."""
    import shutil
    import tempfile as _tf
    import uuid

    from ..streaming import ops

    base = _tf.mkdtemp(prefix=f"usw_stream_sink_{uuid.uuid4().hex[:8]}_")
    out = f"{base}/out"
    ckpt = f"{base}/ckpt"
    q = (
        ops.read_events_stream(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    landed = spark.read.parquet(out)
    result = (
        landed.groupBy("event_type")
        .agg(F.count("*").alias("n"), N.dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )
    rows = result.collect()  # materialize before cleaning the sink dir
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


# --- foreachBatch incremental upsert ----------------------------------------
@query(
    "stream_upsert_foreachbatch",
    oracle="""
    SELECT user_id, epoch_us(ts) AS last_ts_us, event_id AS last_event_id,
           event_type AS last_event_type
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert via foreachBatch: every micro-batch pre-reduces to
    its per-user latest row (max of the unique (ts_us, event_id) struct —
    a map-side-combinable aggregate, NOT a window) and appends to a
    staging log; the read side merges the log with the same aggregate —
    the append-log + merge-on-read upsert used when the sink has no
    transactional MERGE. Hash-matching the batch latest-per-user proves
    upsert semantics survived micro-batching. At scale the merge happens
    on a schedule (compaction) instead of per read."""
    import shutil
    import tempfile as _tf
    import uuid

    from ..streaming import ops

    base = _tf.mkdtemp(prefix=f"usw_upsert_{uuid.uuid4().hex[:8]}_")
    stage = f"{base}/stage"
    ckpt = f"{base}/ckpt"

    def _upsert_batch(batch_df: DataFrame, _batch_id: int) -> None:
        (
            batch_df.select(
                "user_id",
                F.struct(
                    F.unix_micros("ts").alias("ts_us"),
                    F.col("event_id"),
                    F.col("event_type"),
                ).alias("s"),
            )
            .groupBy("user_id")
            .agg(F.max("s").alias("s"))
            # the per-batch reduction is ≤ |users| rows — one staging file
            # per micro-batch, not shuffle-partition-many
            .coalesce(1)
            .write.mode("append")
            .parquet(stage)
        )

    q = (
        ops.read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(_upsert_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    merged = (
        spark.read.parquet(stage)
        .groupBy("user_id")
        .agg(F.max("s").alias("s"))
        .select(
            "user_id",
            F.col("s.ts_us").alias("last_ts_us"),
            F.col("s.event_id").alias("last_event_id"),
            F.col("s.event_type").alias("last_event_type"),
        )
    )
    rows = merged.collect()  # materialize before removing the staging dir
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, merged.schema)


# --- watermark late-data drop accounting -------------------------------------
@query(
    "stream_watermark_late",
    oracle=f"""
    WITH b AS (SELECT max(ts) AS mx FROM events),
    cls AS (
      SELECT e.*, CASE WHEN e.ts > b.mx - INTERVAL 50 MINUTE THEN 3
                       WHEN e.ts > b.mx - INTERVAL 1 HOUR THEN 1
                       WHEN e.event_id % 7 = 0 THEN 2 ELSE 0 END AS cls
      FROM events e, b
    ),
    awm AS (SELECT max(ts) FILTER (cls = 0) AS amax FROM cls),
    kept AS (
      SELECT c.* FROM cls c, awm
      WHERE NOT (c.cls = 2 AND
        (CAST(floor(epoch(c.ts) / 600) * 600 + 600 AS BIGINT)) * 1000000
          <= epoch_us(awm.amax) - 1800000000)
    ),
    g AS (
      SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
             count(*) AS n, {N.sql_dsum('value')} AS sum_value
      FROM kept GROUP BY 1
    )
    SELECT g.window_start, g.n, g.sum_value FROM g, b
    WHERE (g.window_start + 600) * 1000000 <= epoch_us(b.mx) - 1800000000
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling aggregate through the ACTUAL engine, with the
    late-data drop made deterministic and oracle-checkable. The event table
    replays as four single-file micro-batches (maxFilesPerTrigger=1,
    modification times pinned): (0) the on-time bulk A, (1) a small
    mid file M (events in (mx-1h, mx-50m]) that advances the watermark,
    (2) the stragglers B (event_id % 7 == 0, arriving two batches late),
    (3) the newest 50 minutes C, which pushes the final watermark and
    flushes state.

    Semantics pinned by experiment (Spark's two-watermark design,
    SPARK-24634): the LATE-EVENTS filter of batch k uses the watermark of
    batch k-1's start — so B, arriving in batch 2, is filtered against
    max(A.ts) - 30min (NOT the M-advanced value), dropping stragglers
    whose 10-minute window end predates it; EVICTION uses the current
    watermark, and append mode finally emits exactly the windows with
    end <= max(all ts) - 30min. The oracle reproduces both rules in pure
    epoch arithmetic over the base table (every fixture timestamp carries
    microseconds, so no comparison lands on a boundary tie). At scale the
    watermark is what bounds state: without it, window state grows with
    the key x time product forever."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]  # scalar: stages the demo input
    cls = (
        F.when(F.col("ts") > F.lit(mx) - F.expr("INTERVAL 50 MINUTES"), 3)
        .when(F.col("ts") > F.lit(mx) - F.expr("INTERVAL 1 HOUR"), 1)
        .when(F.col("event_id") % 7 == 0, 2)
        .otherwise(0)
    )
    tagged = ev.withColumn("cls", cls)

    root = os.path.join(_process_tmp(), "usw_q_wm_late")
    shutil.rmtree(root, ignore_errors=True)
    watch = os.path.join(root, "in")
    os.makedirs(watch)
    for i, c in enumerate((0, 1, 2, 3)):
        stage = os.path.join(root, f"stage{i}")
        tagged.filter(F.col("cls") == c).drop("cls").coalesce(1).write.parquet(
            stage
        )
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(watch, f"{i:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    name = f"q_wmlate_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), N.dsum("value").alias("sum_value"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return spark.table(name).select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "n",
        "sum_value",
    )


# --- real streaming session windows (gap-merged state) ------------------------
@query(
    "stream_session_window",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, value, epoch(ts) AS tsd,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id) > 1800
                  OR lag(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id, value, tsd,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY tsd, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM t
    )
    SELECT user_id,
           CAST(floor(min(tsd)) AS BIGINT) AS session_start,
           CAST(floor(max(tsd)) + 1800 AS BIGINT) AS session_end,
           count(*) AS n_events,
           {N.sql_dsum('value')} AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization through the ACTUAL streaming engine using
    the built-in ``session_window`` (gap-merged state rows, watermark-evicted
    — the stateful twin of the batch lag/cumsum `stream_session`). Complete
    output mode + a fully drained bounded source makes the final memory
    table the exact batch answer, so the oracle is the independent
    lag-formulation per (user, session): Spark's session end is
    last-event-ts + gap, hence the oracle's floor(max(ts)) + 1800. The
    fixture's microsecond-resolution timestamps mean no gap lands exactly
    on the 1800 s boundary (where the two formulations' strict-vs-inclusive
    merge rules would differ). State at scale: one row per OPEN session per
    user, closed sessions evicted at the watermark."""
    import uuid

    from ..streaming import ops

    name = f"q_sesswin_{uuid.uuid4().hex[:8]}"
    stream = ops.read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), N.dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return spark.table(name)


# --- custom streaming source through the real engine -------------------------
@query(
    "stream_custom_source",
    oracle="""
    WITH e AS (
      SELECT i AS event_id,
             1704067200 + i * 7 AS ts_epoch,
             CAST(i % 7 AS INT) AS uid,
             (i * 2654435761) % 100000 AS value_cents
      FROM range(0, 2400) t(i)
    )
    SELECT CAST(floor(ts_epoch / 600) * 600 AS BIGINT) AS window_start,
           uid, count(*) AS n, CAST(sum(value_cents) AS BIGINT) AS sum_cents
    FROM e GROUP BY 1, 2
    """,
)
def stream_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Python STREAMING Data Source driving the real engine: the
    events_replay connector (sources/replay_datasource.py — full
    DataSourceStreamReader: dict offsets advanced one micro-batch per
    trigger, partitions() fan-out, executor-side Arrow reads) feeds a
    watermarked tumbling aggregate in append mode through readStream →
    memory sink → processAllAvailable. Five real triggers run (4 data
    batches + the far-future sentinel that pushes the watermark past
    every real window, the stream_join_outer flush pattern), so the
    drained table is exactly the closed windows — hash-matched against a
    closed-form DuckDB oracle over the same arithmetic (the source is a
    pure function of its offsets, which is also why a checkpoint replay
    reproduces batches bit-for-bit: exactly-once from the source side).
    `sf_dir` is unused: the source is self-describing, like a Kafka
    topic."""
    import uuid

    from ..sources.replay_datasource import _BASE_EPOCH, register

    register(spark)
    stream = spark.readStream.format("events_replay").load()
    evs = stream.select(
        F.col("ts_epoch").cast("timestamp").alias("ts"),
        "uid",
        "value_cents",
    )
    agg = (
        evs.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "uid")
        .agg(F.count("*").alias("n"), F.sum("value_cents").alias("sum_cents"))
    )
    name = f"q_custom_src_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return spark.table(name).select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "uid",
        "n",
        "sum_cents",
    ).filter(F.col("window_start") < _BASE_EPOCH + 100_000)
