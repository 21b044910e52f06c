"""events_replay streaming-source contract: the drain really runs as
multiple micro-batches (one per offset advance, 600 rows each + the
1-row sentinel), and the aggregate equals the batch computation."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from usw_big_data_analysis_spark.sources.replay_datasource import (
    _BASE_EPOCH,
    _CAP,
    _DATA_BATCHES,
    _ROWS_PER_BATCH,
    register,
)


def test_multibatch_drain_and_counts(spark):
    register(spark)
    stream = spark.readStream.format("events_replay").load()
    name = f"t_replay_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    progress = [
        p
        for p in q.recentProgress
        if p is not None and p["numInputRows"] > 0
    ]
    q.stop()
    q.awaitTermination(60)

    # one micro-batch per offset advance: 4 data batches + sentinel
    rows_per_batch = [p["numInputRows"] for p in progress]
    assert rows_per_batch == [_ROWS_PER_BATCH] * _DATA_BATCHES + [1]
    assert len(rows_per_batch) == _CAP

    got = spark.table(name)
    assert got.count() == _DATA_BATCHES * _ROWS_PER_BATCH + 1
    # arithmetic spot-check: sum of event ids over data rows
    n = _DATA_BATCHES * _ROWS_PER_BATCH
    s = got.filter(F.col("event_id") >= 0).agg(F.sum("event_id")).collect()[0][0]
    assert s == n * (n - 1) // 2
    # event times are monotone in event_id and 7 s apart
    first = got.filter(F.col("event_id") == 0).collect()[0]
    assert first["ts_epoch"] == _BASE_EPOCH
