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


def test_kill_and_restart_resumes_from_checkpoint(spark, tmp_path):
    """VERDICT r5 #9: the restart contract end to end through a REAL
    checkpoint dir. A foreachBatch sink raises in epoch 2 AFTER the engine
    wrote that batch's offset — the canonical mid-batch crash, leaving the
    checkpoint with a planned-but-uncommitted batch. The restarted query
    (a FRESH reader instance with _seen = _floor = 0) must replay exactly
    epoch 2 via partitions(start, end) — which seeds _floor — then resume
    3..cap with no duplicate and no skipped batch."""
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[int, int, int]] = []  # (epoch, rows, sum(event_id))
    armed = {"on": True}

    def sink(df, epoch_id):
        if armed["on"] and epoch_id == 2:
            raise RuntimeError("injected mid-batch crash")
        agg = df.agg(
            F.count("*").alias("n"), F.sum("event_id").alias("s")
        ).collect()[0]
        seen.append((epoch_id, agg["n"], agg["s"] or 0))

    def run():
        q = (
            spark.readStream.format("events_replay")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        except Exception:
            pass  # first run dies on the injected crash
        finally:
            try:
                q.stop()
            except Exception:
                pass

    run()  # crashes in epoch 2
    assert [e for e, _, _ in seen] == [0, 1]
    armed["on"] = False
    run()  # restart on the same checkpoint: replay 2, then 3 + sentinel

    assert [e for e, _, _ in seen] == [0, 1, 2, 3, 4]
    rows = [n for _, n, _ in seen]
    assert rows == [_ROWS_PER_BATCH] * _DATA_BATCHES + [1]
    # exactly-once: each epoch delivered its own disjoint id range once —
    # the id sums must add up to the closed form over ALL data rows
    n = _DATA_BATCHES * _ROWS_PER_BATCH
    data_sum = sum(s for e, _, s in seen if e < _DATA_BATCHES)
    assert data_sum == n * (n - 1) // 2
    # and the replayed epoch 2 is bit-identical to the pre-crash plan:
    # its range is [1200, 1800)
    e2 = next(s for e, _, s in seen if e == 2)
    assert e2 == sum(range(2 * _ROWS_PER_BATCH, 3 * _ROWS_PER_BATCH))
