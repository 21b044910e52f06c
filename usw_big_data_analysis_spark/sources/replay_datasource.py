"""Spark 4 Python STREAMING Data Source: ``readStream.format("events_replay")``.

A deterministic micro-batch replay source built on the full
``DataSourceStreamReader`` API (SPARK-44076 family): offsets are
``{"batch": k}`` dicts advanced one micro-batch per trigger; the engine
plans ``partitions(start, end)`` and executors decode their slice with
``read(partition)`` into Arrow batches. Rows are a pure arithmetic
function of the offset range, so a replay after failure reproduces the
exact same batch — the source-side half of Structured Streaming's
exactly-once contract (the committed-offset log is the other half).

Shape: ``_DATA_BATCHES`` batches of ``_ROWS_PER_BATCH`` events with
monotone event times (7 s apart), then one far-future SENTINEL event
whose only job is to push the watermark past every real window so a
drain emits them all (the flush-sentinel pattern the repo's
stream_join_outer already pins). Each micro-batch is split into
``_PARTS`` stride partitions — a real fan-out per trigger, not a
single-task read.

Used by queries/streaming_batch.py::stream_custom_source, which runs a
watermarked tumbling aggregate over this source through the REAL engine
and hash-matches a closed-form DuckDB oracle over the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_ROWS_PER_BATCH = 600
_DATA_BATCHES = 4
_CAP = _DATA_BATCHES + 1  # + sentinel batch
_PARTS = 4
_BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC
_STEP_S = 7
_SENTINEL_EPOCH = _BASE_EPOCH + 10_000_000
_N_USERS = 7
_HASH_MULT = 2654435761
_CENT_MOD = 100000

_SCHEMA = "event_id bigint, ts_epoch bigint, uid int, value_cents bigint"


class ReplayPartition(InputPartition):
    def __init__(self, batch: int, part: int):
        self.batch = batch
        self.part = part


class EventsReplayStreamReader(DataSourceStreamReader):
    def __init__(self):
        self._seen = 0  # driver-side trigger counter (single-run drain)
        # highest offset observed from the engine (batch starts / commits).
        # A restarted query's fresh reader instance has _seen = 0 while the
        # checkpoint's committed offset may be ahead; folding the engine's
        # offsets back in lets latestOffset resume instead of stalling
        # behind it (ADVICE r4). RESTART CONTRACT: recovery is correct only
        # when the checkpoint holds a planned-but-uncommitted batch — the
        # engine then replays it via partitions(start, end) BEFORE asking
        # for a new latestOffset, which seeds _floor with the true start.
        # After a CLEAN shutdown (everything committed) the engine's first
        # call is latestOffset() with _floor still 0; the stale low offset
        # it returns would make the engine re-plan earlier batches
        # (duplicate emission), so a fully-committed checkpoint must not be
        # reused — start the drain from a fresh checkpoint dir instead.
        # The API surfaces the committed offset only through partitions()/
        # commit(), so this is the strongest recovery expressible here.
        self._floor = 0

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        # one micro-batch per trigger until the cap; after that the offset
        # stops moving and processAllAvailable() returns.
        self._seen = max(self._seen, self._floor)
        if self._seen < _CAP:
            self._seen += 1
        return {"batch": self._seen}

    def partitions(self, start: dict, end: dict):
        self._floor = max(self._floor, start["batch"])
        return [
            ReplayPartition(b, p)
            for b in range(start["batch"], end["batch"])
            for p in range(_PARTS)
        ]

    def read(self, partition: ReplayPartition):
        import pyarrow as pa

        if partition.batch >= _DATA_BATCHES:
            # sentinel micro-batch: a single far-future watermark pusher
            ids = [-1] if partition.part == 0 else []
            eids = ids
            ts = [_SENTINEL_EPOCH] * len(ids)
            uid = [0] * len(ids)
            cents = [0] * len(ids)
        else:
            lo = partition.batch * _ROWS_PER_BATCH
            hi = lo + _ROWS_PER_BATCH
            eids = list(range(lo + partition.part, hi, _PARTS))
            ts = [_BASE_EPOCH + e * _STEP_S for e in eids]
            uid = [e % _N_USERS for e in eids]
            cents = [(e * _HASH_MULT) % _CENT_MOD for e in eids]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(eids, type=pa.int64()),
                pa.array(ts, type=pa.int64()),
                pa.array(uid, type=pa.int32()),
                pa.array(cents, type=pa.int64()),
            ],
            ["event_id", "ts_epoch", "uid", "value_cents"],
        )

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor, end["batch"])


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> EventsReplayStreamReader:
        return EventsReplayStreamReader()


def register(spark) -> None:
    """Idempotent session registration of format('events_replay')."""
    spark.dataSource.register(EventsReplayDataSource)
