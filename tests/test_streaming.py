"""Structured Streaming ops driven end-to-end with availableNow triggers and
memory sinks; windowed results must equal the batch twins' (the streaming
engine processing a bounded source is semantically a batch query)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from usw_big_data_analysis_spark.streaming import ops

_QUERIES = entrymod.queries()


def _run_to_memory(spark, sdf, name: str, mode: str) -> None:
    # processAllAvailable + stop instead of trigger(availableNow): stateful
    # queries with processing-time timeouts stay active waiting for timers,
    # so availableNow never self-terminates for them
    q = sdf.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    _run_to_memory(spark, ops.tumbling_counts(stream), "t_tumble", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in _QUERIES["stream_tumbling"](spark, sf_dir).collect()
    }
    assert got == want


def test_stream_session_covers_batch_events(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    _run_to_memory(spark, ops.session_aggregates(stream), "t_sess", "complete")
    got = spark.sql(
        "SELECT sum(n_events) AS n, count(*) AS sessions FROM t_sess"
    ).collect()[0]
    batch = _QUERIES["stream_session"](spark, sf_dir).agg(
        {"n_events": "sum", "*": "count"}
    ).collect()[0]
    assert got["n"] == batch["sum(n_events)"]
    # built-in session_window merges identically to the lag/cumsum batch form
    assert got["sessions"] == batch["count(1)"]


def test_stateful_user_profile(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    _run_to_memory(spark, ops.running_user_profile(stream), "t_state", "update")
    rows = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM t_state GROUP BY user_id"
    ).collect()
    batch_counts = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got = {r["user_id"]: r["n"] for r in rows}
    assert got == batch_counts


def test_stream_dedup_drops_exactly_the_redelivered_half(spark, sf_dir):
    batch_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    doubled = ops.read_events_stream(spark, sf_dir).unionByName(
        ops.read_events_stream(spark, sf_dir)
    )
    # without dedup the union really delivers every event twice…
    _run_to_memory(spark, doubled.select("event_id"), "t_dup_raw", "append")
    assert spark.table("t_dup_raw").count() == 2 * batch_n
    # …and dedup_stream keeps exactly one copy of each
    _run_to_memory(spark, ops.dedup_stream(doubled), "t_dup_clean", "append")
    out = spark.table("t_dup_clean")
    assert out.count() == batch_n
    assert out.select("event_id").distinct().count() == batch_n
