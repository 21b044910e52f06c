"""Driver-contract tests: __spark_entry__ exposes entry/queries/oracle_sql
with consistent keys, and entry() returns a non-empty stable-schema frame."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 100
    # every oracle key must have a query; rows-only queries may lack oracles
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_no_duplicate_registration():
    import importlib

    from usw_big_data_analysis_spark import registry

    # re-import must not re-register (idempotent _load)
    registry._load()
    registry._load()
    assert len(registry.all_queries()) == len(set(registry.all_queries()))


def test_bench_headline_keys_registered():
    # bench.py must keep timing real registered queries (a renamed key
    # would silently bench nothing)
    import bench
    from usw_big_data_analysis_spark.registry import all_oracles, all_queries

    qs = all_queries()
    oracles = all_oracles()
    for name in bench.HEADLINE:
        assert name in qs, name
        assert name in oracles, f"{name} lost its oracle (ratio would vanish)"


def test_r04_rotation_pins_stale_reds_then_priority_fresh():
    """The driver samples queries() in iteration order; r04's window must
    open with the six stale r01 reds (driver ledger still shows them red
    from the fixed HUGEINT era) followed by never-driver-checked priority
    keys (VERDICT r3 #1)."""
    from usw_big_data_analysis_spark.registry import (
        _DRIVER_CHECKED,
        _PINNED_FIRST,
        all_queries,
    )

    order = list(all_queries())
    assert tuple(order[:6]) == _PINNED_FIRST
    # everything after the pins, up to the window edge, is fresh
    window_tail = order[6:50]
    assert all(k not in _DRIVER_CHECKED for k in window_tail)
