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
    # would silently bench nothing). Rows-only keys (no oracle by SURVEY
    # §5.2 design) are benched for wall-time trend only.
    import bench
    from usw_big_data_analysis_spark.registry import all_oracles, all_queries

    ROWS_ONLY = {"gbm_histogram_train"}
    qs = all_queries()
    oracles = all_oracles()
    for name in bench.HEADLINE:
        assert name in qs, name
        if name not in ROWS_ONLY:
            assert name in oracles, f"{name} lost its oracle (ratio would vanish)"


def test_r07_rotation_front_loads_fresh_families():
    """The driver samples queries() in iteration order; r07's window must
    open with the never-driver-checked priority families (VERDICT r6 #1:
    the round-7 additions, then text/token extensions, embed audits,
    stats-test extensions, storage/incremental, sketch audits) — every key
    in the 50-key window must be fresh."""
    from usw_big_data_analysis_spark.registry import (
        _DRIVER_CHECKED,
        _PRIORITY_FRESH,
        all_queries,
    )

    order = list(all_queries())
    window = order[:50]
    assert all(k not in _DRIVER_CHECKED for k in window)
    # the window is exactly the head of the priority list
    assert window == [k for k in _PRIORITY_FRESH if k not in _DRIVER_CHECKED][:50]
    # the round-7 additions get driver rows immediately: the second-wave
    # pipeline keys first, then the reference-parity CV/onehot keys
    assert window[:7] == [
        "preference_dpo_pairs", "metric_pass_at_k", "shard_rebalance_cost",
        "mixture_annealing_plan",
        "encode_onehot", "cv_loo", "cv_leave_p_out",
    ]
    assert "mview_incremental" in window  # storage/incremental gets rows


def test_registry_hygiene():
    """Pinned invariants at 449+ keys (VERDICT r5 #10): every registered key
    lives in exactly one queries-package family module that ALL_MODULES
    imported, the rotation bookkeeping references only real keys, and the
    attestation trajectory is monotone (fresh keys always precede seen ones,
    so _DRIVER_CHECKED ∪ per-round windows eventually covers the registry)."""
    from usw_big_data_analysis_spark import registry
    from usw_big_data_analysis_spark.queries import ALL_MODULES

    qs = registry.all_queries()
    regkeys = set(qs)
    modnames = {m.__name__ for m in ALL_MODULES}
    # exactly-one-module: the @query decorator rejects duplicate keys at
    # import time, so each key has one owning function; assert the owner is
    # one of the imported family modules (no stray registration site).
    for key, fn in qs.items():
        assert fn.__module__ in modnames, (key, fn.__module__)
    # rotation bookkeeping references only live keys, with no overlap
    assert registry._DRIVER_CHECKED <= regkeys
    pf = registry._PRIORITY_FRESH
    assert len(pf) == len(set(pf)), "duplicate priority keys"
    assert set(pf) <= regkeys
    assert not (set(pf) & registry._DRIVER_CHECKED)
    # monotone attestation: in all_queries() order every never-checked key
    # precedes every already-checked key, so each round's window is spent
    # entirely on fresh keys until none remain.
    order = list(qs)
    first_seen = next(
        (i for i, k in enumerate(order) if k in registry._DRIVER_CHECKED),
        len(order),
    )
    assert all(k in registry._DRIVER_CHECKED for k in order[first_seen:])
    # oracles are a subset of queries (rows-only keys may lack oracles)
    assert set(registry.all_oracles()) <= regkeys
