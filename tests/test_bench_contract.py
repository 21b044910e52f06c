"""bench.py is the driver's per-round CLI — pin its structural contract
(headline keys resolve, variants/self-materializing sets stay consistent)
without paying a full sf0.1 run in the suite."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# keys allowed to have no DuckDB oracle (rows-only by SURVEY §5.2 design);
# bench reports their wall-time trend but excludes them from ratio totals
ROWS_ONLY = {"gbm_histogram_train"}


def test_headline_keys_all_registered():
    from usw_big_data_analysis_spark.registry import all_oracles, all_queries

    bench = _bench_module()
    qs, os_ = all_queries(), all_oracles()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []
    # every headline query must have a DuckDB baseline for the ratio table
    no_oracle = [n for n in bench.HEADLINE if n not in os_]
    assert set(no_oracle) <= ROWS_ONLY


def test_bench_variants_subset_of_headline():
    bench = _bench_module()
    assert set(bench._bench_variants()) <= set(bench.HEADLINE)


def test_self_materializing_subset_of_headline():
    bench = _bench_module()
    assert bench.SELF_MATERIALIZING_DOC <= set(bench.HEADLINE)


def test_load_prev_bench_driver_format(tmp_path):
    """ADVICE r4 (medium): recorded BENCH_r0N.json nests the bench line
    under "parsed" — the guard must read times from there, not the top
    level. Feed a real driver-format record and a raw bench line."""
    import json

    bench = _bench_module()
    driver_record = {
        "n": 4,
        "rc": 0,
        "tail": "...",
        "parsed": {
            "metric": "headline_queries_total_wall",
            "queries": {"q1_pricing_summary": 0.258},
            "prepared_s": {"q1_pricing_summary": 0.231},
            "methodology": "cold_prebuilt_v2",
        },
    }
    p = tmp_path / "BENCH_r04.json"
    p.write_text(json.dumps(driver_record))
    prev = bench._load_prev_bench(str(p))
    assert prev["queries"] == {"q1_pricing_summary": 0.258}
    assert prev["prepared_s"] == {"q1_pricing_summary": 0.231}
    assert prev["methodology"] == "cold_prebuilt_v2"

    raw = tmp_path / "raw.json"
    raw.write_text(json.dumps(driver_record["parsed"]))
    prev2 = bench._load_prev_bench(str(raw))
    assert prev2["queries"] == {"q1_pricing_summary": 0.258}


def test_regression_guard_gates_on_methodology_tags():
    """VERDICT r5 #3 / ADVICE r5: prepared times switched to median-of-5 in
    r06 — comparing them against a min-of-3 prior record would flag phantom
    regressions, so each series only compares when the prior record carries
    its methodology tag."""
    bench = _bench_module()
    times = {"q1_pricing_summary": 0.40}
    prepared = {"q1_pricing_summary": 0.40}
    # prior record from the min-of-3 era: prepared must NOT be compared,
    # cold (same tag) must be.
    prev_old = {
        "methodology": bench.METHODOLOGY,
        "queries": {"q1_pricing_summary": 0.20},
        "prepared_s": {"q1_pricing_summary": 0.20},
    }
    regs = bench._regressions(prev_old, times, prepared)
    assert regs == {"q1_pricing_summary": {"prev_s": 0.20, "now_s": 0.40}}
    # prior record with matching prepared tag: both series compare.
    prev_new = dict(prev_old, prepared_methodology=bench.PREPARED_METHODOLOGY)
    regs = bench._regressions(prev_new, times, prepared)
    assert regs["q1_pricing_summary"]["now_prepared_s"] == 0.40
    # sub-50ms or sub-10% deltas never flag
    assert bench._regressions(
        prev_new, {"q1_pricing_summary": 0.22}, {"q1_pricing_summary": 0.24}
    ) == {}
