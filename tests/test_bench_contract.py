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


def test_headline_keys_all_registered():
    from usw_big_data_analysis_spark.registry import all_oracles, all_queries

    bench = _bench_module()
    qs, os_ = all_queries(), all_oracles()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []
    # every headline query must have a DuckDB baseline for the ratio table
    no_oracle = [n for n in bench.HEADLINE if n not in os_]
    assert no_oracle == []


def test_bench_variants_subset_of_headline():
    bench = _bench_module()
    assert set(bench._bench_variants()) <= set(bench.HEADLINE)
