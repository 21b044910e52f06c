"""Oracle parity at sf0.001 — mirrors the driver's correctness gate.

One parametrized test per registered query: run the Spark plan and the
DuckDB oracle over the same parquet, compare row count, column names, and
order-insensitive bit-exact values. Queries without an oracle (streaming)
get a rows-run smoke check.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity import compare  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spdf = _QUERIES[name](spark, sf_dir).toPandas()
    if name not in _ORACLES:
        # rows-only contract: runs and yields a stable schema
        assert spdf is not None
        assert len(spdf.columns) > 0
        return
    dpdf = duck.execute(_ORACLES[name]).fetchdf()
    problems = compare(name, spdf, dpdf)
    assert not problems, f"{name}: {problems}"
