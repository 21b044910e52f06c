"""Shared fixtures: one SparkSession + one DuckDB connection per test run.

Tests run against the smallest fixture (sf0.001) so the suite stays fast;
`tools/parity.py --sf-dir .../sf0.01` is the heavier pre-commit gate.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from usw_big_data_analysis_spark.session import get_spark  # noqa: E402
from usw_big_data_analysis_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ordered_row_numbers' duplicate-collapse assertion is on by default for
# test runs (two extra counts over bounded frames; the production hot path
# keeps it off) — every production call site gets the precondition checked
# whenever the suite exercises it.
os.environ.setdefault("USWSPARK_BOUNDED_SEQ_CHECK", "1")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
