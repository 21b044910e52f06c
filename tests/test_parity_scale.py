"""sf0.1 parity for the scale-sensitive money-sum queries.

The pytest suite's parity gate runs at sf0.001, where sums are far too
small to expose the DECIMAL->DOUBLE double-rounding class found in round
4: DuckDB's cast of a decimal whose scaled integer exceeds 2^53 rounds
twice (hugeint -> double -> /10^scale) while Spark's BigDecimal cast
rounds once, so a scale-10 sum of ~1e9 in money values (1e19 scaled
units) can land one ulp apart. join_salted_skew failed exactly this way
at sf0.1 until its oracle moved to decimal(25,6).

This test re-runs the plain money/value sum queries at sf0.1 — big
enough that a scale regression (anyone bumping an oracle back to a
high-scale decimal) trips the boundary again with high probability.
Kept to a handful of keys so the suite stays fast (~30 s).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity import compare  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from usw_big_data_analysis_spark.sources.tables import TABLES  # noqa: E402

SF01 = "/root/testdata/sf0.1"

# Plain sums of 2dp money/value doubles over large row counts — the shape
# where the final decimal->double cast magnitude is maximal.
_SCALE_SENSITIVE = [
    "join_salted_skew",
    "join_bucketed",
    "json_extract_props",
    "sink_partitioned_scan",
    "q1_pricing_summary",
    "forecast_ses_monthly",
    "forecast_holt_monthly",
    "forecast_hw_monthly",
]


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _SCALE_SENSITIVE)
def test_money_sum_parity_at_sf01(name, spark, duck_sf01):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spdf = queries[name](spark, SF01).toPandas()
    dpdf = duck_sf01.execute(oracles[name]).fetchdf()
    problems = compare(name, spdf, dpdf)
    assert not problems, f"{name}: {problems}"
