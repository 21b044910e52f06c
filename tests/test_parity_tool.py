"""The parity harness itself must catch the failure mode that slipped through
round 1: a DuckDB oracle emitting HUGEINT (int128) for an integer sum, which
pandas silently coerces to float64 so a value-only comparison passes while the
driver's type-aware value hash fails.
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from parity import compare, oracle_type_problems  # noqa: E402


def test_hugeint_oracle_is_flagged_at_type_level():
    con = duckdb.connect()
    # sum() over an integer column is HUGEINT in DuckDB — the exact shape of
    # the 39 round-1 oracles.
    bad = "SELECT sum(x) AS total FROM (SELECT unnest([1, 2, 3]) AS x)"
    problems = oracle_type_problems(con, bad)
    assert problems and "HUGEINT" in problems[0]

    good = "SELECT CAST(sum(x) AS BIGINT) AS total FROM (SELECT unnest([1, 2, 3]) AS x)"
    assert oracle_type_problems(con, good) == []


def test_int_float_mix_is_a_dtype_problem():
    # Spark bigint vs DuckDB-HUGEINT-coerced-to-float64: values equal, dtypes
    # not. Round 1's comparator accepted this; it must now fail.
    spark_pdf = pd.DataFrame({"total": pd.array([6], dtype="int64")})
    duck_pdf = pd.DataFrame({"total": pd.array([6.0], dtype="float64")})
    problems = compare("t", spark_pdf, duck_pdf)
    assert any(p.startswith("DTYPE") for p in problems)


def test_identical_frames_pass():
    a = pd.DataFrame({"k": ["x", "y"], "v": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["y", "x"], "v": pd.array([2, 1], dtype="int64")})
    assert compare("t", a, b) == []
