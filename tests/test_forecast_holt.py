"""Pins forecast_holt_monthly's coupled (level, trend) fold against a
direct Python float64 loop over the same monthly cents series — the same
kind of independent recomputation test_parity_scale uses for money sums.
The claim under test is BIT-identity: Spark's JVM fold, the DuckDB
recursive-CTE oracle, and a plain Python loop run the identical IEEE op
sequence, so == (not approx) is the right assertion."""

from __future__ import annotations

from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.olap_ext import forecast_holt_monthly


def _python_holt(cents_by_month: list[int]) -> list[tuple[float, float]]:
    out = []
    l = b = 0.0
    for i, y in enumerate(cents_by_month):
        y = float(y)
        if i == 0:
            l, b = y, 0.0
        else:
            l, b = 0.5 * y + 0.5 * (l + b), 0.25 * (y - l) + 0.75 * b
        out.append((l, b))
    return out


def test_holt_matches_python_loop_bitwise(spark, sf_dir):
    rows = forecast_holt_monthly(spark, sf_dir).orderBy("month").collect()
    assert len(rows) > 24  # calendar-bounded series, several years of months
    expected = _python_holt([r["cents"] for r in rows])
    for r, (l, b) in zip(rows, expected):
        assert r["holt_level"] == l / 100.0
        assert r["holt_trend"] == b / 100.0
        assert r["forecast_next"] == (l + b) / 100.0


def test_holt_seed_and_trend_laws(spark, sf_dir):
    rows = forecast_holt_monthly(spark, sf_dir).orderBy("month").collect()
    first = rows[0]
    # seed: level = first month's revenue, zero trend
    assert first["holt_level"] == first["cents"] / 100.0
    assert first["holt_trend"] == 0.0
    # forecast decomposition: (l + b)/100 vs l/100 + b/100 — same value up
    # to one reassociated IEEE rounding, so close-not-equal is correct here
    import math

    assert all(
        math.isclose(
            r["forecast_next"],
            r["holt_level"] + r["holt_trend"],
            rel_tol=1e-12,
            abs_tol=1e-9,
        )
        for r in rows
    )
