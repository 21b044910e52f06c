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


def _python_hw(cents_by_month: list[int]):
    out = []
    l = b = 0.0
    sl = [0.0] * 12
    for i, yc in enumerate(cents_by_month):
        y = float(yc)
        if i == 0:
            l, b = y, 0.0
        else:
            s12 = sl[0]
            lt = 0.5 * (y - s12) + 0.5 * (l + b)
            bt = 0.25 * (y - s12) + 0.25 * (l + b) - 0.5 * l + 0.5 * b
            st = 0.5 * y - 0.25 * (y - s12) - 0.25 * (l + b) + 0.5 * s12
            sl = sl[1:] + [st]
            l, b = lt, bt
        out.append((l, b, sl[11], sl[0]))
    return out


def test_hw_matches_python_loop_bitwise(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import forecast_hw_monthly

    rows = forecast_hw_monthly(spark, sf_dir).orderBy("month").collect()
    assert len(rows) > 24
    expected = _python_hw([r["cents"] for r in rows])
    for r, (l, b, st, s_next) in zip(rows, expected):
        assert r["hw_level"] == l / 100.0
        assert r["hw_trend"] == b / 100.0
        assert r["hw_seasonal"] == st / 100.0
        assert r["forecast_next"] == (l + b + s_next) / 100.0


def test_hw_warmup_is_pure_holt(spark, sf_dir):
    """With zero-seeded seasonal indices, the first 12 months' level/trend
    reduce algebraically to Holt's (the s12 terms vanish); op order differs,
    so close-not-equal is the right assertion. From month 13 the seasonal
    indices kick in and the series MUST diverge — both halves pinned."""
    import math

    from usw_big_data_analysis_spark.queries.olap_ext import (
        forecast_holt_monthly,
        forecast_hw_monthly,
    )

    holt = forecast_holt_monthly(spark, sf_dir).orderBy("month").collect()
    hw = forecast_hw_monthly(spark, sf_dir).orderBy("month").collect()
    for h, w in zip(holt[:12], hw[:12]):
        assert math.isclose(h["holt_level"], w["hw_level"], rel_tol=1e-12)
        assert math.isclose(h["holt_trend"], w["hw_trend"], rel_tol=1e-12, abs_tol=1e-9)
    diverged = any(
        not math.isclose(h["holt_level"], w["hw_level"], rel_tol=1e-9)
        for h, w in zip(holt[12:], hw[12:])
    )
    assert diverged
