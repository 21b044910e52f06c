"""Randomized bitwise property test for the smoothing folds: 50+ seeded
synthetic series (constant, ramp, alternating spikes, heavy-tailed noise,
1- and 2-element edges) run through the EXACT fold expressions the
forecast_holt_monthly / forecast_hw_monthly queries execute
(_HOLT_FOLD_SQL / _HW_FOLD_SQL — shared constants, not copies), all packed
into ONE DataFrame so the whole sweep is a single Spark job per model.
Every (series, month) state must equal a plain Python float64 loop
bit-for-bit — the same claim the DuckDB oracles pin on fixture data,
exercised here across a far wider numeric range."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.olap_ext import (
    _HOLT_FOLD_SQL,
    _HW_FOLD_SQL,
)


def _series_suite() -> list[list[int]]:
    rng = np.random.default_rng(20260815)
    suite = [
        [5_000_000_000],                     # single month
        [5_000_000_000, 7_000_000_000],      # two months
        [3_000_000_000] * 30,                # constant
        [int(1e9 + 7e7 * t) for t in range(40)],          # linear ramp
        [int(2e9 + (1e9 if t % 2 else -1e9)) for t in range(36)],  # alternating
        [int(2e9 + 5e8 * np.sin(2 * np.pi * t / 12)) for t in range(48)],  # seasonal
    ]
    for _ in range(46):
        n = int(rng.integers(3, 90))
        base = float(rng.uniform(1e6, 4e13))  # up to ~2^45 cents
        noise = rng.uniform(-0.5, 0.5, n) * base
        trend = rng.uniform(-0.02, 0.02) * base * np.arange(n)
        season = rng.uniform(0, 0.3) * base * np.sin(
            2 * np.pi * (np.arange(n) / 12 + rng.uniform())
        )
        suite.append([max(1, int(v)) for v in base + trend + season + noise])
    return suite


def _python_holt(cents):
    l = b = 0.0
    out = []
    for i, yc in enumerate(cents):
        y = float(yc)
        if i == 0:
            l, b = y, 0.0
        else:
            l, b = 0.5 * y + 0.5 * (l + b), 0.25 * (y - l) + 0.75 * b
        out.append((l, b))
    return out


def _python_hw(cents):
    l = b = 0.0
    sl = [0.0] * 12
    out = []
    for i, yc in enumerate(cents):
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
        out.append((l, b, sl[11]))
    return out


def _packed_frame(spark, suite):
    """One row per series: (sid, a) where a mirrors the query's sorted
    struct array (mi, month, cents); month is unused by the folds."""
    import datetime

    rows = [
        (
            sid,
            [
                (mi, datetime.datetime(2000 + mi // 12, mi % 12 + 1, 1), c)
                for mi, c in enumerate(series)
            ],
        )
        for sid, series in enumerate(suite)
    ]
    return spark.createDataFrame(
        rows,
        "sid int, a array<struct<mi:int,month:timestamp,cents:bigint>>",
    )


def test_holt_fold_bitwise_on_random_series(spark):
    suite = _series_suite()
    df = _packed_frame(spark, suite)
    got = (
        df.select("sid", F.expr("posexplode(a) AS (p0, x)"), "a")
        .select("sid", "p0", F.expr(_HOLT_FOLD_SQL))
        .select("sid", "p0", "st.l", "st.b")
        .collect()
    )
    exp = {sid: _python_holt(series) for sid, series in enumerate(suite)}
    assert len(got) == sum(len(s) for s in suite)
    for r in got:
        l, b = exp[r["sid"]][r["p0"]]
        assert r["l"] == l and r["b"] == b, (r["sid"], r["p0"])


def test_hw_fold_bitwise_on_random_series(spark):
    suite = _series_suite()
    df = _packed_frame(spark, suite)
    got = (
        df.select("sid", F.expr("posexplode(a) AS (p0, x)"), "a")
        .select("sid", "p0", F.expr(_HW_FOLD_SQL))
        .select(
            "sid", "p0", "st.l", "st.b", F.expr("element_at(st.sl, 12) AS s")
        )
        .collect()
    )
    exp = {sid: _python_hw(series) for sid, series in enumerate(suite)}
    assert len(got) == sum(len(s) for s in suite)
    for r in got:
        l, b, st = exp[r["sid"]][r["p0"]]
        assert r["l"] == l and r["b"] == b and r["s"] == st, (r["sid"], r["p0"])
