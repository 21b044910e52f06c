"""Semantic golden for ab_sequential_sprt — parity proves engine-equality;
this recomputes Wald's walk in pure Python from the event stream and pins
the sequential-decision semantics."""

from __future__ import annotations

import duckdb

from usw_big_data_analysis_spark.queries.stats_tests import (
    _SPRT_A_E9,
    _SPRT_L0_E9,
    _SPRT_L1_E9,
    ab_sequential_sprt,
)


def test_sprt_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        "SELECT CAST(ts AS DATE) AS day,"
        " count(*) AS n,"
        " sum(CAST(event_type = 'purchase' AND value > 80 AS INT)) AS k"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        " WHERE user_id % 2 = 1 GROUP BY day ORDER BY day"
    ).fetchall()
    cum = 0
    crossed_before = False
    expect = []
    for day, n, k in rows:
        llr = k * _SPRT_L1_E9 + (n - k) * _SPRT_L0_E9
        cum += llr
        if crossed_before:
            state = "stopped"
        elif cum >= _SPRT_A_E9:
            state = "accept_h1"
        elif cum <= -_SPRT_A_E9:
            state = "accept_h0"
        else:
            state = "continue"
        expect.append((day, n, k, llr, cum, state))
        crossed_before = crossed_before or abs(cum) >= _SPRT_A_E9
    got = sorted(
        ab_sequential_sprt(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert len(got) == len(expect)
    for r, (day, n, k, llr, cum_e, state) in zip(got, expect):
        assert r["day"].date() == day
        assert r["n_trials"] == n
        assert r["n_success"] == k
        assert r["llr_e9"] == llr
        assert r["cum_llr_e9"] == cum_e
        assert r["state"] == state
    # Laws: at most one accept_* row, and every row after it is 'stopped'.
    states = [r["state"] for r in got]
    accepts = [i for i, s in enumerate(states) if s.startswith("accept")]
    assert len(accepts) <= 1
    if accepts:
        assert all(s == "stopped" for s in states[accepts[0] + 1 :])
