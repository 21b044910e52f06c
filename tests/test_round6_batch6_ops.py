"""Goldens for the sixth round-6 batch: events_pattern_match (pure-Python
regex mirror), ab_ratio_delta_method (numpy delta-method mirror),
ab_tost_equivalence (scipy-free TOST mirror on the same normal tail)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest


def test_pattern_match_matches_python_regex(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.behavior import (
        _EPM_PATTERN,
        events_pattern_match,
    )

    got = {r["user_id"]: r for r in events_pattern_match(spark, sf_dir).collect()}

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(
        t=ev["ts"].astype("datetime64[us]").astype("int64"),
        c=ev["event_type"].str[0],
    ).sort_values(["user_id", "t", "event_id"])
    pat = re.compile(_EPM_PATTERN)
    for uid, grp in ev.groupby("user_id"):
        journey = "".join(grp["c"])
        assert got[uid]["n_events"] == len(grp)
        assert got[uid]["matched"] == int(bool(pat.search(journey)))
    assert set(got) == set(ev["user_id"].unique())
    # the pattern must discriminate: some matched, some not
    flags = {r["matched"] for r in got.values()}
    assert flags == {0, 1}


def _per_cust(sf_dir):
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    od = od.assign(
        cents=np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    )
    g = od.groupby("o_custkey").agg(x=("cents", "sum"), y=("cents", "size"))
    g["arm"] = (g.index % 2).astype(int)
    return od, g


def test_ratio_delta_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.stats_tests import (
        ab_ratio_delta_method,
    )

    row = ab_ratio_delta_method(spark, sf_dir).collect()[0]
    _, g = _per_cust(sf_dir)
    stats = {}
    for arm, grp in g.groupby("arm"):
        x, y = grp["x"].to_numpy() / 100.0, grp["y"].to_numpy().astype(float)
        n = len(grp)
        r = x.sum() / y.sum()
        cov = np.cov(np.stack([x, y]), ddof=1)
        v = (cov[0, 0] - 2 * r * cov[0, 1] + r * r * cov[1, 1]) / (
            n * y.mean() ** 2
        )
        stats[arm] = (n, r, v)
    diff = stats[1][1] - stats[0][1]
    se = np.sqrt(stats[1][2] + stats[0][2])
    assert row["n_treat"] == stats[1][0] and row["n_control"] == stats[0][0]
    assert row["ratio_treat"] == pytest.approx(stats[1][1], rel=1e-9)
    assert row["diff"] == pytest.approx(diff, abs=1e-4)
    assert row["se"] == pytest.approx(se, rel=1e-6)
    assert row["z"] == pytest.approx(diff / se, abs=1e-5)


def test_tost_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.stats_tests import (
        _TOST_DELTA,
        ab_tost_equivalence,
    )

    row = ab_tost_equivalence(spark, sf_dir).collect()[0]
    od, _ = _per_cust(sf_dir)
    y = od["cents"].to_numpy() / 100.0
    arm = (od["o_custkey"].to_numpy() % 2).astype(int)
    m1, m0 = y[arm == 1].mean(), y[arm == 0].mean()
    v1 = y[arm == 1].var(ddof=1) / (arm == 1).sum()
    v0 = y[arm == 0].var(ddof=1) / (arm == 0).sum()
    diff, se = m1 - m0, np.sqrt(v1 + v0)
    zl, zu = (diff + _TOST_DELTA) / se, (_TOST_DELTA - diff) / se
    assert row["diff"] == pytest.approx(diff, abs=1e-4)
    assert row["se"] == pytest.approx(se, rel=1e-6)
    assert row["z_lower"] == pytest.approx(zl, abs=1e-4)
    assert row["z_upper"] == pytest.approx(zu, abs=1e-4)
    # portable tail is within 7.5e-8 of the true normal sf
    from math import erfc, sqrt

    def sf(z):
        return 0.5 * erfc(z / sqrt(2))

    p = max(sf(zl), sf(zu))
    assert row["p_tost"] == pytest.approx(p, abs=1e-4)
    assert row["equivalent"] == int(p < 0.05)
