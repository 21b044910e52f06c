"""Goldens for the eighteenth round-6 batch: events_entropy_rate (numpy
conditional-entropy mirror) and ab_uplift_by_segment (pandas two-model
mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_entropy_rate_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.behavior import events_entropy_rate

    row = events_entropy_rate(spark, sf_dir).collect()[0]

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(t=ev["ts"].astype("datetime64[us]").astype("int64")).sort_values(
        ["user_id", "t", "event_id"]
    )
    pairs = []
    for _, grp in ev.groupby("user_id"):
        s = grp["event_type"].tolist()
        pairs += list(zip(s, s[1:]))
    tm = pd.Series(pairs).value_counts()
    n = tm.sum()
    df = pd.DataFrame([(a, b, c) for (a, b), c in tm.items()], columns=["a", "b", "c"])
    rsum = df.groupby("a")["c"].sum()
    h_rate = sum(
        -(c / n) * np.log(c / rsum[a]) for a, b, c in df.itertuples(index=False)
    )
    h_marg = sum(-(v / n) * np.log(v / n) for v in rsum)
    assert row["n_transitions"] == n
    assert row["entropy_rate_nats"] == pytest.approx(h_rate, abs=1e-5)
    assert row["marginal_entropy_nats"] == pytest.approx(h_marg, abs=1e-5)
    assert row["predictability"] == pytest.approx(1 - h_rate / h_marg, abs=1e-4)
    # conditioning can only reduce entropy
    assert row["entropy_rate_nats"] <= row["marginal_entropy_nats"] + 1e-9


def test_uplift_matches_pandas(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.stats_tests import (
        ab_uplift_by_segment,
    )

    rows = {r["segment"]: r for r in ab_uplift_by_segment(spark, sf_dir).collect()}

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j = j.assign(
        segment=j["c_nationkey"] % 5,
        treated=(j["o_custkey"] % 2).astype(int),
        conv=(j["o_totalprice"] > 150000.0).astype(int),
    )
    for seg, grp in j.groupby("segment"):
        t, c = grp[grp["treated"] == 1], grp[grp["treated"] == 0]
        pt, pc = t["conv"].mean(), c["conv"].mean()
        r = rows[seg]
        assert r["n_t"] == len(t) and r["n_c"] == len(c)
        assert r["uplift"] == pytest.approx(pt - pc, abs=1e-5)
        se = np.sqrt(pt * (1 - pt) / len(t) + pc * (1 - pc) / len(c))
        assert r["se"] == pytest.approx(se, abs=1e-5)
    assert set(rows) == set(j["segment"].unique())
