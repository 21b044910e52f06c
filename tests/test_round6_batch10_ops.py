"""Golden for attribution_markov_removal: rebuild the journeys in pandas,
estimate the transition matrix, and solve the absorbing chain with
np.linalg.solve — the Cramer-determinant SQL must agree with real linear
algebra."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

STATES = ["s", "v", "c", "g"]
LETTER = {"view": "v", "click": "c", "signup": "g", "purchase": "p"}


def _paths(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["event_type"].isin(LETTER)]
    ev = ev.assign(
        t=ev["ts"].astype("datetime64[us]").astype("int64"),
        c=ev["event_type"].map(LETTER),
    ).sort_values(["user_id", "t", "event_id"])
    out = []
    for _, grp in ev.groupby("user_id"):
        j = "".join(grp["c"])
        cut = j.find("p")
        out.append("s" + (j[: cut + 1] if cut >= 0 else j + "n"))
    return out


def _chain(paths, drop=None):
    counts = {}
    for p in paths:
        for a, b in zip(p, p[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    keep = [s for s in STATES if s != drop]
    k = len(keep)
    Q = np.zeros((k, k))
    b = np.zeros(k)
    for i, si in enumerate(keep):
        r = sum(counts.get((si, t), 0) for t in ["v", "c", "g", "p", "n"])
        if r == 0:
            continue
        for j, sj in enumerate(keep):
            Q[i, j] = counts.get((si, sj), 0) / r
        b[i] = counts.get((si, "p"), 0) / r
    x = np.linalg.solve(np.eye(k) - Q, b)
    return x[0]  # conversion probability from start


def test_markov_removal_matches_numpy_solve(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.behavior import (
        attribution_markov_removal,
    )

    rows = {
        r["channel"]: r
        for r in attribution_markov_removal(spark, sf_dir).collect()
    }
    assert set(rows) == {"view", "click", "signup"}

    paths = _paths(sf_dir)
    p_full = _chain(paths)
    effects = {}
    for name, ch in [("view", "v"), ("click", "c"), ("signup", "g")]:
        p_rm = _chain(paths, drop=ch)
        effects[name] = 1 - p_rm / p_full
        assert rows[name]["p_conversion"] == pytest.approx(p_full, abs=1e-4)
        assert rows[name]["p_without"] == pytest.approx(p_rm, abs=1e-4)
        assert rows[name]["removal_effect"] == pytest.approx(
            effects[name], abs=1e-4
        )
    tot = sum(effects.values())
    for name in effects:
        assert rows[name]["attribution_share"] == pytest.approx(
            effects[name] / tot, abs=1e-4
        )
    # shares are a proper attribution: positive, sum to 1
    assert sum(r["attribution_share"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-4
    )
