"""Golden for scd2_asof_lookup: the SCD2 invariant (exactly one valid row
per probe) plus a pandas interval mirror."""

from __future__ import annotations

import pandas as pd


def test_asof_lookup_one_row_per_probe_and_matches_pandas(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.pipeline_ops import (
        scd2_asof_lookup,
    )

    rows = scd2_asof_lookup(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(us=ev["ts"].astype("datetime64[us]").astype("int64"))
    users = ev["user_id"].unique()
    # the SCD2 invariant: exactly one interval covers each probe
    assert len(rows) == len(users)
    got = {r["user_id"]: r for r in rows}
    for uid, grp in ev.sort_values(["us", "event_id"]).groupby("user_id"):
        asof = (grp["us"].min() + grp["us"].max()) // 2
        # the valid row is the last event at or before the probe
        before = grp[grp["us"] <= asof]
        want_state = before.iloc[-1]["event_type"]
        r = got[uid]
        assert r["asof_us"] == asof
        assert r["state"] == want_state
        assert r["valid_from_us"] <= asof < r["valid_to_us"]
