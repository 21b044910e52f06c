"""Goldens for the seventeenth round-6 batch: forecast_hierarchical_reconcile
(sequential SES fold mirror + the coherence identity) and
text_mattr_diversity (pure-Python sliding-window mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_hierarchical_reconcile_coherence_and_folds(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.olap_ext import (
        forecast_hierarchical_reconcile,
    )

    rows = {
        r["r_name"]: r
        for r in forecast_hierarchical_reconcile(spark, sf_dir).collect()
    }
    assert len(rows) == 5  # the five regions

    any_row = next(iter(rows.values()))
    # bottom-up total is exactly the sum of child levels
    assert any_row["level_bottomup"] == pytest.approx(
        sum(r["level_region"] for r in rows.values()), abs=2e-4
    )
    # coherence gap is exactly bottom-up minus direct total
    assert any_row["coherence_gap"] == pytest.approx(
        any_row["level_bottomup"] - any_row["level_total"], abs=2e-4
    )
    # top-down levels re-allocate the total: they sum back to it
    assert sum(r["level_topdown"] for r in rows.values()) == pytest.approx(
        any_row["level_total"], abs=2e-4
    )
    # every level is positive revenue
    for r in rows.values():
        assert r["level_region"] > 0 and r["level_topdown"] > 0


def test_mattr_matches_python(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.text_ops import (
        _MATTR_W,
        text_mattr_diversity,
    )

    rows = {r["source"]: r for r in text_mattr_diversity(spark, sf_dir).collect()}

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def mattr(text):
        w = text.split(" ")
        if len(w) >= _MATTR_W:
            nwin = len(w) - _MATTR_W + 1
            s = sum(
                len(set(w[i : i + _MATTR_W])) for i in range(nwin)
            )
            return s / (_MATTR_W * nwin)
        return len(set(w)) / len(w)

    per = docs.assign(m=docs["text"].map(mattr), short=docs["text"].map(
        lambda t: int(len(t.split(" ")) < _MATTR_W)
    ))
    want = per.groupby("source").agg(
        n=("m", "size"), s=("short", "sum"), mm=("m", "mean")
    )
    assert set(rows) == set(want.index)
    for src, w in want.iterrows():
        assert rows[src]["n_docs"] == w["n"]
        assert rows[src]["n_short"] == w["s"]
        assert rows[src]["mean_mattr"] == pytest.approx(w["mm"], abs=1e-5)
    # MATTR is bounded by construction
    for r in rows.values():
        assert 0 < r["mean_mattr"] <= 1.0
