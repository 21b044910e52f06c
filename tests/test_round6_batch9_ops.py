"""Goldens for the ninth round-6 batch: join_spatial_radius (brute-force
O(n^2) distance mirror — the exact join the grid replaces) and
metric_multilabel_suite (sklearn-free numpy mirror of the bit mechanism)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_spatial_radius_matches_bruteforce(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.joins_unions import (
        _SPJ_M,
        _SPJ_R,
        join_spatial_radius,
    )

    row = join_spatial_radius(spark, sf_dir).collect()[0]

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    ids = cust["c_custkey"].to_numpy()
    x = np.array([(_h(f"sx:{i}") % _SPJ_M) / _SPJ_M for i in ids])
    y = np.array([(_h(f"sy:{i}") % _SPJ_M) / _SPJ_M for i in ids])
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    dist = np.sqrt(dx * dx + dy * dy)
    upper = ids[:, None] < ids[None, :]
    hits = (dist <= _SPJ_R) & upper
    assert row["n_points"] == len(ids)
    assert row["n_pairs"] == int(hits.sum())
    if hits.any():
        assert row["avg_dist"] == pytest.approx(dist[hits].mean(), abs=1e-5)
    # the grid candidates are a superset of hits and FAR below all-pairs
    assert row["n_candidates"] >= row["n_pairs"]
    assert row["n_candidates"] < len(ids) * (len(ids) - 1) / 2


def test_multilabel_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.metrics import (
        _ML_K,
        metric_multilabel_suite,
    )

    row = metric_multilabel_suite(spark, sf_dir).collect()[0]

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = od["o_orderkey"].to_numpy()
    hy = np.array([_h(f"ml:{k}") for k in keys], dtype=object)
    hf = np.array([_h(f"mf:{k}") for k in keys], dtype=object)
    Y = np.stack([[(int(v) >> k) & 1 for k in range(_ML_K)] for v in hy])
    flip = np.stack([[int((int(v) >> (2 * k)) % 4 == 0) for k in range(_ML_K)] for v in hf])
    P = (Y + flip) % 2
    n = len(keys)
    mism = (Y != P).sum()
    assert row["n"] == n
    assert row["hamming_loss"] == pytest.approx(mism / (n * _ML_K), abs=1e-6)
    assert row["subset_accuracy"] == pytest.approx(
        ((Y == P).all(axis=1)).mean(), abs=1e-6
    )
    tp = int(((Y == 1) & (P == 1)).sum())
    fp = int(((Y == 0) & (P == 1)).sum())
    fn = int(((Y == 1) & (P == 0)).sum())
    assert row["micro_precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
    assert row["micro_recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)
    assert row["micro_f1"] == pytest.approx(
        2 * tp / (2 * tp + fp + fn), abs=1e-6
    )
    f1s = []
    for k in range(_ML_K):
        tpk = int(((Y[:, k] == 1) & (P[:, k] == 1)).sum())
        fpk = int(((Y[:, k] == 0) & (P[:, k] == 1)).sum())
        fnk = int(((Y[:, k] == 1) & (P[:, k] == 0)).sum())
        f1s.append(2 * tpk / (2 * tpk + fpk + fnk))
    assert row["macro_f1"] == pytest.approx(np.mean(f1s), abs=1e-6)
    # the 25% hash flip leaves ~75% per-label accuracy — sanity of mechanism
    assert 0.2 < row["hamming_loss"] < 0.3
