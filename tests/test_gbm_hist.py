"""operators/gbm_hist.py: the distributed histogram-GBM.

Three contracts:
1. **Partition invariance** — the model dump is bit-identical whether the
   training frame arrives in 1 partition or 7 (the BIGINT fixed-point
   gradient sums are order-independent; this is the claim that makes the
   trained model reproducible on any cluster layout).
2. **Single-node equivalence** — a pure-numpy reimplementation of the same
   algorithm (same binning, same gain formula, same fixed-point rounding)
   on the collected rows picks the SAME split structure and agrees on leaf
   values / gains to 1e-6 (np.exp vs JVM exp may differ by an ulp, which
   perturbs the 1e-9-scaled integer gradients by at most one unit each).
3. **Boosting works** — train logloss strictly decreases every round.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.operators.gbm_hist import (
    N_BINS,
    _GSCALE,
    score_gbm,
    train_gbm,
)
from usw_big_data_analysis_spark.queries.mlmodels import _FEATURES, _task_frame

N_ROUNDS, DEPTH, LR, LAM = 3, 2, 0.3, 1.0


def _round_half_away(x: np.ndarray) -> np.ndarray:
    a = np.abs(x)
    f = np.floor(a)
    mag = f + (a - f >= 0.5)
    return np.where(x < 0, -mag, mag).astype(np.int64)


def _numpy_gbm(X: np.ndarray, y: np.ndarray, features: list[str]):
    """Single-node reference: identical algorithm, numpy throughout."""
    lo, hi = X.min(axis=0), X.max(axis=0)
    width = np.where(hi > lo, (hi - lo) / N_BINS, 1.0)
    B = np.clip(
        np.floor((X - lo) / width).astype(int), 0, N_BINS - 1
    )
    score = np.zeros(len(y))
    model = []
    for t in range(N_ROUNDS):
        p = 1.0 / (1.0 + np.exp(-score))
        gi = _round_half_away((p - y) * _GSCALE)
        hi_ = _round_half_away(p * (1.0 - p) * _GSCALE)
        node = np.zeros(len(y), dtype=int)
        splits = {}
        for _level in range(DEPTH):
            level_splits = {}
            for nd in sorted(set(node.tolist())):
                m = node == nd
                best = None
                tg_all = gi[m].sum() / _GSCALE
                th_all = hi_[m].sum() / _GSCALE
                parent = tg_all * tg_all / (th_all + LAM)
                for fi, f in enumerate(features):
                    present = sorted(set(B[m, fi].tolist()))
                    if len(present) < 2:
                        continue
                    gl = hl = 0.0
                    nl = 0
                    for b in present[:-1]:
                        sel = m & (B[:, fi] == b)
                        gl += gi[sel].sum() / _GSCALE
                        hl += hi_[sel].sum() / _GSCALE
                        nl += int(sel.sum())
                        gr, hr = tg_all - gl, th_all - hl
                        nr = int(m.sum()) - nl
                        if nl == 0 or nr == 0:
                            continue
                        gain = 0.5 * (
                            gl * gl / (hl + LAM)
                            + gr * gr / (hr + LAM)
                            - parent
                        )
                        if best is None or gain > best[2] + 1e-12:
                            best = (f, b, gain, fi)
                if best is not None and best[2] > 1e-12:
                    level_splits[nd] = best
            if not level_splits:
                break
            for nd, (f, b, gain, fi) in level_splits.items():
                m = node == nd
                model.append(("split", t, nd, f, b, gain))
                node[m & (B[:, fi] <= b)] = 2 * nd + 1
                node[m & (B[:, fi] > b)] = 2 * nd + 2
            splits.update(level_splits)
        for nd in sorted(set(node.tolist())):
            m = node == nd
            w = -LR * (gi[m].sum() / _GSCALE) / (hi_[m].sum() / _GSCALE + LAM)
            model.append(("leaf", t, nd, w, int(m.sum())))
            score[m] += w
    return model


@pytest.fixture(scope="module")
def train_df(spark, sf_dir):
    return (
        _task_frame(spark, sf_dir)
        .filter(~F.col("is_test"))
        .select("label", *_FEATURES)
    )


def test_partition_invariance(train_df):
    m1 = train_gbm(train_df.coalesce(1), _FEATURES,
                   n_rounds=N_ROUNDS, depth=DEPTH, lr=LR, lam=LAM)
    m7 = train_gbm(train_df.repartition(7), _FEATURES,
                   n_rounds=N_ROUNDS, depth=DEPTH, lr=LR, lam=LAM)
    assert m1.bins == m7.bins
    assert [
        (r.round, r.node, r.kind, r.feature, r.bin, r.gain, r.value, r.n)
        for r in m1.rows
    ] == [
        (r.round, r.node, r.kind, r.feature, r.bin, r.gain, r.value, r.n)
        for r in m7.rows
    ]


def test_matches_single_node_numpy(train_df):
    spark_model = train_gbm(train_df, _FEATURES,
                            n_rounds=N_ROUNDS, depth=DEPTH, lr=LR, lam=LAM
                            ).rows
    pdf = train_df.toPandas()
    X = pdf[_FEATURES].to_numpy(dtype=float)
    y = pdf["label"].to_numpy(dtype=float)
    ref = _numpy_gbm(X, y, _FEATURES)

    ref_splits = {(t, nd): (f, b, g) for k, t, nd, f, b, g in
                  (r for r in ref if r[0] == "split")}
    ref_leaves = {(t, nd): (w, n) for k, t, nd, w, n in
                  (r for r in ref if r[0] == "leaf")}

    got_splits = {(r.round, r.node): (r.feature, r.bin, r.gain)
                  for r in spark_model if r.kind == "split"}
    got_leaves = {(r.round, r.node): (r.value, r.n)
                  for r in spark_model if r.kind == "leaf"}

    assert set(got_splits) == set(ref_splits)
    for key, (f, b, g) in ref_splits.items():
        gf, gb, gg = got_splits[key]
        assert (gf, gb) == (f, b), f"split mismatch at {key}"
        assert gg == pytest.approx(g, abs=1e-6)
    assert set(got_leaves) == set(ref_leaves)
    for key, (w, n) in ref_leaves.items():
        gw, gn = got_leaves[key]
        assert gn == n
        assert gw == pytest.approx(w, abs=1e-6)


def test_logloss_strictly_decreases(train_df):
    model = train_gbm(train_df, _FEATURES,
                      n_rounds=N_ROUNDS, depth=DEPTH, lr=LR, lam=LAM)
    curve = [r.value for r in model.rows if r.kind == "metric"]
    assert len(curve) == N_ROUNDS + 1
    assert all(b < a for a, b in zip(curve, curve[1:])), curve


def test_score_gbm_routes_like_numpy(train_df):
    """score_gbm's generated CASE routing reproduces a numpy re-route of
    the same model dump bit-for-bit (margins are sums of the same driver
    floats in the same per-round order)."""
    model = train_gbm(train_df, _FEATURES,
                      n_rounds=N_ROUNDS, depth=DEPTH, lr=LR, lam=LAM)
    scored = score_gbm(train_df, _FEATURES, model)
    pdf = scored.toPandas()
    X = pdf[_FEATURES].to_numpy(dtype=float)

    lo = np.array([model.bins[f][0] for f in _FEATURES])
    width = np.array([model.bins[f][1] for f in _FEATURES])
    B = np.clip(np.floor((X - lo) / width).astype(int), 0, N_BINS - 1)

    by_round = {}
    for r in model.rows:
        if r.kind == "split":
            by_round.setdefault(r.round, {"s": {}, "l": {}})["s"][r.node] = (
                _FEATURES.index(r.feature), r.bin)
        elif r.kind == "leaf":
            by_round.setdefault(r.round, {"s": {}, "l": {}})["l"][r.node] = r.value

    margin = np.zeros(len(pdf))
    for t in sorted(by_round):
        s_, l_ = by_round[t]["s"], by_round[t]["l"]
        node = np.zeros(len(pdf), dtype=int)
        max_d = max(((n + 1).bit_length() - 1 for n in s_), default=-1)
        for d in range(max_d + 1):
            for n, (fi, b) in sorted(s_.items()):
                if (n + 1).bit_length() - 1 != d:
                    continue
                m = node == n
                node[m & (B[:, fi] <= b)] = 2 * n + 1
                node[m & (B[:, fi] > b)] = 2 * n + 2
        w = np.zeros(len(pdf))
        for n, v in l_.items():
            w[node == n] = v
        margin += w
    assert pdf["margin"].to_numpy().tolist() == margin.tolist()
