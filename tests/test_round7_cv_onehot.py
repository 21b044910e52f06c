"""Goldens for the round-7 reference-parity additions: cv_loo /
cv_leave_p_out (sklearn LeaveOneOut / LeavePOut(p=2) protocols from
iris_analysis/CV_iris_analysis.ipynb:329-331,377-379 under the exact
nearest-centroid closed form) mirrored with literal per-fold numpy refits,
and encode_onehot mirrored with pandas.get_dummies
(compare_ensemble_with_without_dt.py:81-82)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _load(sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    x = np.floor(np.abs(c["c_acctbal"].to_numpy()) * 100 + 0.5).astype("int64")
    x = x * np.where(c["c_acctbal"].to_numpy() < 0, -1, 1)
    return pd.DataFrame(
        {"id": c["c_custkey"].to_numpy(), "y": c["c_mktsegment"].to_numpy(), "x": x}
    )


def _nearest_centroid_pred(x, classes, n, s):
    """argmin_c |x - s_c/n_c| with ties to the lexicographically first class,
    via the same exact integer cross-multiplied comparison the engine uses."""
    best = None
    for c in classes:
        if n[c] <= 0:
            continue
        d = abs(int(x) * int(n[c]) - int(s[c])) / float(n[c])
        if best is None or d < best[0] or (d == best[0] and c < best[1]):
            best = (d, c)
    return best[1]


def test_cv_loo_matches_per_fold_refits(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.metrics import cv_loo

    got = {r["y"]: r for r in cv_loo(spark, sf_dir).collect()}

    df = _load(sf_dir)
    classes = sorted(df["y"].unique())
    N = {c: int((df["y"] == c).sum()) for c in classes}
    S = {c: int(df.loc[df["y"] == c, "x"].sum()) for c in classes}
    correct = {c: 0 for c in classes}
    # literal LeaveOneOut: refit the centroids with row i held out
    for _, row in df.iterrows():
        n = dict(N)
        s = dict(S)
        n[row["y"]] -= 1
        s[row["y"]] -= int(row["x"])
        if _nearest_centroid_pred(row["x"], classes, n, s) == row["y"]:
            correct[row["y"]] += 1
    for c in classes:
        assert got[c]["n"] == N[c]
        assert got[c]["n_correct"] == correct[c], c
        assert got[c]["accuracy"] == round(correct[c] / N[c], 6)


def test_cv_leave_p_out_matches_enumerated_pairs(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.metrics import _LPO_N, cv_leave_p_out

    got = {r["y"]: r for r in cv_leave_p_out(spark, sf_dir).collect()}

    df = _load(sf_dir)
    df = df[df["id"] <= _LPO_N].reset_index(drop=True)
    classes = sorted(df["y"].unique())
    N = {c: int((df["y"] == c).sum()) for c in classes}
    S = {c: int(df.loc[df["y"] == c, "x"].sum()) for c in classes}
    n_eval = {c: 0 for c in classes}
    correct = {c: 0 for c in classes}
    rows = list(df.itertuples(index=False))
    # literal LeavePOut(2): every C(n,2) pair held out, both elements scored
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            n = dict(N)
            s = dict(S)
            n[a.y] -= 1
            s[a.y] -= int(a.x)
            n[b.y] -= 1
            s[b.y] -= int(b.x)
            for e in (a, b):
                n_eval[e.y] += 1
                if _nearest_centroid_pred(e.x, classes, n, s) == e.y:
                    correct[e.y] += 1
    total_evals = 2 * len(rows) * (len(rows) - 1) // 2
    assert sum(n_eval.values()) == total_evals
    for c in classes:
        assert got[c]["n_eval"] == n_eval[c]
        assert got[c]["n_correct"] == correct[c], c
        assert got[c]["accuracy"] == round(correct[c] / n_eval[c], 6)


def test_loo_and_kfold_agree_on_protocol_counts(spark, sf_dir):
    """The LOO key evaluates every row exactly once — its per-class n must
    equal the summed per-class fold counts of cv_stratified_kfold's source
    protocol applied to the same frame (fold balance sanity tie-in)."""
    from usw_big_data_analysis_spark.queries.metrics import cv_loo

    per_class = {r["y"]: r["n"] for r in cv_loo(spark, sf_dir).collect()}
    df = _load(sf_dir)
    assert per_class == df.groupby("y").size().to_dict()
    # fold assignment per the stratified-kfold key's rule reaches every row
    folds = df.groupby("y").cumcount() % 5
    assert folds.groupby(df["y"]).count().to_dict() == per_class


def test_cv_kfold_plain_matches_per_fold_refits(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.metrics import cv_kfold_plain

    got = {r["fold"]: r for r in cv_kfold_plain(spark, sf_dir).collect()}

    df = _load(sf_dir)
    df["fold"] = (df["id"] % 5).astype(int)
    classes = sorted(df["y"].unique())
    # literal KFold: refit the centroids on the 4 train folds per fold
    for f in sorted(df["fold"].unique()):
        tr = df[df["fold"] != f]
        va = df[df["fold"] == f]
        n = {c: int((tr["y"] == c).sum()) for c in classes}
        s = {c: int(tr.loc[tr["y"] == c, "x"].sum()) for c in classes}
        correct = sum(
            1
            for _, row in va.iterrows()
            if _nearest_centroid_pred(row["x"], classes, n, s) == row["y"]
        )
        assert got[f]["n_val"] == len(va)
        assert got[f]["n_correct"] == correct, f
        assert got[f]["accuracy"] == round(correct / len(va), 6)


def test_cv_multi_metric_matches_per_fold_refits(spark, sf_dir):
    """cross_validate multi-scorer return: per-fold accuracy and macro
    precision/recall/F1 mirrored with literal per-fold refits plus the
    sklearn zero_division=0 macro formulas."""
    from usw_big_data_analysis_spark.queries.metrics import cv_multi_metric

    got = {r["fold"]: r for r in cv_multi_metric(spark, sf_dir).collect()}

    df = _load(sf_dir)
    df["fold"] = (df["id"] % 5).astype(int)
    classes = sorted(df["y"].unique())
    for f in sorted(df["fold"].unique()):
        tr = df[df["fold"] != f]
        va = df[df["fold"] == f]
        n = {c: int((tr["y"] == c).sum()) for c in classes}
        s = {c: int(tr.loc[tr["y"] == c, "x"].sum()) for c in classes}
        preds = [
            _nearest_centroid_pred(row["x"], classes, n, s)
            for _, row in va.iterrows()
        ]
        truth = list(va["y"])
        correct = sum(1 for p, t in zip(preds, truth) if p == t)
        assert got[f]["n_val"] == len(va)
        assert got[f]["accuracy"] == round(correct / len(va), 6)
        # per-class P/R/F1 with zero_division=0, then e9-quantized macro
        # means (the engine's order-free sum form)
        p9 = r9 = f9 = 0
        domain = sorted(set(preds) | set(truth))
        for c in domain:
            tp = sum(1 for p, t in zip(preds, truth) if p == c and t == c)
            pcnt = sum(1 for p in preds if p == c)
            tcnt = sum(1 for t in truth if t == c)
            prec = tp / pcnt if pcnt else 0.0
            rec = tp / tcnt if tcnt else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
            p9 += round(prec * 10**9)
            r9 += round(rec * 10**9)
            f9 += round(f1 * 10**9)
        k = len(domain)
        assert got[f]["precision_macro"] == round(p9 / (k * 1e9), 6), f
        assert got[f]["recall_macro"] == round(r9 / (k * 1e9), 6), f
        assert got[f]["f1_macro"] == round(f9 / (k * 1e9), 6), f


def test_encode_onehot_matches_get_dummies(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.mlprep import encode_onehot

    got = (
        encode_onehot(spark, sf_dir)
        .toPandas()
        .sort_values("nationkey")
        .reset_index(drop=True)
    )

    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    dummies = pd.get_dummies(c["c_mktsegment"]).astype("int64")
    # pd.get_dummies column order == sorted distinct categories — the same
    # contract the Spark fit collect relies on
    assert list(dummies.columns) == sorted(c["c_mktsegment"].unique())
    exp = dummies.groupby(c["c_nationkey"]).sum()
    exp.columns = [f"mkt_{col.lower()}" for col in exp.columns]
    assert list(got.columns) == ["nationkey", "n"] + list(exp.columns)
    for _, r in got.iterrows():
        nk = r["nationkey"]
        assert r["n"] == int((c["c_nationkey"] == nk).sum())
        for col in exp.columns:
            assert r[col] == exp.loc[nk, col], (nk, col)
