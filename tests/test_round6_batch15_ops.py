"""Goldens for the fifteenth round-6 batch: rocchio_centroid_eval (numpy
nearest-centroid mirror) and dedup_token_savings (consistency against the
registered LSH candidate pairs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_rocchio_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        rocchio_centroid_eval,
    )

    rows = {
        (r["label"], r["pred"]): r["n"]
        for r in rocchio_centroid_eval(spark, sf_dir).collect()
    }

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    y = emb["label"].to_numpy()
    classes = np.unique(y)
    cent = np.stack([X[y == c].mean(axis=0) for c in classes])
    d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    pred = classes[np.argmin(d2, axis=1)]  # argmin ties -> smallest class
    want = pd.crosstab(y, pred)
    for (lab, prd), n in rows.items():
        assert want.loc[lab, prd] == n
    assert sum(rows.values()) == len(y)
    # resubstitution accuracy of a centroid model must beat chance
    acc = sum(n for (lab, prd), n in rows.items() if lab == prd) / len(y)
    assert acc > 1.5 / len(classes)


def test_token_savings_consistent_with_candidates(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.dedup import dedup_token_savings

    rows = {r["source"]: r for r in dedup_token_savings(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ntok = docs["text"].str.split(" ").str.len()
    per_src = docs.assign(n_tok=ntok).groupby("source")["n_tok"].agg(["size", "sum"])
    assert set(rows) == set(per_src.index)
    total_saved = 0
    for src, r in rows.items():
        assert r["n_docs"] == per_src.loc[src, "size"]
        assert r["tokens_total"] == per_src.loc[src, "sum"]
        assert 0 <= r["tokens_saved"] <= r["tokens_total"]
        assert r["savings_ppm"] == r["tokens_saved"] * 1_000_000 // r["tokens_total"]
        total_saved += r["n_dominated"]
    # the fixture is built with near-dups: suppression must fire somewhere
    assert total_saved > 0
