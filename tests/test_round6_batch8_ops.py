"""Goldens for the eighth round-6 batch: privacy_rr_frequency (mechanism
inversion bound + exact mechanism mirror), feature_mutual_info (numpy
entropy mirror), scan_csv_multiline (round-trip against pandas)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_rr_mechanism_matches_python_mirror(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.privacy_ops import (
        _RR_M,
        _RR_P,
        privacy_rr_frequency,
    )

    rows = {r["event_type"]: r for r in privacy_rr_frequency(spark, sf_dir).collect()}

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cats = ["click", "error", "purchase", "signup", "view"]
    rep, true = {}, {}
    for eid, et in zip(ev["event_id"], ev["event_type"]):
        u = _h(f"rr:{eid}") % _RR_M
        alt = _h(f"rr2:{eid}") % 5
        r = et if u < int(_RR_P * _RR_M) else cats[alt]
        rep[r] = rep.get(r, 0) + 1
        true[et] = true.get(et, 0) + 1
    n = len(ev)
    for et, row in rows.items():
        assert row["n_reported"] == rep[et]
        assert row["n_true"] == true[et]
        est = (rep[et] / n - (1 - _RR_P) / 5) / _RR_P
        assert row["est_share"] == pytest.approx(est, abs=1e-6)
        assert row["abs_err"] == pytest.approx(abs(est - true[et] / n), abs=1e-6)
    # estimated shares invert the mechanism: they sum to ~1
    assert sum(r["est_share"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-4
    )


def test_mutual_info_matches_numpy(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.mlprep import feature_mutual_info

    row = feature_mutual_info(spark, sf_dir).collect()[0]

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    b = np.minimum(np.floor(li["l_extendedprice"].to_numpy() / 20000.0), 4).astype(
        int
    )
    y = li["l_returnflag"].to_numpy()
    n = len(b)
    joint = pd.crosstab(b, y).to_numpy().astype(float)
    p = joint / n
    px, py = p.sum(axis=1, keepdims=True), p.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, p * np.log(p / (px @ py)), 0.0)
    mi = terms.sum()
    hx = -(px[px > 0] * np.log(px[px > 0])).sum()
    hy = -(py[py > 0] * np.log(py[py > 0])).sum()
    assert row["n"] == n
    assert row["mi_nats"] == pytest.approx(mi, abs=1e-5)
    assert row["h_x"] == pytest.approx(hx, abs=1e-5)
    assert row["h_y"] == pytest.approx(hy, abs=1e-5)
    assert row["nmi"] == pytest.approx(mi / np.sqrt(hx * hy), abs=1e-4)
    assert 0.0 <= row["nmi"] <= 1.0


def test_multiline_csv_roundtrip_counts(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.sources_extra import (
        scan_csv_multiline,
    )

    rows = {r["source"]: r for r in scan_csv_multiline(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    content = docs["text"].where(
        docs["doc_id"] % 7 != 0, docs["text"].str.replace(" ", "\n")
    )
    want = (
        docs.assign(L=content.str.len())
        .groupby("source")
        .agg(n=("L", "size"), s=("L", "sum"))
    )
    assert set(rows) == set(want.index)
    for src, w in want.iterrows():
        assert rows[src]["n_docs"] == w["n"]
        assert rows[src]["sum_len"] == w["s"]
    # at least one doc actually carries embedded newlines
    assert (docs["doc_id"] % 7 == 0).any()
