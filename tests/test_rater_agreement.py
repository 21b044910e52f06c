"""Pins quality_rater_agreement's Fleiss' kappa against an independent
per-item recomputation (the textbook table form: n_ij category counts per
item, P_i per-item agreement, P_e from category marginals) built in plain
Python from the raw corpus — a different factorization than the engine's
integer-moment aggregation, so an algebra slip in either would diverge."""

from __future__ import annotations

import math

from usw_big_data_analysis_spark.queries.decontam import quality_rater_agreement
from usw_big_data_analysis_spark.sources import load_table


def _raters(text: str) -> tuple[int, int, int]:
    r1 = int(len(text) >= 200)
    r2 = int(len([w for w in text.split(" ") if w != ""]) >= 40)
    r3 = int("the" in text)
    return r1, r2, r3


def test_fleiss_kappa_matches_textbook_form(spark, sf_dir):
    row = quality_rater_agreement(spark, sf_dir).collect()[0]
    docs = [r["text"] for r in load_table(spark, sf_dir, "documents").collect()]
    votes = [sum(_raters(t)) for t in docs]
    n, k = len(votes), 3
    assert row["n_docs"] == n
    # textbook: P_i = (sum_j n_ij^2 - k) / (k (k-1)); P_e = sum_j p_j^2
    p_i = [(s * s + (k - s) * (k - s) - k) / (k * (k - 1)) for s in votes]
    pbar = sum(p_i) / n
    p1 = sum(votes) / (n * k)
    pe = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (pbar - pe) / (1 - pe)
    assert math.isclose(row["p_mean"], pbar, rel_tol=1e-12)
    assert math.isclose(row["p_expected"], pe, rel_tol=1e-12)
    assert math.isclose(row["fleiss_kappa"], kappa, rel_tol=1e-9)


def test_raters_actually_disagree(spark, sf_dir):
    """The statistic is only informative if the corpus produces real
    disagreement: kappa must be strictly inside (-1, 1) and every rater's
    positive rate strictly inside (0, 1)."""
    row = quality_rater_agreement(spark, sf_dir).collect()[0]
    assert -1.0 < row["fleiss_kappa"] < 1.0
    for c in ("rate_len", "rate_tok", "rate_stop"):
        assert 0.0 < row[c] < 1.0


def test_krippendorff_alpha_matches_textbook(spark, sf_dir):
    """quality_krippendorff_alpha vs the literal coincidence-matrix
    formulation (Krippendorff 2004, nominal): build the full o_ck matrix
    per pairable unit in pandas and compute alpha = 1 - D_o/D_e directly —
    independent of the engine's quantized-sum plan."""
    import pandas as pd

    from usw_big_data_analysis_spark.queries.decontam import (
        quality_krippendorff_alpha,
    )

    row = quality_krippendorff_alpha(spark, sf_dir).collect()[0]

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    cnt = (
        ev.groupby(["user_id", "d", "event_type"]).size().rename("nuv").reset_index()
    )
    units = cnt.groupby(["user_id", "d"])["nuv"].sum()
    pairable = units[units >= 2]
    cnt = cnt.set_index(["user_id", "d"]).loc[pairable.index].reset_index()

    # observed disagreement: per unit, ordered pairs with different values
    do_num = 0.0
    for (_, _), g in cnt.groupby(["user_id", "d"]):
        mu = g["nuv"].sum()
        do_num += (mu * mu - (g["nuv"] ** 2).sum()) / (mu - 1)
    n = int(pairable.sum())
    n_c = cnt.groupby("event_type")["nuv"].sum()
    d_o = do_num / n
    d_e = (n * n - (n_c**2).sum()) / (n * (n - 1))
    alpha = 1 - d_o / d_e

    assert row["n_units"] == len(pairable)
    assert row["n_ratings"] == n
    assert row["n_values"] == len(n_c)
    assert math.isclose(row["d_o"], round(d_o, 6), abs_tol=2e-6)
    assert math.isclose(row["d_e"], round(d_e, 6), abs_tol=2e-6)
    assert math.isclose(row["alpha"], round(alpha, 6), abs_tol=5e-6)
    assert -1.0 < row["alpha"] < 1.0
