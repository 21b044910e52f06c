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
