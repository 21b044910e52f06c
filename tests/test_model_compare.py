"""Semantic goldens for the multi-model CV comparison family — parity
proves engine-equality; these pin what the statistics MEAN via independent
pure-Python recomputation over the sf0.001 orders fixture (1.5k rows:
brute force is exact and instant)."""

from __future__ import annotations

import math

import duckdb

from usw_big_data_analysis_spark.queries.model_compare import (
    _FOLDS,
    _K,
    _NEMENYI_Q4,
    _REPS,
    _THETA_A,
    _THETA_B,
    _THETAS,
    cochran_q_models,
    cv_corrected_ttest,
    friedman_nemenyi_cv,
)


def _rows(sf_dir):
    return duckdb.sql(
        "SELECT o_orderkey, CAST(o_totalprice > 150000.0 AS INT)"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()


def _prob(key: int) -> float:
    return float((key * 2654435761) % 1000) / 1000.0


def _correct(key: int, label: int, theta: float) -> int:
    return int((1 if _prob(key) >= theta else 0) == label)


# --- cochran_q_models --------------------------------------------------------


def test_cochran_q_matches_brute_force(spark, sf_dir):
    rows = _rows(sf_dir)
    t = [0] * _K
    s1 = s2 = 0
    for key, label in rows:
        r = 0
        for j, theta in enumerate(_THETAS):
            c = _correct(key, label, theta)
            t[j] += c
            r += c
        s1 += r
        s2 += r * r
    k = _K
    expect_q = round(
        (k - 1) * (k * sum(x * x for x in t) - s1 * s1) / float(k * s1 - s2), 6
    )
    got = cochran_q_models(spark, sf_dir).collect()[0]
    assert got["n"] == len(rows)
    assert [got[f"t{j + 1}"] for j in range(k)] == t
    assert got["q_stat"] == expect_q
    assert got["q_stat"] >= 0.0


# --- friedman_nemenyi_cv -----------------------------------------------------


def _friedman_brute(rows):
    cell_c = {}  # (fold, model) -> correct
    cell_n = {}
    for key, label in rows:
        fold = key % _FOLDS
        cell_n[fold] = cell_n.get(fold, 0) + 1
        for j, theta in enumerate(_THETAS):
            cell_c[(fold, j + 1)] = cell_c.get((fold, j + 1), 0) + _correct(
                key, label, theta
            )
    ranks = {}  # (fold, model) -> average rank of accuracy (rank 1 = best)
    for fold in cell_n:
        accs = {m: cell_c[(fold, m)] / cell_n[fold] for m in range(1, _K + 1)}
        for m, a in accs.items():
            gt = sum(1 for x in accs.values() if x > a)
            eq = sum(1 for x in accs.values() if x == a)
            ranks[(fold, m)] = gt + (eq + 1) / 2.0
    rsum = {m: sum(ranks[(f, m)] for f in cell_n) for m in range(1, _K + 1)}
    chi2 = round(
        12.0 / (_FOLDS * _K * (_K + 1)) * sum(v * v for v in rsum.values())
        - 3.0 * _FOLDS * (_K + 1),
        6,
    )
    return cell_c, rsum, chi2


def test_friedman_matches_brute_force(spark, sf_dir):
    rows = _rows(sf_dir)
    cell_c, rsum, chi2 = _friedman_brute(rows)
    got = {r["model"]: r for r in friedman_nemenyi_cv(spark, sf_dir).collect()}
    assert set(got) == set(range(1, _K + 1))
    cd = round(_NEMENYI_Q4 * math.sqrt(_K * (_K + 1.0) / (6.0 * _FOLDS)), 6)
    for m in range(1, _K + 1):
        assert got[m]["n_correct"] == sum(
            cell_c[(f, m)] for f in range(_FOLDS)
        )
        assert got[m]["mean_rank"] == rsum[m] / _FOLDS
        assert got[m]["friedman_chi2"] == chi2
        assert got[m]["nemenyi_cd"] == cd


def test_friedman_rank_sums_are_conserved(spark, sf_dir):
    # Law: within every fold ranks sum to k(k+1)/2, so the total rank mass
    # is K*k(k+1)/2 regardless of the data.
    got = friedman_nemenyi_cv(spark, sf_dir).collect()
    total = sum(r["mean_rank"] for r in got) * _FOLDS
    assert total == _FOLDS * _K * (_K + 1) / 2.0


# --- cv_corrected_ttest ------------------------------------------------------


def _round_half_away(y: float) -> int:
    a = abs(y)
    f = math.floor(a)
    v = f + (1 if a - f >= 0.5 else 0)
    return int(-v if y < 0 else v)


def test_corrected_ttest_matches_brute_force(spark, sf_dir):
    rows = _rows(sf_dir)
    sd = sdd = st = strn = 0
    for rep in range(_REPS):
        n_test = n_train = c_a = c_b = 0
        for key, label in rows:
            test = ((key + 131 * rep) * 2654435761) % 5 == 0
            if test:
                n_test += 1
                c_a += _correct(key, label, _THETA_A)
                c_b += _correct(key, label, _THETA_B)
            else:
                n_train += 1
        d9 = _round_half_away((c_a - c_b) / n_test * 1e9)
        sd += d9
        sdd += d9 * d9
        st += n_test
        strn += n_train
    j = _REPS
    mean_d = round(sd / 1e9 / j, 9)
    var_d = round((sdd / 1e18 - (sd / 1e9) ** 2 / 1e0 / j / 1e0) / (j - 1), 12)
    # same composition order as the query: sdd/1e18 - sd*sd/1e18/J
    var_term = (sdd / 1e18 - float(sd) * float(sd) / 1e18 / j) / (j - 1)
    t = round(
        sd / 1e9 / j / math.sqrt((1.0 / j + st / strn) * var_term), 6
    )
    got = cv_corrected_ttest(spark, sf_dir).collect()[0]
    assert got["n_reps"] == j
    assert got["mean_d"] == mean_d
    assert got["var_d"] == round(var_term, 12) == var_d
    assert got["t_corrected"] == t


def test_corrected_ttest_correction_inflates_variance(spark, sf_dir):
    # Law: the Nadeau-Bengio denominator is strictly larger than the naive
    # resampled t denominator (1/J alone), so |t_corrected| < |t_naive|.
    got = cv_corrected_ttest(spark, sf_dir).collect()[0]
    if got["var_d"] and got["var_d"] > 0:
        t_naive = got["mean_d"] / math.sqrt(got["var_d"] / _REPS)
        assert abs(got["t_corrected"]) < abs(t_naive)
