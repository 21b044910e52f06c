"""Laws for the round-4 assumption-check / multiple-testing queries.

Parity (tests/test_oracle_parity.py) already pins Spark == DuckDB for these
keys; this module pins the SEMANTICS against independent computations:
the portable normal tail against math.erfc, Jarque-Bera and Brown-Forsythe
against direct numpy moment/median recomputation, Cliff's delta against the
brute-force pairwise count, and the Benjamini-Hochberg output against the
procedure's order/bound laws.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from usw_big_data_analysis_spark.functions import numeric as N
from usw_big_data_analysis_spark.registry import all_queries


def _pdf(spark, sf_dir, key):
    return all_queries()[key](spark, sf_dir).toPandas()


def test_norm_sf_matches_erfc_within_contract():
    """A&S 26.2.17 promises |err| < 7.5e-8 against the exact tail; check the
    SQL twin (DuckDB-evaluated, the same expression Spark runs) on a grid
    spanning the central region and the far tail."""
    con = duckdb.connect()
    xs = [i / 100.0 for i in range(0, 801)]  # 0.00 .. 8.00
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {N.sql_norm_sf('x')} FROM (SELECT unnest(?) AS x)", [xs]
        ).fetchall()
    ]
    for x, g in zip(xs, got):
        exact = 0.5 * math.erfc(x / math.sqrt(2.0))
        assert abs(g - exact) < 7.5e-8, (x, g, exact)
        assert 0.0 <= g <= 0.5


def _group_vals(sf_dir, flag):
    con = duckdb.connect()
    return con.execute(
        f"SELECT l_quantity FROM '{sf_dir}/lineitem.parquet' "
        f"WHERE l_returnflag = ?",
        [flag],
    ).fetchnumpy()["l_quantity"]


def test_jarque_bera_matches_numpy_moments(spark, sf_dir):
    out = _pdf(spark, sf_dir, "normality_jarque_bera").set_index("grp")
    for flag in ("A", "N", "R"):
        x = _group_vals(sf_dir, flag)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        skew = m3 / m2**1.5
        kurt_x = m4 / m2**2 - 3.0
        jb = len(x) / 6.0 * (skew**2 + kurt_x**2 / 4.0)
        row = out.loc[flag]
        assert row["n"] == len(x)
        assert row["skewness"] == pytest.approx(skew, abs=1e-6)
        assert row["kurtosis_excess"] == pytest.approx(kurt_x, abs=1e-6)
        assert row["jb_stat"] == pytest.approx(jb, rel=1e-6)


def test_levene_matches_numpy_median_centering(spark, sf_dir):
    groups = [_group_vals(sf_dir, f) for f in ("A", "N", "R")]
    zs = [np.abs(g - np.median(g)) for g in groups]
    k = len(zs)
    nn = sum(len(z) for z in zs)
    zbar = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w = (ssb / (k - 1)) / (ssw / (nn - k))
    row = _pdf(spark, sf_dir, "levene_brown_forsythe").iloc[0]
    assert row["df_between"] == k - 1
    assert row["df_within"] == nn - k
    assert row["w_stat"] == pytest.approx(w, abs=5.1e-7)  # output is 6dp-rounded


def test_cliffs_delta_matches_bruteforce(spark, sf_dir):
    a, r = _group_vals(sf_dir, "A"), _group_vals(sf_dir, "R")
    gt = sum(int((x > r).sum()) for x in a)
    lt = sum(int((x < r).sum()) for x in a)
    delta = (gt - lt) / (len(a) * len(r))
    row = _pdf(spark, sf_dir, "effect_sizes_two_group").iloc[0]
    assert row["cliffs_delta"] == pytest.approx(delta, abs=1e-6)
    # pooled-sd d and rank delta must agree in sign (same direction of shift)
    if abs(row["cohens_d"]) > 1e-4:
        assert np.sign(row["cohens_d"]) == np.sign(row["cliffs_delta"])
    assert abs(row["hedges_g"]) <= abs(row["cohens_d"]) + 1e-12


def test_fdr_bh_procedure_laws(spark, sf_dir):
    out = _pdf(spark, sf_dir, "multiple_test_fdr_bh").sort_values("rank_p")
    m = len(out)
    assert list(out["rank_p"]) == list(range(1, m + 1))
    # p sorted by rank; q = step-up cummin, so q is monotone non-decreasing,
    # bounded by [p, 1], and the rejection set is a prefix of the ranking
    p, q = out["p_value"].to_numpy(), out["q_bh"].to_numpy()
    assert (np.diff(p) >= -1e-12).all()
    assert (np.diff(q) >= -1e-12).all()
    assert (q >= p - 1e-9).all()
    assert (q <= 1.0).all()
    rej = out["reject_05"].to_numpy()
    assert set(rej) <= {0, 1}
    if rej.any():
        last = np.max(np.nonzero(rej))
        assert rej[: last + 1].all()
    # independent recomputation of q from the emitted p-values
    ref = np.minimum(np.minimum.accumulate((p * m / np.arange(1, m + 1))[::-1])[::-1], 1.0)
    assert np.allclose(q, np.round(ref, 9), atol=2e-9)


def test_recursive_capped_balance_matches_python_fold(spark, sf_dir, duck):
    """The recursive walk must equal a literal Python fold over the monthly
    revenue series (clamp at each step) — pins that the engine recursion is
    the sequential recurrence and not some reassociated shortcut."""
    months = duck.execute(
        f"""
        SELECT year(o_orderdate) * 12 + month(o_orderdate) AS idx,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY idx
        """
    ).fetchall()
    total = sum(r for _, r in months)
    draw = int(np.floor(total / len(months)))
    cap = 2 * draw
    bal, expect = cap, {}
    prev_idx = None
    for idx, rev in months:
        if prev_idx is not None and idx != prev_idx + 1:
            break  # the walk only follows the contiguous chain
        bal = min(cap, max(0, bal + rev - draw))
        expect[idx] = bal
        prev_idx = idx
    out = _pdf(spark, sf_dir, "sql_recursive_capped_balance")
    got = {int(r.yr) * 12 + int(r.mo): int(r.bal_c) for r in out.itertuples()}
    assert got == expect
    assert all(0 <= b <= cap for b in got.values())


def test_isotonic_minimax_equals_pav(spark, sf_dir):
    """fit(i) = max_{j<=i} min_{k>=i} avg[j..k] must equal the classic
    pool-adjacent-violators algorithm, and the fit must be monotone and
    total-preserving (pooling preserves the weighted sum)."""
    out = _pdf(spark, sf_dir, "calibration_isotonic").sort_values("bucket")
    n = out["n"].to_numpy(dtype=float)
    pos = out["pos"].to_numpy(dtype=float)
    # independent PAV: stack of (weight, mean) blocks, merge while decreasing
    blocks: list[list[float]] = []
    for w, p in zip(n, pos):
        blocks.append([w, p / w])
        while len(blocks) > 1 and blocks[-2][1] >= blocks[-1][1]:
            w2, m2 = blocks.pop()
            w1, m1 = blocks.pop()
            blocks.append([w1 + w2, (w1 * m1 + w2 * m2) / (w1 + w2)])
    # expand blocks back to per-bucket values
    vals: list[float] = []
    bi = 0
    for w, m2 in blocks:
        acc = 0.0
        while acc < w - 1e-9:
            acc += n[bi]
            vals.append(m2)
            bi += 1
    pav = np.array(vals)
    iso = out["iso_rate"].to_numpy()
    assert len(pav) == len(iso)
    assert np.allclose(iso, np.round(pav, 6), atol=2e-6)
    assert (np.diff(iso) >= -1e-9).all()  # monotone non-decreasing
    assert abs((iso * n).sum() - pos.sum()) < 1e-4 * pos.sum() + 1.0
