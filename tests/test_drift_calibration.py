"""Semantic goldens for drift_emd_price and metric_ece — parity proves
engine-equality; these pin the statistics' MEANING by independent
pure-Python recomputation on the sf0.001 fixture."""

from __future__ import annotations

import math

import duckdb

from usw_big_data_analysis_spark.queries.metrics import metric_ece
from usw_big_data_analysis_spark.queries.mlprep import (
    _EMD_BINW,
    _EMD_PIVOT,
    drift_emd_price,
)


def test_emd_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        "SELECT l_extendedprice, year(l_shipdate)"
        f" FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    na, nb = {}, {}
    for price, yr in rows:
        b = math.floor(price / float(_EMD_BINW))
        side = na if yr <= _EMD_PIVOT else nb
        side[b] = side.get(b, 0) + 1
    ta, tb = sum(na.values()), sum(nb.values())
    bins = sorted(set(na) | set(nb))
    ca = cb = 0
    s = 0
    dmax = 0
    for i, b in enumerate(bins):
        ca += na.get(b, 0)
        cb += nb.get(b, 0)
        num = abs(tb * ca - ta * cb)
        dmax = max(dmax, num)
        gap = bins[i + 1] - b if i + 1 < len(bins) else 0
        s += num * gap
    w1 = round(float(_EMD_BINW) * s / (float(ta) * float(tb)), 6)
    ks = round(dmax / (float(ta) * float(tb)), 6)
    got = drift_emd_price(spark, sf_dir).collect()[0]
    assert got["n_a"] == ta and got["n_b"] == tb
    assert got["n_bins"] == len(bins)
    assert got["w1_price"] == w1
    assert got["ks_price"] == ks


def test_emd_bounds_and_consistency(spark, sf_dir):
    # Laws: W1 >= 0; the quantized KS sup-gap is a probability in [0, 1];
    # and on finite support W1 > 0 iff KS > 0 (both are norms of the same
    # ECDF-difference function).
    got = drift_emd_price(spark, sf_dir).collect()[0]
    assert got["w1_price"] >= 0.0
    assert 0.0 <= got["ks_price"] <= 1.0
    assert (got["w1_price"] > 0) == (got["ks_price"] > 0)


def test_ece_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        "SELECT o_orderkey, CAST(o_totalprice > 150000.0 AS INT)"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    from decimal import Decimal

    nb, pos, sprob = {}, {}, {}
    for key, label in rows:
        prob = float((key * 2654435761) % 1000) / 1000.0
        b = min(int(math.floor(prob * 10)), 9)
        nb[b] = nb.get(b, 0) + 1
        pos[b] = pos.get(b, 0) + label
        # mirror the DECIMAL(38,10) cast: exact decimal of the double,
        # quantized to 10 fractional digits
        sprob[b] = sprob.get(b, Decimal(0)) + round(Decimal(prob), 10)
    n = sum(nb.values())
    ece = round(float(sum(abs(pos[b] - sprob[b]) for b in nb)) / n, 6)
    mce = round(max(float(abs(pos[b] - sprob[b])) / nb[b] for b in nb), 6)
    got = metric_ece(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["n_bins"] == len(nb)
    assert got["ece"] == ece
    assert got["mce"] == mce
    # Laws: 0 <= ECE <= MCE <= 1
    assert 0.0 <= got["ece"] <= got["mce"] <= 1.0
