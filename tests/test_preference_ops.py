"""Goldens for the preference/arena family (queries/preference_ops.py):
the Bradley-Terry MM trajectory mirrored with a literal numpy loop using
the same quantization contract, and the connectivity audit mirrored with a
plain union-find — both built from the raw parquet with pandas, fully
independent of the engine's plan."""

from __future__ import annotations

import math

import pandas as pd

_ROUNDS = 8


def _matches(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pt = pd.read_parquet(f"{sf_dir}/part.parquet")[["p_partkey", "p_brand"]]
    li = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).apply(math.floor)
    ob = li.groupby(["l_orderkey", "p_brand"], as_index=False)["cents"].sum()
    rows = []
    for _, g in ob.groupby("l_orderkey"):
        top = g.sort_values(
            ["cents", "p_brand"], ascending=[False, True]
        ).head(2)
        if len(top) < 2:
            continue
        b1, b2 = top["p_brand"].iloc[0], top["p_brand"].iloc[1]
        rows.append((min(b1, b2), max(b1, b2), b1))
    return pd.DataFrame(rows, columns=["i", "j", "winner"])


def _matrix(m):
    return (
        m.assign(wi=(m["winner"] == m["i"]).astype("int64"))
        .groupby(["i", "j"], as_index=False)
        .agg(n=("winner", "size"), w=("wi", "sum"))
    )


def _rhalf(x: float) -> float:
    # half-away-from-zero on positives — the engines' round() contract
    return math.floor(x + 0.5)


def test_bradley_terry_matches_literal_mm(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.preference_ops import (
        preference_bradley_terry,
    )

    got = {
        r["player"]: r
        for r in preference_bradley_terry(spark, sf_dir).collect()
    }

    mat = _matrix(_matches(sf_dir))
    sym = {}  # p -> list of (o, n)
    W, M = {}, {}
    for _, r in mat.iterrows():
        i, j, n, w = r["i"], r["j"], int(r["n"]), int(r["w"])
        sym.setdefault(i, []).append((j, n))
        sym.setdefault(j, []).append((i, n))
        W[i] = W.get(i, 0) + w
        W[j] = W.get(j, 0) + (n - w)
        M[i] = M.get(i, 0) + n
        M[j] = M.get(j, 0) + n

    s = {p: 1.0 for p in sym}
    for _ in range(_ROUNDS):
        nxt = {}
        for p, opps in sym.items():
            st6 = sum(int(_rhalf((n / (s[p] + s[o])) * 1_000_000)) for o, n in opps)
            nxt[p] = round(W[p] / (st6 / 1_000_000), 9)
        t9 = sum(int(_rhalf(v * 1_000_000_000)) for v in nxt.values())
        np_ = len(nxt)
        s = {p: round(v * np_ / (t9 / 1_000_000_000), 9) for p, v in nxt.items()}

    assert set(got) == set(s)
    order = sorted(s, key=lambda p: (-s[p], p))
    for rank, p in enumerate(order, 1):
        assert got[p]["wins"] == W[p], p
        assert got[p]["matches"] == M[p], p
        assert abs(got[p]["strength"] - round(s[p], 6)) < 1e-9, p
        assert got[p]["bt_rank"] == rank, p


def test_connectivity_matches_union_find(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.preference_ops import (
        preference_graph_connectivity,
    )

    row = preference_graph_connectivity(spark, sf_dir).collect()[0]

    mat = _matrix(_matches(sf_dir))
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in mat.iterrows():
        for node in (r["i"], r["j"]):
            parent.setdefault(node, node)
        a, b = find(r["i"]), find(r["j"])
        if a != b:
            parent[max(a, b)] = min(a, b)

    comps = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)

    P = len(parent)
    assert row["n_players"] == P
    assert row["n_pairs"] == len(mat)
    assert row["n_matches"] == int(mat["n"].sum())
    assert row["n_components"] == len(comps)
    assert row["largest_component"] == max(len(v) for v in comps.values())
    assert abs(row["pair_coverage"] - round(len(mat) / (P * (P - 1) / 2), 6)) < 1e-9


def test_winrate_matrix_wilson_within_bounds(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.preference_ops import (
        preference_winrate_matrix,
    )

    rows = preference_winrate_matrix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["i"] < r["j"]
        assert 0 <= r["wins_i"] <= r["n_matches"]
        assert 0.0 <= r["ci_lo"] <= r["winrate_i"] + 1e-9
        assert r["winrate_i"] - 1e-9 <= r["ci_hi"] <= 1.0 + 1e-9
