"""Semantic goldens for embed_ann_multiprobe — parity proves
engine-equality; these recompute the probe logic in pure Python (decimal
mirrors of the engines' quantization) and pin the multi-probe recall law:
probing the least-confident neighbor bucket never hurts and strictly helps
on this fixture."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from usw_big_data_analysis_spark.queries.similarity import (
    _NPLANES,
    _NQ,
    _TOPK,
    embed_ann_lsh,
    embed_ann_multiprobe,
)

_Q12 = Decimal("1e-12")


def _d12(x: float) -> Decimal:
    return Decimal(x).quantize(_Q12, rounding=ROUND_HALF_UP)


def _load(sf_dir):
    rows = duckdb.sql(
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        f" FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    return {vid: vec for vid, vec in rows}


def _r(j: int, p: int) -> float:
    return float((j * 64 + p) * 2654435761 % 1000) / 1000.0 - 0.5


def _margins(vec):
    return [
        float(sum(_d12(v * _r(j, p)) for p, v in enumerate(vec)))
        for j in range(_NPLANES)
    ]


def _bucket(m):
    return sum((1 << j) for j in range(_NPLANES) if m[j] > 0)


def _flip_mask(m):
    j = min(range(_NPLANES), key=lambda j: (abs(m[j]), j))
    return 1 << j


def _cosine(a, b):
    dot = float(sum(_d12(x * y) for x, y in zip(a, b)))
    na = float(sum(_d12(x * x) for x in a)) ** 0.5
    nb = float(sum(_d12(y * y) for y in b)) ** 0.5
    return round(dot / (na * nb), 6)


def test_multiprobe_matches_brute_force(spark, sf_dir):
    vecs = _load(sf_dir)
    marg = {vid: _margins(v) for vid, v in vecs.items()}
    buck = {vid: _bucket(m) for vid, m in marg.items()}
    expect = {}
    for qid in [v for v in vecs if v < _NQ]:
        b = buck[qid]
        fm = _flip_mask(marg[qid])
        probes = {b, b + fm - 2 * (b & fm)}
        cand = [c for c in vecs if c != qid and buck[c] in probes]
        scored = sorted(
            ((_cosine(vecs[qid], vecs[c]), c) for c in cand),
            key=lambda t: (-t[0], t[1]),
        )[:_TOPK]
        expect[qid] = [(c, cos) for cos, c in scored]
    got: dict[int, list] = {}
    for r in sorted(
        embed_ann_multiprobe(spark, sf_dir).collect(), key=lambda r: (r["qid"], r["rn"])
    ):
        got.setdefault(r["qid"], []).append((r["cid"], r["cosine"]))
    assert got == expect


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    # Law: the multi-probe candidate set contains the home bucket, so for
    # every query its rank-k cosine is >= the single-probe rank-k cosine.
    mp = {}
    for r in embed_ann_multiprobe(spark, sf_dir).collect():
        mp.setdefault(r["qid"], {})[r["rn"]] = r["cosine"]
    sp = {}
    for r in embed_ann_lsh(spark, sf_dir).collect():
        sp.setdefault(r["qid"], {})[r["rn"]] = r["cosine"]
    assert set(sp) <= set(mp)
    improved = 0
    for qid, ranks in sp.items():
        for rn, cos in ranks.items():
            assert mp[qid].get(rn, cos) >= cos
            if mp[qid].get(rn, cos) > cos:
                improved += 1
    if len(sp) >= _NQ:  # natural fixture: the second probe must earn keep
        assert improved > 0
