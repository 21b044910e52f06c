"""Semantic golden for kmeans_parallel_init — parity proves engine-equality;
this replays the k-means|| rounds in pure Python integer arithmetic and
pins the oversampling laws."""

from __future__ import annotations

import duckdb

from usw_big_data_analysis_spark.queries.clustering import (
    _KPP_L,
    _KPP_PACK,
    _KPP_R,
    _KPP_SCALE,
    _KPP_UMOD,
    kmeans_parallel_init,
)


def _round_half_away(y: float) -> int:
    import math

    a = abs(y)
    f = math.floor(a)
    v = f + (1 if a - f >= 0.5 else 0)
    return int(-v if y < 0 else v)


def test_kmeans_parallel_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        f" FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {
        vid: [_round_half_away(v * _KPP_SCALE) for v in vec] for vid, vec in rows
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cands = [(min(vecs), 0)]
    for r in range(1, _KPP_R + 1):
        dmin = {
            vid: min(d2(v, vecs[cid]) for cid, _ in cands)
            for vid, v in vecs.items()
        }
        phi = sum(dmin.values())
        for vid in sorted(vecs):
            u = (vid * 2654435761 + r * 97003) % _KPP_UMOD
            if u * phi < _KPP_L * _KPP_UMOD * dmin[vid]:
                cands.append((vid, r))
    weights: dict[int, int] = {}
    for vid, v in vecs.items():
        bkey = min(d2(v, vecs[cid]) * _KPP_PACK + cid for cid, _ in cands)
        weights[bkey % _KPP_PACK] = weights.get(bkey % _KPP_PACK, 0) + 1
    expect = {
        cid: (rnd, weights.get(cid, 0)) for cid, rnd in cands
    }
    got = {
        r["cid"]: (r["round_added"], r["weight"])
        for r in kmeans_parallel_init(spark, sf_dir).collect()
    }
    assert got == expect
    # Laws: exactly one seed; every corpus point assigned somewhere (weights
    # conserve the corpus); expected candidates per round ~ L (loose band).
    assert [rnd for _, (rnd, _) in got.items()].count(0) == 1
    assert sum(wt for _, (_, wt) in got.items()) == len(vecs)
    n_sampled = len(got) - 1
    assert 1 <= n_sampled <= 4 * _KPP_L * _KPP_R
