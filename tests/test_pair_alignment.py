"""Semantic golden for multimodal_pair_alignment — parity proves the
decode path matches the closed-form oracle; this recomputes both
signatures in pure Python (third route: no Spark, no DuckDB, no codec)
and pins the aggregate outcome plus its internal consistency laws."""

from __future__ import annotations

import duckdb

from usw_big_data_analysis_spark.queries.multimodal import (
    _ALIGN_MOD,
    _ALIGN_T,
    multimodal_pair_alignment,
)


def _img_sig(doc_id: int) -> int:
    w, h = 8 + doc_id % 5, 4 + doc_id % 3
    total = 0
    for p in range(w * h):
        base = 3 * p
        total += (
            (doc_id * 31 + 7 * base) % 256
            + (doc_id * 31 + 7 * (base + 1)) % 256
            + (doc_id * 31 + 7 * (base + 2)) % 256
        ) // 3
    return (total // (w * h)) % _ALIGN_MOD


def test_pair_alignment_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    agg: dict[str, list[int]] = {}
    for doc_id, source, text in rows:
        txt_sig = len(text.split(" ")) % _ALIGN_MOD
        d = abs(_img_sig(doc_id) - txt_sig)
        a = agg.setdefault(source, [0, 0, 0])
        a[0] += 1
        a[1] += int(d <= _ALIGN_T)
        a[2] += d
    got = {r["source"]: r for r in multimodal_pair_alignment(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (n, al, sd) in agg.items():
        r = got[src]
        assert r["n_pairs"] == n
        assert r["n_aligned"] == al
        assert r["aligned_ppm"] == al * 1_000_000 // n
        assert r["sum_absdiff"] == sd
    # Laws: the filter is neither degenerate-empty nor pass-through on the
    # natural fixture (a broken scorer typically collapses to 0% or 100%).
    tot = sum(a[0] for a in agg.values())
    kept = sum(a[1] for a in agg.values())
    assert 0 < kept < tot
