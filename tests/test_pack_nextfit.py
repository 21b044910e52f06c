"""Semantic golden for pack_bins_nextfit — parity proves the recursive-CTE
oracle equals the applyInPandas walk; this recomputes both walks in pure
Python and pins the packing laws."""

from __future__ import annotations

import math

import duckdb

from usw_big_data_analysis_spark.queries.decontam import (
    _NF_BUDGET,
    pack_bins_nextfit,
)


def _walk(lengths) -> int:
    bins, rem = 0, -1
    for n in lengths:
        if n <= rem:
            rem -= n
        else:
            bins += 1
            rem = _NF_BUDGET - n
    return bins


def test_nextfit_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        "SELECT doc_id, source, len(string_split(text, ' ')) AS n"
        f" FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    per_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, src, n in rows:
        per_src.setdefault(src, []).append((doc_id, n))
    got = {r["source"]: r for r in pack_bins_nextfit(spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for src, docs in per_src.items():
        fit = [(d, n) for d, n in docs if n <= _NF_BUDGET]
        sum_tok = sum(n for _, n in fit)
        ba = _walk([n for _, n in sorted(fit)])
        bs = _walk([n for _, n in sorted(fit, key=lambda t: (-t[1], t[0]))])
        r = got[src]
        assert r["n_docs"] == len(docs)
        assert r["n_oversize"] == len(docs) - len(fit)
        assert r["sum_tok"] == sum_tok
        assert r["bins_arrival"] == ba
        assert r["bins_sorted"] == bs
        assert r["util_ppm_arrival"] == sum_tok * 1_000_000 // (ba * _NF_BUDGET)
        assert r["util_ppm_sorted"] == sum_tok * 1_000_000 // (bs * _NF_BUDGET)
        # Packing laws: no walk beats the volume bound, and every bin
        # holds at least one document.
        lower = math.ceil(sum_tok / _NF_BUDGET)
        for bins in (ba, bs):
            assert lower <= bins <= len(fit)
            assert bins * _NF_BUDGET >= sum_tok
