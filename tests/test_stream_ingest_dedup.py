"""Semantic golden for stream_dedup_lsh_ingest — parity proves the drained
streaming output equals the batch-free oracle; this pins what the outcome
MEANS by recomputing the first-claim rule in pure Python from the MinHash
definition (md5-prefix hash, affine family, 4x2 banding) on sf0.001."""

from __future__ import annotations

import hashlib

import duckdb

from usw_big_data_analysis_spark.queries.dedup import (
    _A,
    _B,
    _BANDS,
    _INGEST_BATCHES,
    _INGEST_ORD,
    _K,
    _MH_P,
    stream_dedup_lsh_ingest,
)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bands_of_text(text: str):
    toks = text.split(" ")
    shingles = {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    } if len(toks) >= 3 else set()
    if not shingles:
        return []
    h9s = [_h(s) % _MH_P for s in shingles]
    sig = [min((_A[j] * h + _B[j]) % _MH_P for h in h9s) for j in range(_K)]
    return [
        (b, f"{sig[2 * b]}_{sig[2 * b + 1]}") for b in range(_BANDS)
    ]


def test_ingest_dedup_matches_first_claim_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    win: dict[tuple[int, str], int] = {}
    doc_bands = {}
    for doc_id, text in rows:
        bands = _bands_of_text(text)
        doc_bands[doc_id] = bands
        key = (doc_id % _INGEST_BATCHES) * _INGEST_ORD + doc_id
        for bk in bands:
            win[bk] = min(win.get(bk, key), key)
    agg = {
        b: {"n_docs": 0, "n_emitted": 0, "n_suppressed": 0, "id_sum": 0}
        for b in range(_INGEST_BATCHES)
    }
    for doc_id, _ in rows:
        batch = doc_id % _INGEST_BATCHES
        key = batch * _INGEST_ORD + doc_id
        is_dup = any(win[bk] < key for bk in doc_bands[doc_id])
        a = agg[batch]
        a["n_docs"] += 1
        a["n_suppressed" if is_dup else "n_emitted"] += 1
        if not is_dup:
            a["id_sum"] += doc_id
    got = {r["batch_id"]: r for r in stream_dedup_lsh_ingest(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for b, a in agg.items():
        assert got[b]["n_docs"] == a["n_docs"]
        assert got[b]["n_emitted"] == a["n_emitted"]
        assert got[b]["n_suppressed"] == a["n_suppressed"]
        assert got[b]["emitted_id_sum"] == a["id_sum"]
    # Laws: totals conserve the corpus; the globally-first doc of every
    # band chain is emitted, so each batch emits at least one doc (the
    # fixture has non-empty batches).
    assert sum(a["n_docs"] for a in agg.values()) == len(rows)
    assert all(got[b]["n_emitted"] >= 1 for b in agg)
