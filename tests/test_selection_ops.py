"""Semantic laws for the data-selection / substring-dedup / binary-ANN /
sliding-chunk ops — parity proves engine-equality; these pin what the
answers MEAN via independent pure-Python recomputation on the sf0.001
fixture (50 docs / 50 vectors: brute force is exact and instant)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.corpus_ops import (
    _DSIR_TARGET,
    _DSIR_TOPK,
    _SLIDE_SIZE,
    _SLIDE_STRIDE,
    doc_chunk_sliding,
    select_dsir_importance,
)
from usw_big_data_analysis_spark.queries.dedup import (
    _SUBSTR_K,
    dedup_substring_kgram,
)
from usw_big_data_analysis_spark.queries.similarity import (
    _BQ_SHORTLIST,
    _BQ_TOPK,
    _NQ,
    embed_binary_quantize_hamming,
)


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()


def _round_half_away(y: float) -> int:
    a = abs(y)
    f = math.floor(a)
    v = f + (1 if a - f >= 0.5 else 0)
    return int(-v if y < 0 else v)


# --- dedup_substring_kgram ----------------------------------------------------


def _py_substring_spans(rows, k):
    grams: dict[str, int] = {}
    per_doc: dict[int, list[int]] = {}
    toks_by_doc = {}
    for doc_id, text, _src in rows:
        toks = text.split(" ")
        toks_by_doc[doc_id] = toks
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for doc_id, toks in toks_by_doc.items():
        starts = [
            p + 1
            for p in range(len(toks) - k + 1)
            if grams[" ".join(toks[p : p + k])] >= 2
        ]
        if not starts:
            continue
        spans = []
        for p in starts:
            e = p + k - 1
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([p, e])
        out[doc_id] = (
            len(spans),
            sum(e - s + 1 for s, e in spans),
            len(toks),
        )
    return out


def test_substring_kgram_matches_bruteforce(spark, sf_dir):
    expect = _py_substring_spans(_docs(sf_dir), _SUBSTR_K)
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["n_tok"])
        for r in dedup_substring_kgram(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "fixture corpus must contain at least one duplicated k-gram"


def test_substring_kgram_span_invariants(spark, sf_dir):
    for r in dedup_substring_kgram(spark, sf_dir).collect():
        # every maximal span covers at least one whole k-gram and spans
        # never exceed the document
        assert r["dup_tokens"] >= r["n_spans"] * _SUBSTR_K >= _SUBSTR_K
        assert r["dup_tokens"] <= r["n_tok"]
        assert r["dup_frac"] == pytest.approx(
            round(r["dup_tokens"] / r["n_tok"], 6)
        )


# --- select_dsir_importance ----------------------------------------------------


def test_dsir_matches_bruteforce(spark, sf_dir):
    rows = _docs(sf_dir)
    c_t: dict[str, int] = {}
    c_r: dict[str, int] = {}
    for _id, text, src in rows:
        tgt = src in _DSIR_TARGET
        for w in text.split(" "):
            (c_t if tgt else c_r)[w] = (c_t if tgt else c_r).get(w, 0) + 1
    vocab = set(c_t) | set(c_r)
    n_t, n_r, v = sum(c_t.values()), sum(c_r.values()), len(vocab)
    wt = {
        w: _round_half_away(
            math.log((c_t.get(w, 0) + 0.5) / (n_t + 0.5 * v)) * 1e9
        )
        - _round_half_away(
            math.log((c_r.get(w, 0) + 0.5) / (n_r + 0.5 * v)) * 1e9
        )
        for w in vocab
    }
    scored = []
    for doc_id, text, src in rows:
        if src in _DSIR_TARGET:
            continue
        toks = text.split(" ")
        sw = sum(wt[w] for w in toks)
        scored.append((doc_id, len(toks), sw))
    scored.sort(key=lambda t: (-(t[2] / t[1]), t[0]))
    expect = {(d, n, sw) for d, n, sw in scored[:_DSIR_TOPK]}
    got = {
        (r["doc_id"], r["n_tok"], r["w_sum"])
        for r in select_dsir_importance(spark, sf_dir).collect()
    }
    assert got == expect


def test_dsir_selects_only_pool_docs(spark, sf_dir):
    out = select_dsir_importance(spark, sf_dir)
    picked = {r["doc_id"] for r in out.collect()}
    target_ids = {
        d for d, _t, s in _docs(sf_dir) if s in _DSIR_TARGET
    }
    assert picked.isdisjoint(target_ids)
    assert out.count() == min(
        _DSIR_TOPK, len(_docs(sf_dir)) - len(target_ids)
    )


# --- embed_binary_quantize_hamming ---------------------------------------------


def test_binary_quantize_matches_bruteforce(spark, sf_dir):
    vecs = dict(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    )
    got = [
        (r["qid"], r["cid"], r["hamming"], r["rn"])
        for r in embed_binary_quantize_hamming(spark, sf_dir).collect()
    ]
    by_q: dict[int, list] = {}
    for qid in (q for q in vecs if q < _NQ):
        qv = vecs[qid]
        ham = sorted(
            (
                (
                    sum(
                        (a >= 0) != (b >= 0)
                        for a, b in zip(qv, vecs[cid])
                    ),
                    cid,
                )
                for cid in vecs
                if cid != qid
            )
        )[:_BQ_SHORTLIST]

        def cos(a, b):
            dot = sum(float(x) * float(y) for x, y in zip(a, b))
            na = math.sqrt(sum(float(x) ** 2 for x in a))
            nb = math.sqrt(sum(float(x) ** 2 for x in b))
            return dot / (na * nb)

        rer = sorted(
            ((round(cos(qv, vecs[cid]), 6), h, cid) for h, cid in ham),
            key=lambda t: (-t[0], t[2]),
        )[:_BQ_TOPK]
        by_q[qid] = [
            (qid, cid, h, i + 1) for i, (_c, h, cid) in enumerate(rer)
        ]
    expect = [row for q in sorted(by_q) for row in by_q[q]]
    assert sorted(got) == sorted(expect)


def test_binary_quantize_shape(spark, sf_dir):
    out = embed_binary_quantize_hamming(spark, sf_dir).collect()
    per_q: dict[int, int] = {}
    dim = 64
    for r in out:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        assert 0 <= r["hamming"] <= dim
        assert r["cosine"] <= 1.000001
        assert r["qid"] != r["cid"]
    assert set(per_q) == set(range(_NQ))
    assert all(n == _BQ_TOPK for n in per_q.values())


# --- doc_chunk_sliding ----------------------------------------------------------


def test_sliding_chunks_cover_and_overlap(spark, sf_dir):
    rows = doc_chunk_sliding(spark, sf_dir).collect()
    docs = {d: t for d, t, _s in _docs(sf_dir)}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id].split(" ")
        n = len(toks)
        chunks.sort(key=lambda r: r["chunk_idx"])
        expected_n = 1 + math.ceil(max(0, n - _SLIDE_SIZE) / _SLIDE_STRIDE)
        assert len(chunks) == expected_n
        for j, c in enumerate(chunks):
            assert c["chunk_idx"] == j
            assert c["chunk_start"] == 1 + _SLIDE_STRIDE * j
            start0 = c["chunk_start"] - 1
            piece = toks[start0 : start0 + _SLIDE_SIZE]
            assert c["chunk_len"] == len(piece)
            assert (
                c["chunk_hash"]
                == hashlib.md5(" ".join(piece).encode()).hexdigest()
            )
        # the final chunk reaches the end of the document
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_len"] - 1 == n
        # consecutive chunks overlap by SIZE - STRIDE (when both are full)
        for a, b in zip(chunks, chunks[1:]):
            assert b["chunk_start"] - a["chunk_start"] == _SLIDE_STRIDE
