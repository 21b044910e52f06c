"""Semantic goldens for text_watermark_greenlist — parity proves
engine-equality; these pin (a) the aggregate against a pure-Python
recomputation and (b) DETECTION POWER: a text actually generated with a
green-list bias yields a z-score the gate flags, while the natural corpus
flags at the ~2.5% null rate."""

from __future__ import annotations

import hashlib
import math

import duckdb

from usw_big_data_analysis_spark.queries.text_ops import (
    _WM_Z,
    text_watermark_greenlist,
)


def _green(prev: str, cur: str) -> bool:
    return int(hashlib.md5(f"{prev}#{cur}".encode()).hexdigest()[:15], 16) % 2 == 0


def _doc_stats(text: str):
    w = text.split(" ")
    n = len(w) - 1
    g = sum(1 for i in range(n) if _green(w[i], w[i + 1]))
    return n, g


def test_watermark_matches_brute_force(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    agg: dict[str, list[int]] = {}
    for _, source, text in rows:
        n, g = _doc_stats(text)
        z = round((2 * g - n) / math.sqrt(n), 6)
        a = agg.setdefault(source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += g
        a[3] += int(z >= _WM_Z)
    got = {r["source"]: r for r in text_watermark_greenlist(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (nd, nbg, ng, fl) in agg.items():
        r = got[src]
        assert r["n_docs"] == nd
        assert r["sum_bigrams"] == nbg
        assert r["sum_green"] == ng
        assert r["n_flagged"] == fl
        assert r["flagged_ppm"] == fl * 1_000_000 // nd
    # Null-rate law: natural text flags well under 10% overall.
    tot = sum(a[0] for a in agg.values())
    fl = sum(a[3] for a in agg.values())
    assert fl / tot < 0.10


def test_watermark_detects_planted_green_bias():
    # Generate a 200-token text the way a watermarked sampler would: at
    # each step pick the first vocabulary word whose bigram hash is green.
    vocab = [f"w{i}" for i in range(50)]
    toks = ["w0"]
    for _ in range(200):
        nxt = next(w for w in vocab if _green(toks[-1], w))
        toks.append(nxt)
    n, g = _doc_stats(" ".join(toks))
    z = (2 * g - n) / math.sqrt(n)
    assert g == n  # every bigram green by construction
    assert z >= _WM_Z  # the gate flags it with huge margin

    # ...and a natural-ish text (hash-unbiased continuation) stays near
    # the null: z far below the planted one.
    toks2 = [vocab[(7 * i * i + 3 * i) % 50] for i in range(201)]
    n2, g2 = _doc_stats(" ".join(toks2))
    z2 = (2 * g2 - n2) / math.sqrt(n2)
    assert z2 < z
