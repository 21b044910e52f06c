"""The vectorized (Arrow/numpy) similarity kernel must agree with the
oracle-exact decimal-fold form: same neighbor sets, cosines within float
tolerance — the metric-golden strategy for non-SQL-checkable paths."""

from __future__ import annotations

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()


def test_ivfpq_fast_variant_matches_exact(spark, sf_dir):
    """bench.py times embed_ann_ivfpq(exact=False) — double codebook sums
    instead of decimal (FAISS's own arithmetic). The two forms must emit
    identical (qid, cid, rn) neighbor tables with distances within float
    tolerance of each other."""
    from usw_big_data_analysis_spark.queries.similarity import embed_ann_ivfpq

    exact = {
        (r["qid"], r["rn"]): (r["cid"], r["adc_d2"])
        for r in embed_ann_ivfpq(spark, sf_dir, exact=True).collect()
    }
    fast = {
        (r["qid"], r["rn"]): (r["cid"], r["adc_d2"])
        for r in embed_ann_ivfpq(spark, sf_dir, exact=False).collect()
    }
    assert set(exact) == set(fast)
    for key, (cid_e, d_e) in exact.items():
        cid_f, d_f = fast[key]
        assert cid_f == cid_e, f"{key}: neighbor {cid_f} != {cid_e}"
        assert abs(d_f - d_e) < 1e-5, f"{key}: adc_d2 {d_f} vs {d_e}"


def test_vectorized_topk_matches_exact(spark, sf_dir):
    exact = {
        (r["qid"], r["rn"]): (r["cid"], r["cosine"])
        for r in _QUERIES["embed_cosine_topk"](spark, sf_dir).collect()
    }
    fast = {
        (r["qid"], r["rn"]): (r["cid"], r["cosine"])
        for r in _QUERIES["embed_cosine_topk_pandas"](spark, sf_dir).collect()
    }
    assert set(exact) == set(fast)
    for key, (cid_e, cos_e) in exact.items():
        cid_f, cos_f = fast[key]
        assert cid_f == cid_e, f"{key}: neighbor {cid_f} != {cid_e}"
        assert abs(cos_f - cos_e) < 1e-5, f"{key}: cosine {cos_f} vs {cos_e}"
