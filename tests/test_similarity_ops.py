"""The vectorized (Arrow/numpy) similarity kernel must agree with the
oracle-exact decimal-fold form: same neighbor sets, cosines within float
tolerance — the metric-golden strategy for non-SQL-checkable paths."""

from __future__ import annotations

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()


def _assert_bit_identical(name, new_rows, old_rows, keycols):
    """The r08 kernel contract: the vectorized form must equal the retained
    relational decimal plan BIT-FOR-BIT (ids, ranks AND values) — the
    registered path is now the kernel and the DuckDB oracle hashes it."""
    new = {tuple(r[k] for k in keycols): r.asDict() for r in new_rows}
    old = {tuple(r[k] for k in keycols): r.asDict() for r in old_rows}
    assert set(new) == set(old), f"{name}: key sets differ"
    for k, row in old.items():
        assert new[k] == row, f"{name}: row {k}: {new[k]} != {row}"


def test_ivfpq_fast_variant_matches_exact(spark, sf_dir):
    """Since r08 the registered embed_ann_ivfpq IS the vectorized integer
    kernel; this pins it bit-identical to the retained relational
    DECIMAL(2x,12) plan (the semantics contract the oracle SQL mirrors)."""
    from usw_big_data_analysis_spark.queries.similarity import (
        _ivfpq_relational,
        embed_ann_ivfpq,
    )

    _assert_bit_identical(
        "ivfpq",
        embed_ann_ivfpq(spark, sf_dir).collect(),
        _ivfpq_relational(spark, sf_dir).collect(),
        ("qid", "rn"),
    )


def test_pq_assign_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        _pq_assign_relational,
        embed_pq_assign,
    )

    _assert_bit_identical(
        "pq_assign",
        embed_pq_assign(spark, sf_dir).collect(),
        _pq_assign_relational(spark, sf_dir).collect(),
        ("subspace", "code"),
    )


def test_pq_search_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        _pq_search_relational,
        embed_pq_search,
    )

    _assert_bit_identical(
        "pq_search",
        embed_pq_search(spark, sf_dir).collect(),
        _pq_search_relational(spark, sf_dir).collect(),
        ("qid", "rn"),
    )


def test_pq_train_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        _pq_train_relational,
        embed_pq_train,
    )

    _assert_bit_identical(
        "pq_train",
        embed_pq_train(spark, sf_dir).collect(),
        _pq_train_relational(spark, sf_dir).collect(),
        ("subspace", "code"),
    )


def test_incremental_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        _incremental_relational,
        embed_ann_incremental,
    )

    _assert_bit_identical(
        "incremental",
        embed_ann_incremental(spark, sf_dir).collect(),
        _incremental_relational(spark, sf_dir).collect(),
        ("bid", "rn"),
    )


def test_hard_negatives_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        _hard_negatives_relational,
        embed_hard_negatives,
    )

    _assert_bit_identical(
        "hard_negatives",
        embed_hard_negatives(spark, sf_dir).collect(),
        _hard_negatives_relational(spark, sf_dir).collect(),
        ("qid", "rn"),
    )


def test_knn_hard_negatives_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.similarity import (
        _knn_hard_negatives_relational,
        knn_hard_negatives,
    )

    _assert_bit_identical(
        "knn_hard_negatives",
        knn_hard_negatives(spark, sf_dir).collect(),
        _knn_hard_negatives_relational(spark, sf_dir).collect(),
        ("qid",),
    )


def test_jl_projections_kernel_matches_relational(spark, sf_dir):
    from usw_big_data_analysis_spark.operators.similarity_ops import (
        jl_projections_vectorized,
    )
    from usw_big_data_analysis_spark.queries.similarity import (
        _JL_K,
        _jl_projections_relational,
    )
    from usw_big_data_analysis_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _assert_bit_identical(
        "jl_projections",
        jl_projections_vectorized(emb, _JL_K).collect(),
        _jl_projections_relational(spark, sf_dir).collect(),
        ("vec_id",),
    )


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


def test_hard_negatives_laws(spark, sf_dir):
    """embed_hard_negatives is the LSH-bucketed scale path: its mined
    pairs must be a SUBSET of the brute-force band pairs (bucketing may
    lose candidates — that's the recall trade — but must never invent
    one), every cosine must sit inside [LO, HI), and no anchor may carry
    more than K negatives."""
    from usw_big_data_analysis_spark.queries.similarity import (
        _HNM_BATCH,
        _HNM_HI,
        _HNM_K,
        _HNM_LO,
        _dec_dot,
        embed_hard_negatives,
    )
    from usw_big_data_analysis_spark.sources import load_table
    from pyspark.sql import functions as F
    from usw_big_data_analysis_spark.functions import numeric as N

    rows = embed_hard_negatives(spark, sf_dir).collect()
    assert rows, "band/bucket must produce negatives on the fixture"
    per_anchor = {}
    for r in rows:
        assert _HNM_LO <= r["cosine"] < _HNM_HI
        assert 1 <= r["rn"] <= _HNM_K
        per_anchor.setdefault(r["qid"], []).append(r)
    assert all(len(v) <= _HNM_K for v in per_anchor.values())

    # brute-force band pairs (no bucketing) — the superset
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )
    q = withn.filter(F.col("vec_id") < _HNM_BATCH).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
    )
    c = withn.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
    )
    brute = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            N.fround(
                _dec_dot(F.col("qemb"), F.col("cemb"))
                / (F.col("nrm_q") * F.col("nrm_c")),
                6,
            ).alias("cosine"),
        )
        .filter((F.col("cosine") >= _HNM_LO) & (F.col("cosine") < _HNM_HI))
        .collect()
    )
    superset = {(r["qid"], r["cid"]): r["cosine"] for r in brute}
    for r in rows:
        assert (r["qid"], r["cid"]) in superset
        assert superset[(r["qid"], r["cid"])] == r["cosine"]


def test_bucket_pair_cosines_matches_expression_form(spark, sf_dir):
    """The per-bucket numpy kernel behind _dup_candidate_cosines must be
    bit-identical to the bucket self-join + _dec_dot expression plan it
    replaced (optimization r07) — same pairs, same cosines, id_a < id_b."""
    from pyspark.sql import functions as F

    from usw_big_data_analysis_spark.functions import numeric as N
    from usw_big_data_analysis_spark.queries.similarity import (
        _SHIFT,
        _dec_dot,
        _dup_candidate_cosines,
        _hyperplane_tagged,
    )
    from usw_big_data_analysis_spark.sources import load_table

    kernel = {
        (r.id_a, r.id_b): r.cosine
        for r in _dup_candidate_cosines(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + _SHIFT).alias("vec_id"), "embedding")
    )
    tagged = _hyperplane_tagged(corpus)
    a = tagged.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = tagged.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    expr_form = {
        (r.id_a, r.id_b): r.cosine
        for r in a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            N.fround(
                _dec_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .collect()
    }
    assert kernel == expr_form  # bit-equal cosines, identical pair set
    assert all(x < y for x, y in kernel)
