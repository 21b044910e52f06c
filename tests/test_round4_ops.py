"""Semantic laws for the round-4 operators that a value-hash can't state:
URL canonicalization is idempotent and normal-form; Neyman allocation
respects the budget and favors high-variance strata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.dedup import (
    _URL_CANON_SQL,
    dedup_url_canonical,
)
from usw_big_data_analysis_spark.queries.scale_ops import (
    _NEY_TARGET,
    stratified_sample_neyman,
)


def test_url_canonical_normal_form(spark, sf_dir):
    """Every canonical URL is lowercase, www-free, slash-trimmed,
    param-free — and canonicalizing a canonical URL is a no-op
    (idempotence over the actual corpus, not hand-picked cases)."""
    from usw_big_data_analysis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    u = docs.selectExpr(f"{_URL_CANON_SQL} AS c")
    bad = u.filter(
        (F.col("c") != F.lower("c"))
        | F.col("c").like("https://www.%")
        | F.col("c").like("%/")
        | F.col("c").contains("?")
    )
    assert bad.count() == 0


def test_url_canonical_counts_consistent(spark, sf_dir):
    rows = dedup_url_canonical(spark, sf_dir).collect()
    for r in rows:
        # raw forms >= canonical groups; collapsed groups have >=2 variants
        assert r["n_raw"] >= r["n_canonical"]
        assert r["max_variants"] >= 1
        if r["n_collapsed_groups"] == 0:
            assert r["n_raw"] == r["n_canonical"]


def test_neyman_budget_and_ordering(spark, sf_dir):
    rows = stratified_sample_neyman(spark, sf_dir).collect()
    total_target = sum(r["n_target"] for r in rows)
    # rounding each share to nearest int keeps the total within half a
    # row per stratum of the budget
    assert abs(total_target - _NEY_TARGET) <= max(1, len(rows) // 2 + 1)
    for r in rows:
        # allocation proportional to N_h * S_h: zero-variance strata get 0
        if r["s_h"] == 0.0:
            assert r["n_target"] == 0
        # the draw cannot exceed the stratum population
        assert 0 <= r["n_sampled"] <= r["n_rows"]
    # higher N_h*S_h weight never gets a smaller allocation
    by_weight = sorted(rows, key=lambda r: r["n_rows"] * r["s_h"])
    targets = [r["n_target"] for r in by_weight]
    assert targets == sorted(targets)


def test_neyman_draw_rate_tracks_target(spark, sf_dir):
    """Hash-Bernoulli keeps ~n_target/N_h of each stratum; at fixture
    sizes the binomial spread is wide, so assert a loose 4-sigma band."""
    rows = stratified_sample_neyman(spark, sf_dir).collect()
    for r in rows:
        if r["n_target"] == 0 or r["n_rows"] < 50:
            continue
        p = min(1.0, r["n_target"] / r["n_rows"])
        mean = p * r["n_rows"]
        sigma = (r["n_rows"] * p * (1 - p)) ** 0.5
        assert abs(r["n_sampled"] - mean) <= 4 * sigma + 1, r
