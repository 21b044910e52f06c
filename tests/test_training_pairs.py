"""Semantic laws for the round-6 training-data ops — parity proves
engine-equality; these pin what the answers MEAN."""

from __future__ import annotations

from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.dedup import (
    dedup_clusters,
    preference_pairs_cluster,
)
from usw_big_data_analysis_spark.queries.similarity import (
    _EVAL_MOD,
    decontam_embedding_eval,
)
from usw_big_data_analysis_spark.sources import load_table


def test_decontam_flags_exactly_the_planted_leaks(spark, sf_dir):
    """Every planted eval copy is cosine-1.0 in its own bucket (identical
    vectors always collide), and the natural corpus has no cosine >= tau —
    so total flags == |eval set|, no more, no less."""
    n_eval = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _EVAL_MOD == 0)
        .count()
    )
    out = decontam_embedding_eval(spark, sf_dir)
    total = out.agg(
        F.sum("n_flagged").alias("f"), F.sum("n_corpus").alias("n")
    ).first()
    assert total["f"] == n_eval
    # corpus = non-eval + planted copies
    n_all = load_table(spark, sf_dir, "embeddings").count()
    assert total["n"] == n_all  # (n_all - n_eval) natural + n_eval planted


def test_preference_pairs_are_ordered_and_cluster_consistent(spark, sf_dir):
    pairs = preference_pairs_cluster(spark, sf_dir)
    rows = pairs.collect()
    assert rows, "fixture clusters of size >= 2 must yield pairs"
    clusters = dedup_clusters(spark, sf_dir)
    sizes = {
        r["cluster_id"]: r["n"]
        for r in clusters.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    members = {
        (r["cluster_id"], r["doc_id"]) for r in clusters.collect()
    }
    for r in rows:
        # one pair per multi-member cluster, disjoint endpoints, both members
        assert r["n_members"] == sizes[r["cluster_id"]] >= 2
        assert r["chosen_id"] != r["rejected_id"]
        assert (r["cluster_id"], r["chosen_id"]) in members
        assert (r["cluster_id"], r["rejected_id"]) in members
        # the gap is the max-min quality spread — never negative
        assert r["quality_gap"] >= 0.0
    # exactly one pair per cluster of size >= 2
    assert len(rows) == sum(1 for n in sizes.values() if n >= 2)
