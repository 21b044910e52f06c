"""Law test for merge_mor: merge-on-read mechanics must produce exactly the
copy-on-write result — same change feed, same final state, different file
physics. Parity already checks both against the shared oracle; this pins
the cross-mechanics identity directly (and that the MOR read path really
goes through the three on-disk artifacts)."""

from __future__ import annotations

from usw_big_data_analysis_spark.queries.pipeline_ops import merge_cow, merge_mor


def test_mor_equals_cow(spark, sf_dir):
    cow = {
        r["status"]: (r["n"], r["total_cents"])
        for r in merge_cow(spark, sf_dir).collect()
    }
    mor = {
        r["status"]: (r["n"], r["total_cents"])
        for r in merge_mor(spark, sf_dir).collect()
    }
    assert cow == mor
    assert len(cow) >= 2  # the feed touches multiple status classes


def test_mor_reads_from_staged_files(spark, sf_dir):
    import os

    from usw_big_data_analysis_spark.queries._shared import process_tmp

    merge_mor(spark, sf_dir).collect()
    root = os.path.join(process_tmp(), "merge_mor")
    for part in ("base", "deletes", "log"):
        d = os.path.join(root, part)
        assert any(f.endswith(".parquet") for f in os.listdir(d)), part
