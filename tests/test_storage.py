"""Layout assertions for queries/storage_ops.py: the compaction file-count
contract and the pushed-filter contract of the sorted sink re-scan (the
row-group-skipping story depends on the predicate reaching the parquet
reader)."""

from __future__ import annotations

import glob
import os

from usw_big_data_analysis_spark.queries.storage_ops import (
    _COMPACTED,
    _TMP,
    sink_compaction,
    sink_sorted_scan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _parquet_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    ]


def test_compaction_reduces_files(spark):
    sink_compaction(spark, SF_DIR).collect()
    frag = _parquet_files(os.path.join(_TMP, "usw_q_compact_frag"))
    compact = _parquet_files(os.path.join(_TMP, "usw_q_compact_out"))
    assert len(frag) > len(compact)
    assert 1 <= len(compact) <= _COMPACTED


def test_sorted_scan_pushes_date_filter(spark):
    df = sink_sorted_scan(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the re-scan must push the date bounds, not just IsNotNull
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any(
        "GreaterThanOrEqual(o_orderdate" in line for line in pushed
    ), pushed
