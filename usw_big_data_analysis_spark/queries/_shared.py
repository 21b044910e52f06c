"""Shared truth/pred frames used across query modules.

Lives outside any registering module on purpose: registration order is the
driver's verification order, and importing helpers from a sibling query
module would transitively register that module's queries first, pinning it
to the front of the coverage window regardless of ALL_MODULES order.

A deterministic pseudo-probability from the key (same arithmetic in both
engines) plays the reference's submission column
(experiments/utils/test.py:25-33).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def truth_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("label"),
    )


def pred_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    prob = ((F.col("o_orderkey") * F.lit(2654435761)) % 1000).cast("double") / 1000.0
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        prob.alias("prob"),
        (prob >= 0.5).cast("int").alias("pred"),
    )


_TRUTH_SQL = """
  SELECT o_orderkey AS id,
         CAST(o_totalprice > 150000.0 AS INT) AS label
  FROM orders
"""
_PRED_SQL = """
  SELECT o_orderkey AS id,
         CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS prob,
         CAST(CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0 >= 0.5 AS INT) AS pred
  FROM orders
"""


_PROC_TMP: str | None = None


def process_tmp() -> str:
    """Per-process private staging root for query-local file round trips.

    Fixed world-shared paths (/tmp/usw_q_*) race under concurrent sessions
    on the same host — another user's half-written file could be read back.
    One mkdtemp per process keeps paths stable across re-runs within a
    session (overwrite semantics still exercised) while isolating sessions
    from each other; removed at interpreter exit.
    """
    global _PROC_TMP
    if _PROC_TMP is None:
        _PROC_TMP = tempfile.mkdtemp(prefix="usw_stage_")
        atexit.register(shutil.rmtree, _PROC_TMP, ignore_errors=True)
    return _PROC_TMP
