"""Non-parquet scans and sinks (SURVEY.md §2.1).

Reference sites: CSV scan ``legacy/modeling.py:63-66``; line-oriented text
scan ``computer-structure/computer-structure.ipynb:31-38``; CSV sink
``teamProject/sap.py:158``; JSON results sink
``experiments/overfitting_experiment.py:379-381``.

Scale notes: CSV/text scans are splittable in Spark (no driver bottleneck);
``inferSchema`` is a convenience for small inputs only — at scale pass an
explicit schema (one extra full pass otherwise). Sinks write a directory of
part files; ``single_file=True`` coalesces to 1 partition and is only for
small result/submission tables (the reference's to_csv outputs).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    sep: str = ",",
):
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan -> one `value` string column per line."""
    return spark.read.text(path)


def sink_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def sink_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def roundtrip_csv(df: DataFrame, schema) -> DataFrame:
    """Write `df` to a temp CSV dir and scan it back with an explicit schema.

    Exercises the full CSV sink+scan path (S1/S5) in a checkable way: the
    round-trip must be lossless for the given schema.
    """
    spark = df.sparkSession
    tmp = os.path.join(tempfile.gettempdir(), "usw_spark_csv_roundtrip")
    df.write.mode("overwrite").option("header", True).csv(tmp)
    return read_csv(spark, tmp, schema=schema)
