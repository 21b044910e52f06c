"""Multimodal queries (north-star extension): binary columns built from the
`documents` fixture (utf-8 payload as the opaque blob), metadata + decode +
frame-sample over operators/multimodal.py.

Oracle strategy: DuckDB has no blob slicing, so the oracle checks the
metadata arithmetic (byte lengths, frame counts — both closed-form) while
Spark actually materializes the binary and slices it in mapInPandas. The
feature-extraction values themselves (byte moments, checksums) are covered
by pytest golden assertions (tests/test_multimodal.py), mirroring the
metric-golden strategy of SURVEY.md §5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..registry import query
from ..sources import load_table


def binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, content binary, lang) — text bytes standing in for an
    image/audio payload column; at ingest this is `binaryFile` format or a
    parquet binary column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("content"), "lang"
    )


# --- typed metadata over the binary column ----------------------------------
@query(
    "multimodal_meta",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           sum(octet_length(encode(text))) AS total_bytes,
           max(octet_length(encode(text))) AS max_bytes,
           round(avg(octet_length(encode(text))), 6) AS avg_bytes
    FROM documents GROUP BY lang
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_docs(spark, sf_dir)
    n = F.length("content")  # byte length of binary
    return b.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n).alias("total_bytes"),
        F.max(n).alias("max_bytes"),
        F.round(F.avg(n), 6).alias("avg_bytes"),
    )


# --- decode / feature-extract (pandas-UDF batch plumbing) --------------------
@query(
    "multimodal_decode",
    oracle="""
    SELECT count(*) AS n_docs,
           sum(octet_length(encode(text))) AS total_bytes,
           sum(CAST(octet_length(encode(text)) >= 4 AS BIGINT)) AS n_with_header
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL mapInPandas feature extraction (byte moments + header
    parse per document), then reduces to the closed-form-checkable totals.
    The per-document feature values are pytest-golden-checked."""
    feats = MM.fake_decode_features(binary_docs(spark, sf_dir))
    return feats.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum((F.col("n_bytes") >= 4).cast("bigint")).alias("n_with_header"),
    )


# --- frame sampling -----------------------------------------------------------
_FRAME_BYTES, _STRIDE = 16, 32


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             greatest(0, (octet_length(encode(text)) - {_FRAME_BYTES}) // {_STRIDE} + 1) AS n_frames
      FROM documents
    )
    SELECT count(*) AS n_docs, sum(n_frames) AS total_frames,
           min(n_frames) AS min_frames, max(n_frames) AS max_frames
    FROM per_doc
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slices real frames in mapInPandas; the oracle validates the frame
    count arithmetic per document (DuckDB cannot slice blobs — the sliced
    bytes are checked by the checksum goldens in pytest)."""
    frames = MM.frame_sample(
        binary_docs(spark, sf_dir), frame_bytes=_FRAME_BYTES, stride=_STRIDE
    )
    per_doc = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    # documents shorter than one frame yield zero rows from the sampler —
    # re-join to count them with n_frames = 0 like the oracle
    all_docs = binary_docs(spark, sf_dir).select("doc_id")
    joined = all_docs.join(per_doc, "doc_id", "left").select(
        F.coalesce("n_frames", F.lit(0)).alias("n_frames")
    )
    return joined.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_frames").alias("total_frames"),
        F.min("n_frames").alias("min_frames"),
        F.max("n_frames").alias("max_frames"),
    )
