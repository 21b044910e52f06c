"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions.

North-star extension (BASELINE.json): the reference has no multimodal data,
but a 100 TB training-data pipeline does. The Spark-side contract here is
real and tested — schemas, mapInPandas batch shapes, deterministic
partition-safe outputs. Image decode is REAL for PPM/BMP via the vendored
pure-numpy codecs in ``operators/image_codec.py`` (PIL is preferred when
installed and covers everything else); `fake_decode_features` remains as
the format-agnostic byte-level stand-in used where payloads are arbitrary
blobs rather than images.

Scale notes: binary payloads ride the normal columnar path (parquet binary
+ Arrow); never collect them. Feature extraction is mapInPandas so each
task streams batches — O(batch) executor memory regardless of corpus size.
Partitioning: upstream repartition by doc_id keeps one document's bytes in
one task; no shuffle is introduced by the extraction itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_checksum", LongType()),
    ]
)


def decode_image(payload: bytes):
    """Real image decode: PIL when installed, else the vendored pure-numpy
    PPM/BMP codecs (operators/image_codec.py). Returns (H, W, 3) uint8 RGB."""
    from .image_codec import decode_image as _decode

    return _decode(payload)


PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pix", LongType()),  # width*height*3 decoded samples
        StructField("sum_px", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def _pixel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        out = {k: [] for k in ("doc_id", "width", "height", "n_pix", "sum_px", "sum_sq")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            arr = decode_image(bytes(payload))
            px = arr.astype(np.int64)
            out["doc_id"].append(int(doc_id))
            out["height"].append(int(arr.shape[0]))
            out["width"].append(int(arr.shape[1]))
            out["n_pix"].append(int(px.size))
            # integer sufficient statistics — exactly reproducible in SQL,
            # unlike float mean/std whose accumulation order varies
            out["sum_px"].append(int(px.sum()))
            out["sum_sq"].append(int((px * px).sum()))
        yield pd.DataFrame(out)


def decode_pixel_features(binary_df: DataFrame) -> DataFrame:
    """REAL decode + pixel sufficient stats over (doc_id, content binary):
    parses the actual image header (PPM/BMP/any-PIL-format), decodes the
    pixel array, and reduces it to integer sums. Same mapInPandas shape as
    `fake_decode_features`; the decode itself is no longer a stand-in."""
    return binary_df.select("doc_id", "content").mapInPandas(
        _pixel_batches, PIXEL_SCHEMA
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        out = {k: [] for k in ("doc_id", "n_bytes", "byte_mean", "byte_std", "width", "height")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            out["doc_id"].append(int(doc_id))
            out["n_bytes"].append(len(arr))
            out["byte_mean"].append(round(float(arr.mean()), 6) if len(arr) else 0.0)
            out["byte_std"].append(
                round(float(arr.std(ddof=0)), 6) if len(arr) else 0.0
            )
            # deterministic fake header parse: "width"/"height" from the
            # first 4 bytes — stands in for a real codec's header read
            w = int(arr[0]) * 256 + int(arr[1]) if len(arr) >= 2 else 0
            hgt = int(arr[2]) * 256 + int(arr[3]) if len(arr) >= 4 else 0
            out["width"].append(w)
            out["height"].append(hgt)
        yield pd.DataFrame(out)


def fake_decode_features(binary_df: DataFrame) -> DataFrame:
    """Deterministic decode/feature-extract over (doc_id, content binary):
    byte histogram moments + fake header fields. Same mapInPandas shape as
    a real decoder (swap `_feature_batches`'s body for PIL/librosa)."""
    return binary_df.select("doc_id", "content").mapInPandas(
        _feature_batches, FEATURE_SCHEMA
    )


def frame_sample(
    binary_df: DataFrame, frame_bytes: int = 16, stride: int = 32
) -> DataFrame:
    """'Video' frame sampling over opaque bytes: slice a frame_bytes window
    every `stride` bytes (a real sampler seeks codec keyframes; byte-window
    slicing exercises identical batch plumbing). Returns one row per
    sampled frame with a checksum of the actual sliced bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_frames = max(0, (len(arr) - frame_bytes) // stride + 1)
                for fi in range(n_frames):
                    window = arr[fi * stride : fi * stride + frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    sums.append(int(window.astype(np.int64).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return binary_df.select("doc_id", "content").mapInPandas(batches, FRAME_SCHEMA)
