"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions.

North-star extension (BASELINE.json): the reference has no multimodal data,
but a 100 TB training-data pipeline does. The Spark-side contract here is
real and tested — schemas, mapInPandas batch shapes, deterministic
partition-safe outputs. The actual codecs (Pillow/torchaudio/ffmpeg) are
not in this container, so `decode_image` raises NotImplementedError behind
an import gate and the tested path uses `fake_decode_features`, a
deterministic stand-in with the same signature/schema a real decoder
would have.

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
    """Real image decode — requires Pillow, absent in this container.

    On a cluster with the codec libraries installed this becomes
    ``PIL.Image.open(io.BytesIO(payload))`` inside the same mapInPandas
    batch loop as `fake_decode_features` (identical plumbing)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_decode_features for the plumbing-level contract"
        ) from e
    raise NotImplementedError("wire PIL decode here when Pillow is present")


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
