"""Golden checks for the multimodal byte-level paths DuckDB can't express:
the mapInPandas feature values and frame checksums are recomputed in plain
Python on a few documents and must match exactly."""

from __future__ import annotations

import numpy as np
import pytest

from usw_big_data_analysis_spark.operators import multimodal as MM
from usw_big_data_analysis_spark.queries.multimodal import binary_docs


def test_decode_features_golden(spark, sf_dir):
    b = binary_docs(spark, sf_dir).filter("doc_id < 5")
    feats = {r["doc_id"]: r for r in MM.fake_decode_features(b).collect()}
    docs = {r["doc_id"]: bytes(r["content"]) for r in b.collect()}
    assert set(feats) == set(docs)
    for doc_id, payload in docs.items():
        arr = np.frombuffer(payload, dtype=np.uint8)
        r = feats[doc_id]
        assert r["n_bytes"] == len(arr)
        assert r["byte_mean"] == round(float(arr.mean()), 6)
        assert r["byte_std"] == round(float(arr.std(ddof=0)), 6)
        assert r["width"] == int(arr[0]) * 256 + int(arr[1])
        assert r["height"] == int(arr[2]) * 256 + int(arr[3])


def test_frame_sample_golden(spark, sf_dir):
    b = binary_docs(spark, sf_dir).filter("doc_id < 3")
    frames = MM.frame_sample(b, frame_bytes=16, stride=32).collect()
    docs = {r["doc_id"]: bytes(r["content"]) for r in b.collect()}
    by_doc: dict[int, dict[int, int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["frame_checksum"]
    for doc_id, payload in docs.items():
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_frames = max(0, (len(arr) - 16) // 32 + 1)
        got = by_doc.get(doc_id, {})
        assert len(got) == n_frames
        for fi in range(n_frames):
            expected = int(arr[fi * 32 : fi * 32 + 16].astype(np.int64).sum())
            assert got[fi] == expected


def test_decode_image_is_gated():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG\r\n")
