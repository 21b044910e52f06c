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


# --- vendored codec goldens (real decode path) -------------------------------
def test_ppm_roundtrip_and_known_pixels():
    from usw_big_data_analysis_spark.operators import image_codec as IC

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = IC.encode_ppm(arr)
    assert payload.startswith(b"P6\n3 2\n255\n")
    out = IC.decode_ppm(payload)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, arr)
    # comment + extra whitespace tolerance in the header
    weird = b"P6 # a comment\n 3\t2 # dims\n 255\n" + arr.tobytes()
    assert np.array_equal(IC.decode_ppm(weird), arr)


def test_bmp_roundtrip_row_padding_and_bgr():
    from usw_big_data_analysis_spark.operators import image_codec as IC

    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8).astype(np.uint8)
    payload = IC.encode_bmp(arr)
    assert payload[:2] == b"BM"
    out = IC.decode_bmp(payload)
    assert np.array_equal(out, arr)
    # hand-built 1x1 red pixel: BGR on disk must come back RGB
    red = np.zeros((1, 1, 3), dtype=np.uint8)
    red[0, 0] = [255, 0, 0]
    raw = IC.encode_bmp(red)
    pixel_off = int.from_bytes(raw[10:14], "little")
    assert raw[pixel_off : pixel_off + 3] == b"\x00\x00\xff"  # B,G,R
    assert np.array_equal(IC.decode_bmp(raw), red)


def test_decode_image_dispatch():
    from usw_big_data_analysis_spark.operators import image_codec as IC

    arr = np.full((2, 2, 3), 42, dtype=np.uint8)
    assert np.array_equal(IC.decode_image(IC.encode_ppm(arr)), arr)
    assert np.array_equal(IC.decode_image(IC.encode_bmp(arr)), arr)


def test_decode_pixel_features_golden(spark, sf_dir):
    """End-to-end: generate PPMs in Spark, decode with the real codec in
    mapInPandas, check integer pixel stats against a driver-side numpy
    recomputation."""
    from usw_big_data_analysis_spark.operators.image_codec import encode_ppm
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 4 + doc_id % 3, 2 + doc_id % 2
                px = ((doc_id * 13 + 5 * np.arange(w * h * 3)) % 256).astype(np.uint8)
                ids.append(doc_id)
                blobs.append(encode_ppm(px.reshape(h, w, 3)))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    ids_df = spark.range(0, 7).withColumnRenamed("id", "doc_id")
    payloads = ids_df.mapInPandas(
        gen,
        StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )
    rows = {r["doc_id"]: r for r in MM.decode_pixel_features(payloads).collect()}
    assert len(rows) == 7
    for doc_id in range(7):
        w, h = 4 + doc_id % 3, 2 + doc_id % 2
        px = ((doc_id * 13 + 5 * np.arange(w * h * 3, dtype=np.int64)) % 256)
        r = rows[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_pix"] == w * h * 3
        assert r["sum_px"] == int(px.sum())
        assert r["sum_sq"] == int((px * px).sum())


# --- WAV codec goldens -------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    from usw_big_data_analysis_spark.operators import audio_codec as AC

    mono = (np.arange(100, dtype=np.int64) * 321 % 65536 - 32768).astype(np.int16)
    payload = AC.encode_wav(mono, sample_rate=8000)
    out, rate = AC.decode_wav(payload)
    assert rate == 8000
    assert out.shape == (100, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = np.stack([mono, mono[::-1]], axis=1)
    out2, rate2 = AC.decode_wav(AC.encode_wav(stereo, sample_rate=44100))
    assert rate2 == 44100
    assert np.array_equal(out2, stereo)


def test_wav_decoder_skips_unknown_chunks():
    import struct

    from usw_big_data_analysis_spark.operators import audio_codec as AC

    s = np.array([1, -2, 3], dtype=np.int16)
    raw = AC.encode_wav(s)
    # splice a LIST chunk (odd size -> exercises word alignment) before data
    head, rest = raw[:12], raw[12:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = head + extra + rest
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = AC.decode_wav(spliced)
    assert np.array_equal(out[:, 0], s)


def test_wav_rejects_non_pcm():
    import struct

    from usw_big_data_analysis_spark.operators import audio_codec as AC

    with pytest.raises(ValueError):
        AC.decode_wav(b"RIFX" + b"\x00" * 40)
    # fmt with audio_format=3 (float) must be refused
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError):
        AC.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
