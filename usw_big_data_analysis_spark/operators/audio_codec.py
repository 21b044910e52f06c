"""Minimal pure-Python/numpy WAV (RIFF PCM) codec — the audio member of the
multimodal decode family, sibling of ``image_codec.py``. WAV is a public,
trivially specified container: RIFF header, ``fmt `` chunk (PCM fields),
``data`` chunk of little-endian samples. The decoder walks chunks properly
(skipping unknown ones, honoring word alignment), so files written by other
tools parse too; 16-bit mono/stereo PCM is supported — the shape feature
extraction actually consumes.

Scale note: like image decode, this runs inside Arrow-batched mapInPandas —
per-document CPU, O(clip) memory, no shuffle; the binary column rides
parquet/Arrow.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a WAV file."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 PCM samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload -> ((n, ch) int16 array, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_fields = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt_fields
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, ch).copy(), rate
