"""Minimal pure-numpy image codecs (binary PPM "P6" and 24-bit uncompressed
BMP) so the multimodal decode path exercises a REAL header parse + pixel
decode in this container (Pillow is absent; see decode_image's PIL-first
dispatch). Both formats are trivially specified public formats:

- PPM P6: ASCII header ``P6 <width> <height> <maxval>\\n`` (whitespace- and
  ``#``-comment-tolerant), then width*height*3 raw RGB bytes.
- BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), 24 bpp, BI_RGB
  (uncompressed), bottom-up row order, rows padded to 4-byte multiples,
  pixels stored BGR.

Encoders exist so tests and fixture builders can construct bit-exact
payloads; decoders return (height, width, 3) uint8 RGB arrays.

Scale note: these run inside Arrow-batched mapInPandas workers — decode is
per-document CPU with O(image) memory, no shuffle; the binary column itself
rides the columnar parquet/Arrow path.
"""

from __future__ import annotations

import struct

import numpy as np


# --- PPM (P6) ----------------------------------------------------------------
def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB array")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse n_tokens whitespace-separated ASCII ints after the magic,
    skipping ``#`` comments; returns (tokens, offset_of_pixel_data)."""
    tokens: list[int] = []
    i = 2  # past "P6"
    cur = b""
    while len(tokens) < n_tokens:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            if cur:
                tokens.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
        i += 1
    return tokens, i


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_header_tokens(payload, 3)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * 3
    pix = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return pix.reshape(h, w, 3).copy()


# --- BMP (24 bpp BI_RGB) -----------------------------------------------------
def encode_bmp(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB array")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, padded
    body = b"".join(
        arr[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24 bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the common case)
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --- dispatch ----------------------------------------------------------------
def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    Prefers Pillow when installed (full format coverage); falls back to the
    vendored PPM/BMP decoders, which cover the fixture formats used by the
    multimodal queries. Anything else raises NotImplementedError — the
    plumbing contract (mapInPandas batch shape, schema) is format-agnostic.
    """
    try:
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except ImportError:
        pass
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"no decoder for payload magic {payload[:2]!r} without Pillow"
    )
