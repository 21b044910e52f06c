"""Minimal pure-Python SAS7BDAT *writer* (uncompressed, little-endian u64).

The reference's primary raw input is ``pd.read_sas('hn22_all.sas7bdat')``
(1-1.data_processing.ipynb:54-55). This container has pandas' built-in
sas7bdat reader but no writer anywhere in the ecosystem (SAS never published
one; pandas/pyreadstat are read-only), so round-1 emulated S2 with a parquet
stand-in. This module closes that gap: it emits real SAS7BDAT bytes per the
publicly documented layout (the community-reverse-engineered spec that
pandas' reader implements: sas7bdat.pdf vignette, BioStatMatt/sas7bdat),
and the independent verifier is pandas' own parser — writer and reader are
separate implementations, so a layout bug in either breaks the round trip.

Supported surface (deliberately the uncompressed core): float64 ("d") and
fixed-width latin-1/ascii string ("s") columns, one metadata page + as many
pure DATA pages as needed. No RLE/RDC compression, no mix pages, no 32-bit
variant — readers accept all of this as a plain uncompressed u64 file.

File layout written here:
- 1 KiB header: magic, u64 markers (offsets 32/35 = 0x33), endianness 0x01,
  encoding utf-8(20), creation/modification dates, header/page sizes.
- one META page (type 0): subheader pointer array at bit_offset+8 (24-byte
  u64 pointers), payloads packed 8-aligned after; subheaders written:
  row-size (row length/count, lcs=lcp=0), column-size, column-text (one
  block holding all names), column-name pointers, column-attributes
  (per-column row offset / width / type), one format stub per column
  (pandas indexes column_formats[j] during chunk conversion, so they are
  required even when empty).
- DATA pages (type 256): block_count rows packed back-to-back from
  bit_offset+8; doubles little-endian IEEE, strings space-padded.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)
_PAGE_BIT_OFFSET = 32  # u64 files
_SUBHEADER_PTR_LEN = 24
_HEADER_SIZE = 1024

_SIG_ROWSIZE = b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00"
_SIG_COLSIZE = b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00"
_SIG_COLTEXT = b"\xfd\xff\xff\xff\xff\xff\xff\xff"
_SIG_COLNAME = b"\xff\xff\xff\xff\xff\xff\xff\xff"
_SIG_COLATTR = b"\xfc\xff\xff\xff\xff\xff\xff\xff"
_SIG_FORMAT = b"\xfe\xfb\xff\xff\xff\xff\xff\xff"


def _pad(b: bytes, n: int) -> bytes:
    if len(b) > n:
        raise ValueError(f"{len(b)} > {n}")
    return b + b"\x00" * (n - len(b))


def write_sas7bdat(
    path: str,
    columns: list[str],
    arrays: list[np.ndarray],
    page_size: int = 0x10000,
) -> None:
    """Write columns (each float64 or fixed-width bytes/str ndarray) as an
    uncompressed u64 little-endian sas7bdat."""
    if len(columns) != len(arrays):
        raise ValueError("columns/arrays length mismatch")
    ncols = len(columns)
    nrows = len(arrays[0]) if arrays else 0
    for a in arrays:
        if len(a) != nrows:
            raise ValueError("ragged columns")

    # column physical layout: row offset, width, type (1=double, 2=string)
    col_meta: list[tuple[int, int, int]] = []
    encoded: list[np.ndarray] = []
    off = 0
    for a in arrays:
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(a.dtype, np.integer):
            a = np.asarray(a, dtype="<f8")
            col_meta.append((off, 8, 1))
            off += 8
            encoded.append(a)
        else:
            raw = np.asarray(
                [str(x).encode("utf-8") for x in a], dtype=object
            )
            width = max((len(b) for b in raw), default=1) or 1
            col_meta.append((off, width, 2))
            off += width
            encoded.append(
                np.asarray([b.ljust(width, b" ") for b in raw], dtype=object)
            )
    row_length = off
    if row_length == 0:
        raise ValueError("no columns")

    rows_per_page = (page_size - _PAGE_BIT_OFFSET - 8) // row_length
    if rows_per_page < 1:
        raise ValueError("page_size too small for one row")
    n_data_pages = (nrows + rows_per_page - 1) // rows_per_page if nrows else 0

    # --- subheaders ---------------------------------------------------------
    # column-text block: [u16 size][6 pad][utf-8 names...]
    name_bytes = [c.encode("utf-8") for c in columns]
    text_payload = bytearray(b"\x00" * 8)
    name_pos: list[tuple[int, int]] = []
    for nb in name_bytes:
        name_pos.append((len(text_payload), len(nb)))
        text_payload += nb
    while len(text_payload) % 8:
        text_payload += b"\x00"
    struct.pack_into("<H", text_payload, 0, len(text_payload))
    sh_coltext = _SIG_COLTEXT + bytes(text_payload)

    # row-size: row_length @ sig+40, row_count @ +48, colcount p1/p2 @ +72/+80,
    # mix-page row count @ +120, lcs @ +682, lcp @ +706
    rs = bytearray(808)
    rs[0:8] = _SIG_ROWSIZE
    struct.pack_into("<Q", rs, 40, row_length)
    struct.pack_into("<Q", rs, 48, nrows)
    struct.pack_into("<Q", rs, 72, ncols)
    struct.pack_into("<Q", rs, 80, 0)
    struct.pack_into("<Q", rs, 120, 0)  # no mix pages
    struct.pack_into("<H", rs, 682, 0)  # lcs
    struct.pack_into("<H", rs, 706, 0)  # lcp
    sh_rowsize = bytes(rs)

    cs = bytearray(24)
    cs[0:8] = _SIG_COLSIZE
    struct.pack_into("<Q", cs, 8, ncols)
    sh_colsize = bytes(cs)

    # column-name pointers: first pointer at sig+16, 8 bytes each:
    # [u16 text-subheader idx][u16 offset][u16 len][2 pad]
    cn = bytearray(8 + 8 + 8 * ncols + 12)
    cn[0:8] = _SIG_COLNAME
    for i, (npos, nlen) in enumerate(name_pos):
        base = 16 + 8 * i
        struct.pack_into("<HHH", cn, base, 0, npos, nlen)
    sh_colname = bytes(cn)

    # column-attributes: 16-byte vectors at sig+16:
    # [u64 row offset][u32 width][2 pad][u8 type][1 pad]
    ca = bytearray(8 + 8 + 16 * ncols + 12)
    ca[0:8] = _SIG_COLATTR
    for i, (coff, cwidth, ctype) in enumerate(col_meta):
        base = 16 + 16 * i
        struct.pack_into("<Q", ca, base, coff)
        struct.pack_into("<I", ca, base + 8, cwidth)
        ca[base + 14] = ctype
    sh_colattr = bytes(ca)

    # one empty format/label subheader per column (zero lengths -> "")
    sh_formats = [_pad(_SIG_FORMAT, 64) for _ in range(ncols)]

    subheaders = [sh_rowsize, sh_colsize, sh_coltext, sh_colname, sh_colattr]
    subheaders.extend(sh_formats)

    # --- meta page ----------------------------------------------------------
    meta = bytearray(page_size)
    nsub = len(subheaders)
    struct.pack_into("<H", meta, _PAGE_BIT_OFFSET + 0, 0)  # page_meta_type
    struct.pack_into("<H", meta, _PAGE_BIT_OFFSET + 2, nsub)
    struct.pack_into("<H", meta, _PAGE_BIT_OFFSET + 4, nsub)
    ptr_base = _PAGE_BIT_OFFSET + 8
    payload_at = ptr_base + _SUBHEADER_PTR_LEN * nsub
    payload_at += (-payload_at) % 8
    for i, sh in enumerate(subheaders):
        if payload_at + len(sh) > page_size:
            raise ValueError("meta page overflow; raise page_size")
        meta[payload_at : payload_at + len(sh)] = sh
        p = ptr_base + _SUBHEADER_PTR_LEN * i
        struct.pack_into("<QQ", meta, p, payload_at, len(sh))
        meta[p + 16] = 0  # compression: none
        meta[p + 17] = 0  # type
        payload_at += len(sh)
        payload_at += (-payload_at) % 8

    # --- data pages ---------------------------------------------------------
    # vectorized row assembly: one byte matrix, column slices filled per type
    rowmat = np.zeros((nrows, row_length), dtype=np.uint8)
    for (coff, cwidth, ctype), col in zip(col_meta, encoded):
        if ctype == 1:
            rowmat[:, coff : coff + 8] = col.view(np.uint8).reshape(nrows, 8)
        else:
            block = b"".join(col.tolist())
            rowmat[:, coff : coff + cwidth] = np.frombuffer(
                block, dtype=np.uint8
            ).reshape(nrows, cwidth)

    with open(path, "wb") as f:
        hdr = bytearray(_HEADER_SIZE)
        hdr[0:32] = _MAGIC
        hdr[32] = 0x33  # u64 marker
        hdr[35] = 0x33  # align1 = 4
        hdr[37] = 0x01  # little-endian
        hdr[70] = 20  # encoding: utf-8
        hdr[84:92] = b"SAS FILE"
        struct.pack_into("<d", hdr, 164 + 4, 0.0)  # created (1960 epoch)
        struct.pack_into("<d", hdr, 172 + 4, 0.0)  # modified
        struct.pack_into("<I", hdr, 196 + 4, _HEADER_SIZE)
        struct.pack_into("<I", hdr, 200 + 4, page_size)
        struct.pack_into("<I", hdr, 204 + 4, 1 + n_data_pages)
        f.write(hdr)
        f.write(meta)
        for p in range(n_data_pages):
            lo = p * rows_per_page
            hi = min(nrows, lo + rows_per_page)
            page = bytearray(page_size)
            struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 0, 256)  # data page
            struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 2, hi - lo)
            struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 4, 0)
            body = rowmat[lo:hi].tobytes()
            start = _PAGE_BIT_OFFSET + 8
            page[start : start + len(body)] = body
            f.write(page)
