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

The page builders (``build_header`` / ``build_meta_page`` /
``build_data_page`` / ``layout_from_spec`` / ``encode_rowmat``) are public
so the distributed sink (``sas_datasource.py``: every Spark task encodes
its own DATA pages, the commit step writes header+meta and concatenates)
shares one encoding with the driver-side ``write_sas7bdat``.
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


def layout_from_spec(spec: list[tuple[str, int]]) -> tuple[list, int]:
    """Physical layout from a declared column spec: (name, 0) for a
    float64 column, (name, width>0) for a fixed-width string column.
    Returns ([(row_offset, width, type)], row_length) — the declared form
    a DISTRIBUTED writer needs (every task must agree on widths without
    seeing the other tasks' data)."""
    col_meta: list[tuple[int, int, int]] = []
    off = 0
    for _name, w in spec:
        if w <= 0:
            col_meta.append((off, 8, 1))
            off += 8
        else:
            col_meta.append((off, w, 2))
            off += w
    if off == 0:
        raise ValueError("no columns")
    return col_meta, off


def rows_per_page(page_size: int, row_length: int) -> int:
    n = (page_size - _PAGE_BIT_OFFSET - 8) // row_length
    if n < 1:
        raise ValueError("page_size too small for one row")
    return n


def encode_rowmat(
    arrays: list[np.ndarray], col_meta: list[tuple[int, int, int]]
) -> np.ndarray:
    """Pack columns into the (nrows, row_length) byte matrix. Doubles are
    little-endian IEEE; strings utf-8, space-padded to the declared width
    (ValueError on overflow — a distributed task must fail loudly rather
    than silently truncate)."""
    nrows = len(arrays[0]) if arrays else 0
    row_length = sum(w for _, w, _ in col_meta)
    rowmat = np.zeros((nrows, row_length), dtype=np.uint8)
    for (coff, cwidth, ctype), col in zip(col_meta, arrays):
        if len(col) != nrows:
            raise ValueError("ragged columns")
        if ctype == 1:
            a = np.asarray(col, dtype="<f8")
            rowmat[:, coff : coff + 8] = a.view(np.uint8).reshape(nrows, 8)
        else:
            padded = []
            for x in col:
                if x is None:
                    b = b""  # SAS missing character value = blank
                else:
                    b = x if isinstance(x, bytes) else str(x).encode("utf-8")
                if len(b) > cwidth:
                    raise ValueError(
                        f"string {b!r} exceeds declared width {cwidth}"
                    )
                padded.append(b.ljust(cwidth, b" "))
            block = b"".join(padded)
            rowmat[:, coff : coff + cwidth] = np.frombuffer(
                block, dtype=np.uint8
            ).reshape(nrows, cwidth)
    return rowmat


def encode_rowmat_arrow(table, spec, col_meta) -> np.ndarray:
    """Arrow-native twin of ``encode_rowmat`` for the distributed writer
    (optimization r07, guide §4.1): builds the (nrows, row_length) byte
    matrix straight from a pyarrow Table's buffers — no ``to_pylist``, no
    per-row ljust loop. Strings are space-padded by scattering the
    concatenated utf-8 data buffer through a column-index < length mask
    (row-major boolean assignment preserves per-row order); nulls become
    all-blank (the SAS missing character value), identical to the
    per-row path. Width overflow still raises."""
    import pyarrow as pa
    import pyarrow.compute as pc

    nrows = table.num_rows
    row_length = sum(w for _, w, _ in col_meta)
    rowmat = np.zeros((nrows, row_length), dtype=np.uint8)
    for (coff, cwidth, ctype), (name, _w) in zip(col_meta, spec):
        col = table.column(name)
        if ctype == 1:
            a = col.to_numpy(zero_copy_only=False).astype("<f8")
            rowmat[:, coff : coff + 8] = a.view(np.uint8).reshape(nrows, 8)
            continue
        arr = pc.fill_null(pc.cast(col, pa.string()), "").combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype="<i4")[
            arr.offset : arr.offset + nrows + 1
        ]
        dbuf = arr.buffers()[2]
        data = (
            np.frombuffer(dbuf, dtype=np.uint8)
            if dbuf is not None
            else np.empty(0, np.uint8)
        )
        lens = np.diff(offs)
        if lens.size and int(lens.max()) > cwidth:
            bad = int(np.argmax(lens))
            raise ValueError(
                f"string {arr[bad].as_py()!r} exceeds declared width {cwidth}"
            )
        block = np.full((nrows, cwidth), 0x20, dtype=np.uint8)
        mask = np.arange(cwidth)[None, :] < lens[:, None]
        block[mask] = data[offs[0] : offs[-1]] if nrows else data[:0]
        rowmat[:, coff : coff + cwidth] = block
    return rowmat


def build_header(page_size: int, n_pages: int) -> bytes:
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
    struct.pack_into("<I", hdr, 204 + 4, n_pages)
    return bytes(hdr)


def build_meta_page(
    columns: list[str],
    col_meta: list[tuple[int, int, int]],
    row_length: int,
    nrows: int,
    page_size: int,
) -> bytes:
    """The single META page: subheader pointer array + payloads."""
    ncols = len(columns)

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
    return bytes(meta)


def build_data_page(rowmat_slice: np.ndarray, page_size: int) -> bytes:
    """One DATA page (type 256) holding the given pre-encoded rows."""
    nrows = rowmat_slice.shape[0]
    page = bytearray(page_size)
    struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 0, 256)
    struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 2, nrows)
    struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 4, 0)
    body = rowmat_slice.tobytes()
    start = _PAGE_BIT_OFFSET + 8
    if start + len(body) > page_size:
        raise ValueError("rows exceed page capacity")
    page[start : start + len(body)] = body
    return bytes(page)


def write_sas7bdat(
    path: str,
    columns: list[str],
    arrays: list[np.ndarray],
    page_size: int = 0x10000,
) -> None:
    """Write columns (each float64 or fixed-width bytes/str ndarray) as an
    uncompressed u64 little-endian sas7bdat (driver-side, single pass;
    string widths derived from the data)."""
    if len(columns) != len(arrays):
        raise ValueError("columns/arrays length mismatch")
    nrows = len(arrays[0]) if arrays else 0
    for a in arrays:
        if len(a) != nrows:
            raise ValueError("ragged columns")

    spec: list[tuple[str, int]] = []
    for name, a in zip(columns, arrays):
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(a.dtype, np.integer):
            spec.append((name, 0))
        else:
            width = max(
                (len(str(x).encode("utf-8")) for x in a), default=1
            ) or 1
            spec.append((name, width))
    col_meta, row_length = layout_from_spec(spec)

    rpp = rows_per_page(page_size, row_length)
    n_data_pages = (nrows + rpp - 1) // rpp if nrows else 0
    rowmat = encode_rowmat(list(arrays), col_meta)

    with open(path, "wb") as f:
        f.write(build_header(page_size, 1 + n_data_pages))
        f.write(build_meta_page(columns, col_meta, row_length, nrows, page_size))
        for p in range(n_data_pages):
            lo = p * rpp
            hi = min(nrows, lo + rpp)
            f.write(build_data_page(rowmat[lo:hi], page_size))
