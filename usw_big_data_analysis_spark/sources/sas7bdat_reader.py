"""Page-level pure-Python SAS7BDAT *reader* for the uncompressed u64
subset emitted by ``sas7bdat_lite.write_sas7bdat`` (float64 + fixed-width
string columns, one meta page, pure DATA pages).

Why a reader when pandas already has one: pandas' parser is a whole-file,
driver-side iterator. This module splits the work the way a distributed
connector needs it split — ``read_meta`` parses the 1 KiB header + meta
page once (driver side, tiny), and ``read_page_columns`` decodes ONE data
page positionally, so each Spark task can seek straight to its page and
decode independently (the Python Data Source connector in
``sas_datasource.py`` maps one InputPartition to one page). pandas stays
the independent round-trip verifier in tests; this reader mirrors the
writer's layout (documented in sas7bdat_lite's module docstring, per the
community spec: sas7bdat.pdf vignette / BioStatMatt-sas7bdat).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_HEADER_SIZE_OFF = 200  # u32 header size (u64 files: base 196 + 4)
_PAGE_SIZE_OFF = 204
_PAGE_COUNT_OFF = 208
_PAGE_BIT_OFFSET = 32
_SUBHEADER_PTR_LEN = 24

_SIG_ROWSIZE = b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00"
_SIG_COLSIZE = b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00"
_SIG_COLTEXT = b"\xfd\xff\xff\xff\xff\xff\xff\xff"
_SIG_COLNAME = b"\xff\xff\xff\xff\xff\xff\xff\xff"
_SIG_COLATTR = b"\xfc\xff\xff\xff\xff\xff\xff\xff"

_PAGE_TYPE_DATA = 256


@dataclass(frozen=True)
class SasColumn:
    name: str
    row_offset: int
    width: int
    ctype: int  # 1 = double, 2 = string


@dataclass(frozen=True)
class SasMeta:
    page_size: int
    header_size: int
    n_pages: int  # total pages including the meta page
    row_length: int
    row_count: int
    columns: tuple[SasColumn, ...]

    @property
    def data_page_indices(self) -> range:
        """Physical page numbers (0-based, page 0 is meta) holding rows."""
        return range(1, self.n_pages)


def read_meta(path: str) -> SasMeta:
    """Parse the header + meta page. Driver-side, reads ~2 pages."""
    with open(path, "rb") as f:
        hdr = f.read(1024)
        if hdr[32] != 0x33 or hdr[37] != 0x01:
            raise ValueError("not an uncompressed little-endian u64 sas7bdat")
        header_size = struct.unpack_from("<I", hdr, _HEADER_SIZE_OFF)[0]
        page_size = struct.unpack_from("<I", hdr, _PAGE_SIZE_OFF)[0]
        n_pages = struct.unpack_from("<I", hdr, _PAGE_COUNT_OFF)[0]
        f.seek(header_size)
        meta = f.read(page_size)

    nsub = struct.unpack_from("<H", meta, _PAGE_BIT_OFFSET + 2)[0]
    subs: dict[bytes, list[bytes]] = {}
    for i in range(nsub):
        p = _PAGE_BIT_OFFSET + 8 + _SUBHEADER_PTR_LEN * i
        off, length = struct.unpack_from("<QQ", meta, p)
        payload = bytes(meta[off : off + length])
        subs.setdefault(payload[:8], []).append(payload)

    rs = subs[_SIG_ROWSIZE][0]
    row_length = struct.unpack_from("<Q", rs, 40)[0]
    row_count = struct.unpack_from("<Q", rs, 48)[0]
    ncols_rs = struct.unpack_from("<Q", rs, 72)[0]
    ncols = struct.unpack_from("<Q", subs[_SIG_COLSIZE][0], 8)[0]
    if ncols != ncols_rs:
        raise ValueError(f"column-count mismatch: {ncols} vs {ncols_rs}")

    text = subs[_SIG_COLTEXT][0][8:]  # text block incl. its size prefix
    cn = subs[_SIG_COLNAME][0]
    names: list[str] = []
    for i in range(ncols):
        base = 16 + 8 * i
        _tidx, noff, nlen = struct.unpack_from("<HHH", cn, base)
        names.append(text[noff : noff + nlen].decode("utf-8"))

    ca = subs[_SIG_COLATTR][0]
    cols: list[SasColumn] = []
    for i in range(ncols):
        base = 16 + 16 * i
        roff = struct.unpack_from("<Q", ca, base)[0]
        width = struct.unpack_from("<I", ca, base + 8)[0]
        ctype = ca[base + 14]
        cols.append(SasColumn(names[i], roff, width, ctype))

    return SasMeta(
        page_size=page_size,
        header_size=header_size,
        n_pages=n_pages,
        row_length=row_length,
        row_count=row_count,
        columns=tuple(cols),
    )


def read_page_columns(
    path: str, meta: SasMeta, page_index: int
) -> dict[str, np.ndarray]:
    """Decode one physical page (must be a DATA page) into per-column
    numpy arrays — the unit of work one connector task performs. Seeks
    directly to the page; touches page_size bytes only."""
    with open(path, "rb") as f:
        f.seek(meta.header_size + page_index * meta.page_size)
        page = f.read(meta.page_size)
    ptype = struct.unpack_from("<H", page, _PAGE_BIT_OFFSET)[0]
    if ptype != _PAGE_TYPE_DATA:
        raise ValueError(f"page {page_index} is not a DATA page (type {ptype})")
    nrows = struct.unpack_from("<H", page, _PAGE_BIT_OFFSET + 2)[0]
    body = np.frombuffer(
        page,
        dtype=np.uint8,
        count=nrows * meta.row_length,
        offset=_PAGE_BIT_OFFSET + 8,
    ).reshape(nrows, meta.row_length)
    out: dict[str, np.ndarray] = {}
    for c in meta.columns:
        sl = body[:, c.row_offset : c.row_offset + c.width]
        if c.ctype == 1:
            out[c.name] = np.ascontiguousarray(sl).view("<f8").ravel()
        else:
            flat = np.ascontiguousarray(sl).tobytes()
            out[c.name] = np.asarray(
                [
                    flat[i * c.width : (i + 1) * c.width].rstrip(b" ").decode("utf-8")
                    for i in range(nrows)
                ],
                dtype=object,
            )
    return out


def read_page_range_batch(path: str, meta: SasMeta, start: int, end: int):
    """Decode the contiguous data pages [start, end) into ONE Arrow
    RecordBatch with a single file read and no per-row Python work
    (optimization r07, guide §4.1). Row bodies from every page in the
    range are stacked into one byte matrix; float columns are a view
    reinterpret; string columns strip their trailing-space padding by
    scattering through a column-index < length mask and build the Arrow
    utf-8 array directly from the (offsets, data) buffers — semantics
    identical to the per-row ``rstrip(b' ').decode('utf-8')`` path
    (padding is trailing 0x20 only, which never occurs inside a utf-8
    multibyte sequence)."""
    import pyarrow as pa

    if not (1 <= start < end <= meta.n_pages):
        raise ValueError(f"bad page range [{start}, {end})")
    with open(path, "rb") as f:
        f.seek(meta.header_size + start * meta.page_size)
        blob = np.frombuffer(
            f.read((end - start) * meta.page_size), dtype=np.uint8
        )
    bodies = []
    for p in range(end - start):
        page = blob[p * meta.page_size : (p + 1) * meta.page_size]
        ptype = int(page[_PAGE_BIT_OFFSET]) | (int(page[_PAGE_BIT_OFFSET + 1]) << 8)
        if ptype != _PAGE_TYPE_DATA:
            raise ValueError(
                f"page {start + p} is not a DATA page (type {ptype})"
            )
        nrows = int(page[_PAGE_BIT_OFFSET + 2]) | (
            int(page[_PAGE_BIT_OFFSET + 3]) << 8
        )
        lo = _PAGE_BIT_OFFSET + 8
        bodies.append(
            page[lo : lo + nrows * meta.row_length].reshape(
                nrows, meta.row_length
            )
        )
    body = bodies[0] if len(bodies) == 1 else np.vstack(bodies)
    n = body.shape[0]
    arrays, names = [], []
    for c in meta.columns:
        sl = body[:, c.row_offset : c.row_offset + c.width]
        if c.ctype == 1:
            arrays.append(
                pa.array(np.ascontiguousarray(sl).view("<f8").ravel())
            )
        else:
            sl = np.ascontiguousarray(sl)
            nonspace = sl != 0x20
            first_from_right = np.argmax(nonspace[:, ::-1], axis=1)
            lens = np.where(
                nonspace.any(axis=1), c.width - first_from_right, 0
            ).astype("<i4")
            mask = np.arange(c.width, dtype=np.int32)[None, :] < lens[:, None]
            data = sl[mask]
            offs = np.zeros(n + 1, dtype="<i4")
            np.cumsum(lens, out=offs[1:])
            arrays.append(
                pa.Array.from_buffers(
                    pa.utf8(),
                    n,
                    [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())],
                )
            )
        names.append(c.name)
    return pa.RecordBatch.from_arrays(arrays, names)


def read_frame(path: str) -> dict[str, np.ndarray]:
    """Whole-file convenience (tests): concatenate every data page."""
    meta = read_meta(path)
    parts = [read_page_columns(path, meta, p) for p in meta.data_page_indices]
    return {
        c.name: (
            np.concatenate([p[c.name] for p in parts])
            if parts
            else np.empty(0, dtype="<f8" if c.ctype == 1 else object)
        )
        for c in meta.columns
    }
