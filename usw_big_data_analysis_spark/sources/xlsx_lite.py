"""Minimal pure-stdlib XLSX writer/reader (zipfile + ElementTree).

The reference ingests/writes metadata sheets with pandas+openpyxl
(0.meta_data_check.ipynb cell 1; 1-1.data_processing.ipynb:2571). This
container has no openpyxl, but XLSX is just a ZIP of SpreadsheetML XML —
a public ECMA-376 format — so the format-level round trip is implemented
here directly:

- writer: [Content_Types].xml + _rels/.rels + xl/workbook.xml +
  xl/_rels/workbook.xml.rels + xl/worksheets/sheet1.xml, with strings as
  inline strings (``t="inlineStr"``, no sharedStrings table) and numbers
  as plain ``<v>`` — the subset every spreadsheet tool reads.
- reader: namespace-tolerant ElementTree walk of sheet1.xml supporting
  inline strings, shared strings (so openpyxl/Excel-written files load
  too), and numeric cells; A1-style references map cells to columns.

Scale note: XLSX is a driver-side small-dimension format (metadata sheets,
summary exports) — never a distributed source/sink. Big data lands as
parquet; these sheets are broadcast dims or collected summaries.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Any
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="{_REL_NS}/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="{_REL_NS}/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _cell_xml(ref: str, value: Any) -> str:
    if value is None:
        return ""
    if hasattr(value, "item"):  # numpy scalar from pandas .values
        value = value.item()
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
        # SpreadsheetML numeric cells cannot represent NaN/Inf — repr text
        # would produce cells other readers reject. Store as an explicit
        # string cell instead (Excel itself has no NaN number either).
        return (
            f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{escape(str(value))}</t></is></c>'
        )
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_xlsx(path: str, columns: list[str], rows: list[list[Any]]) -> None:
    """Write a single-sheet xlsx: header row of column names, then data."""
    body = []
    all_rows = [list(columns)] + [list(r) for r in rows]
    for ri, row in enumerate(all_rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _ref_to_col(ref: str) -> int:
    m = _REF_RE.match(ref)
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _parse_number(text: str) -> int | float:
    # Digit-only text parses as int directly — round-tripping through
    # float(text) would corrupt integers above 2^53 (write_xlsx emits ints
    # via repr, so they land here as pure digit strings).
    stripped = text.lstrip("-")
    if stripped.isdigit():
        return int(text)
    f = float(text)
    return int(f) if f.is_integer() and "e" not in text.lower() and "." not in text else f


def read_xlsx(path: str) -> tuple[list[str], list[list[Any]]]:
    """Read sheet1 back as (header, rows). Handles inline strings, shared
    strings (files written by Excel/openpyxl), booleans, and numbers."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))

    rows_out: dict[int, dict[int, Any]] = {}
    max_col = -1
    for row in root.iter(f"{{{_NS}}}row"):
        ri = int(row.get("r"))
        for c in row.findall(f"{{{_NS}}}c"):
            ci = _ref_to_col(c.get("r"))
            max_col = max(max_col, ci)
            t = c.get("t", "n")
            if t == "inlineStr":
                val: Any = "".join(
                    tt.text or "" for tt in c.iter(f"{{{_NS}}}t")
                )
            else:
                v = c.find(f"{{{_NS}}}v")
                if v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = bool(int(v.text))
                elif t == "str":
                    val = v.text
                else:
                    val = _parse_number(v.text)
            rows_out.setdefault(ri, {})[ci] = val

    if not rows_out:
        return [], []
    ordered = [rows_out[k] for k in sorted(rows_out)]
    width = max_col + 1
    grid = [[r.get(i) for i in range(width)] for r in ordered]
    header = [str(v) for v in grid[0]]
    return header, grid[1:]
