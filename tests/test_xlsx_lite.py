"""Format-level tests for the pure-stdlib xlsx codec (sources/xlsx_lite.py):
the zip must be a structurally valid ECMA-376 package and the value round
trip must be lossless for the types the metadata-sheet queries use."""

import zipfile

import numpy as np

from usw_big_data_analysis_spark.sources.xlsx_lite import (
    _col_letter,
    read_xlsx,
    write_xlsx,
)


def test_package_structure(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["a"], [[1]])
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
    assert {
        "[Content_Types].xml",
        "_rels/.rels",
        "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels",
        "xl/worksheets/sheet1.xml",
    } <= names


def test_roundtrip_types(tmp_path):
    p = str(tmp_path / "t.xlsx")
    cols = ["id", "name", "score", "flag", "note"]
    rows = [
        [1, "alpha", 1.5, True, None],
        [2, "with <xml> & \"quotes\"", -0.25, False, "ok"],
        [3, "유니코드 텍스트", 2.0, True, "x y"],
    ]
    write_xlsx(p, cols, rows)
    header, back = read_xlsx(p)
    assert header == cols
    assert back[0] == [1, "alpha", 1.5, True, None]
    assert back[1][1] == 'with <xml> & "quotes"'
    assert back[1][2] == -0.25
    assert back[2][1] == "유니코드 텍스트"
    # integral floats come back as ints (2.0 -> 2): fine for dim keys
    assert back[2][2] == 2


def test_numpy_scalars(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["k", "v"], [[np.int64(7), np.float64(0.125)]])
    _, back = read_xlsx(p)
    assert back == [[7, 0.125]]


def test_column_letters():
    assert _col_letter(0) == "A"
    assert _col_letter(25) == "Z"
    assert _col_letter(26) == "AA"
    assert _col_letter(27 * 26 - 1) == "ZZ"


def test_shared_strings_reader(tmp_path):
    """Files written by Excel/openpyxl use a sharedStrings table — the
    reader must resolve t=\"s\" cells through it."""
    p = str(tmp_path / "s.xlsx")
    write_xlsx(p, ["a"], [[1]])  # start from a valid package
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<?xml version="1.0"?><sst xmlns="{ns}" count="2" uniqueCount="2">'
        "<si><t>hello</t></si><si><r><t>wor</t></r><r><t>ld</t></r></si></sst>"
    )
    import shutil

    p2 = str(tmp_path / "s2.xlsx")
    with zipfile.ZipFile(p) as zin, zipfile.ZipFile(p2, "w") as zout:
        for name in zin.namelist():
            if name == "xl/worksheets/sheet1.xml":
                zout.writestr(name, sheet)
            else:
                zout.writestr(name, zin.read(name))
        zout.writestr("xl/sharedStrings.xml", shared)
    header, rows = read_xlsx(p2)
    assert header == ["hello"]
    assert rows == [["world"]]
