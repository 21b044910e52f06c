"""Round-trip tests for the vendored SAS7BDAT writer: pandas' built-in
sas7bdat parser is the independent verifier (separate implementation of the
same public spec), so these are format-level assertions, not self-checks."""

import numpy as np
import pandas as pd
import pytest

from usw_big_data_analysis_spark.sources.sas7bdat_lite import write_sas7bdat


def test_roundtrip_mixed_types(tmp_path):
    p = str(tmp_path / "t.sas7bdat")
    qty = np.array([1.5, -2.25, np.nan, 1e300, 0.1])
    tag = np.array(["a", "bb", ".", "dddd", "é-utf8"], dtype=object)
    write_sas7bdat(p, ["qty", "tag"], [qty, tag])
    df = pd.read_sas(p, encoding="utf-8")
    assert list(df.columns) == ["qty", "tag"]
    got = df["qty"].to_numpy()
    assert np.isnan(got[2]) and np.isnan(qty[2])
    # bit-exact doubles (IEEE bytes pass through untouched)
    assert np.array_equal(
        got[[0, 1, 3, 4]].view(np.uint64), qty[[0, 1, 3, 4]].view(np.uint64)
    )
    assert list(df["tag"]) == list(tag)


def test_multi_page(tmp_path):
    """More rows than fit one page: block counts and page boundaries."""
    p = str(tmp_path / "big.sas7bdat")
    n = 50_000
    x = np.arange(n, dtype=np.float64) * 0.5
    s = np.array([f"r{i % 97}" for i in range(n)], dtype=object)
    write_sas7bdat(p, ["x", "s"], [x, s], page_size=4096)
    df = pd.read_sas(p, encoding="utf-8")
    assert len(df) == n
    assert np.array_equal(df["x"].to_numpy(), x)
    assert (df["s"].to_numpy() == s).all()


def test_integer_column_becomes_double(tmp_path):
    p = str(tmp_path / "i.sas7bdat")
    write_sas7bdat(p, ["k"], [np.array([1, 2, 3], dtype=np.int64)])
    df = pd.read_sas(p)
    assert df["k"].dtype == np.float64  # SAS numerics are doubles
    assert list(df["k"]) == [1.0, 2.0, 3.0]


def test_rejects_ragged_and_empty(tmp_path):
    p = str(tmp_path / "bad.sas7bdat")
    with pytest.raises(ValueError):
        write_sas7bdat(p, ["a", "b"], [np.array([1.0]), np.array([1.0, 2.0])])
    with pytest.raises(ValueError):
        write_sas7bdat(p, [], [])


def test_magic_and_u64_markers(tmp_path):
    p = str(tmp_path / "m.sas7bdat")
    write_sas7bdat(p, ["x"], [np.array([1.0])])
    raw = open(p, "rb").read()
    import pandas.io.sas.sas_constants as C

    assert raw[: len(C.magic)] == C.magic
    assert raw[32:33] == C.u64_byte_checker_value
    assert raw[37] == 1  # little-endian
