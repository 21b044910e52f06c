"""Property-based round-trip tests for the vendored format codecs
(PPM/BMP image, WAV audio, XLSX sheet, SAS7BDAT dataset): any well-typed
input must survive encode->decode bit-exactly. Hypothesis drives the shapes
and values; the SAS case is verified through pandas' independent parser."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from usw_big_data_analysis_spark.operators import audio_codec as AC
from usw_big_data_analysis_spark.operators import image_codec as IC


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_bmp_roundtrip_any_shape(h, w, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert np.array_equal(IC.decode_ppm(IC.encode_ppm(arr)), arr)
    assert np.array_equal(IC.decode_bmp(IC.encode_bmp(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_shape(n, ch, rate, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    out, r = AC.decode_wav(AC.encode_wav(s, sample_rate=rate))
    assert r == rate
    assert np.array_equal(out, s)


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**31), 2**31 - 1),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
                ),
                max_size=20,
            ),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_xlsx_roundtrip_any_values(tmp_path_factory, rows):
    from usw_big_data_analysis_spark.sources.xlsx_lite import read_xlsx, write_xlsx

    p = str(tmp_path_factory.mktemp("xl") / "t.xlsx")
    write_xlsx(p, ["i", "s", "f"], [list(r) for r in rows])
    header, back = read_xlsx(p)
    assert header == ["i", "s", "f"]
    for (i, s, f), got in zip(rows, back):
        assert got[0] == i
        assert got[1] == s  # inline strings are lossless, empty included
        gf = got[2]
        # integral floats intentionally come back as ints
        assert float(gf) == f or (f == 0 and gf == 0)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 500),
    seed=st.integers(0, 2**31 - 1),
)
def test_sas7bdat_roundtrip_any_length(tmp_path_factory, n, seed):
    from usw_big_data_analysis_spark.sources.sas7bdat_lite import write_sas7bdat

    rng = np.random.RandomState(seed)
    x = rng.randn(n)
    x[rng.rand(n) < 0.1] = np.nan
    s = np.array([f"v{int(v)}" for v in rng.randint(0, 1000, n)], dtype=object)
    p = str(tmp_path_factory.mktemp("sas") / "t.sas7bdat")
    write_sas7bdat(p, ["x", "s"], [x, s], page_size=4096)
    df = pd.read_sas(p, encoding="utf-8")
    assert len(df) == n
    got = df["x"].to_numpy()
    mask = np.isnan(x)
    assert np.array_equal(np.isnan(got), mask)
    assert np.array_equal(
        got[~mask].view(np.uint64), x[~mask].view(np.uint64)
    )  # bit-exact doubles
    assert (df["s"].to_numpy() == s).all()
