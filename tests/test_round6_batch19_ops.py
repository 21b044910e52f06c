"""Goldens for the nineteenth round-6 batch: scan_fixed_width (offset-parse
round trip vs pandas) and sink_csv_gzip (compressed round trip + the .gz
artifact itself)."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd


def test_fixed_width_roundtrip_matches_pandas(spark, sf_dir):
    from usw_big_data_analysis_spark.queries.sources_extra import (
        scan_fixed_width,
    )

    rows = {r["custmod"]: r for r in scan_fixed_width(spark, sf_dir).collect()}
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    want = (
        pd.DataFrame({"m": od["o_custkey"] % 10, "c": cents})
        .groupby("m")["c"]
        .agg(["size", "sum"])
    )
    assert set(rows) == set(want.index)
    for m, w in want.iterrows():
        assert rows[m]["n"] == w["size"]
        assert rows[m]["sum_cents"] == w["sum"]


def test_csv_gzip_writes_gz_parts_and_roundtrips(spark, sf_dir):
    from usw_big_data_analysis_spark.queries._shared import process_tmp
    from usw_big_data_analysis_spark.queries.sources_extra import sink_csv_gzip

    rows = {r["lang"]: r for r in sink_csv_gzip(spark, sf_dir).collect()}
    # compression really happened: every part carries the .gz suffix
    parts = glob.glob(process_tmp() + "/usw_q_csv_gzip/part*")
    assert parts and all(p.endswith(".csv.gz") for p in parts)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = docs.groupby("lang")["n_chars"].agg(["size", "sum"])
    assert set(rows) == set(want.index)
    for lang, w in want.iterrows():
        assert rows[lang]["n_docs"] == w["size"]
        assert rows[lang]["sum_chars"] == w["sum"]
