"""Semantic laws for the privacy/governance family — properties the
oracle-parity hash can't express:

- QI-subset monotonicity: adding a quasi-identifier column never merges
  equivalence classes, so the unique-row share is monotone along every
  chain of the subset lattice.
- k-anonymity conservation: bucket rows partition the table exactly.
- Generalization monotonicity: coarsening the band width never splits a
  class (min_k non-decreasing, n_classes non-increasing).
- DP release: determinism across runs (a retried task must not re-roll
  its noise) and the clamp contract.
"""

from __future__ import annotations

import pytest

from usw_big_data_analysis_spark.queries.privacy_ops import (
    privacy_dp_count_release,
    privacy_generalization_ladder,
    privacy_k_anonymity,
    privacy_qi_uniqueness,
)
from usw_big_data_analysis_spark.sources import load_table

# Every edge in the QI subset lattice (subset -> superset, one column added).
_CHAINS = [
    ("nation", "nation+segment"),
    ("nation", "nation+bal_band"),
    ("segment", "nation+segment"),
    ("segment", "segment+bal_band"),
    ("bal_band", "nation+bal_band"),
    ("bal_band", "segment+bal_band"),
    ("nation+segment", "nation+segment+bal_band"),
    ("nation+bal_band", "nation+segment+bal_band"),
    ("segment+bal_band", "nation+segment+bal_band"),
    ("(none)", "nation"),
    ("(none)", "segment"),
    ("(none)", "bal_band"),
]


@pytest.fixture(scope="module")
def uniq(spark, sf_dir):
    rows = privacy_qi_uniqueness(spark, sf_dir).collect()
    return {r["qi_set"]: r for r in rows}


def test_uniqueness_lattice_complete(uniq):
    assert len(uniq) == 8  # 2^3 subsets, global included


def test_uniqueness_monotone_along_lattice(uniq):
    for sub, sup in _CHAINS:
        assert uniq[sub]["n_unique_rows"] <= uniq[sup]["n_unique_rows"], (
            sub,
            sup,
        )
        assert uniq[sub]["n_classes"] <= uniq[sup]["n_classes"]


def test_k_anonymity_partitions_table(spark, sf_dir):
    rows = privacy_k_anonymity(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_rows"] for r in rows) == total
    assert abs(sum(r["row_share"] for r in rows) - 1.0) < 1e-4


def test_generalization_monotone(spark, sf_dir):
    rows = {
        r["gran"]: r for r in privacy_generalization_ladder(spark, sf_dir).collect()
    }
    assert set(rows) == {1000, 2000, 5000}
    assert rows[1000]["min_k"] <= rows[2000]["min_k"] <= rows[5000]["min_k"]
    assert (
        rows[1000]["n_classes"]
        >= rows[2000]["n_classes"]
        >= rows[5000]["n_classes"]
    )


def test_dp_release_deterministic_and_clamped(spark, sf_dir):
    a = sorted(map(tuple, privacy_dp_count_release(spark, sf_dir).collect()))
    b = sorted(map(tuple, privacy_dp_count_release(spark, sf_dir).collect()))
    assert a == b  # key-seeded noise: no RNG state anywhere
    for _, n_true, noise, n_released in a:
        assert n_released >= 0
        # released = clamp(round(true + noise)): reconstruct exactly
        expected = max(0, int(round(n_true + noise)))
        # round() in python is half-to-even; adjust for exact .5 halfway
        frac = abs(n_true + noise) % 1.0
        if abs(frac - 0.5) < 1e-12:
            expected = max(0, int(n_true + noise) + (1 if n_true + noise > 0 else -1))
        assert n_released == expected, (n_true, noise, n_released)
