"""Ensemble arithmetic over probability columns (SURVEY.md §2.10 E15-E18).

The reference's ensembles (`src/ensemble/weighted.py:13-58`,
`src/ensemble/alternative.py:14-243`, `teamProject/models/ensemble.py:154-208`)
are pure arithmetic over per-model probability columns — fully relational.
Three deterministic pseudo-model probability columns stand in for fitted
models (real models: ``operators/ml_ops.py``; OOF stacking:
``plans/stacking.py``, rows-only checked).

Scale: every ensemble is a per-row projection — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

# three deterministic "model" probability columns from the order key
_P_SQL = """
  SELECT o_orderkey AS id,
         CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS p1,
         CAST((o_orderkey * 40503 + 7) % 1000 AS DOUBLE) / 1000.0 AS p2,
         CAST((o_orderkey * 69069 + 13) % 1000 AS DOUBLE) / 1000.0 AS p3,
         CAST(o_totalprice > 150000.0 AS INT) AS label
  FROM orders
"""


def prob_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def mk(mult: int, add: int) -> F.Column:
        return ((F.col("o_orderkey") * mult + add) % 1000).cast("double") / 1000.0

    return o.select(
        F.col("o_orderkey").alias("id"),
        mk(2654435761, 0).alias("p1"),
        mk(40503, 7).alias("p2"),
        mk(69069, 13).alias("p3"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("label"),
    )


# --- E15: score²-weighted soft vote (src/ensemble/weighted.py:13-58) --------
# weights ∝ score_i²; scores fixed (the reference reads them from its
# results log — best_model_select provides that upstream).
_W = (0.81, 0.64, 0.49)  # scores 0.9, 0.8, 0.7 squared
_WSUM = sum(_W)


@query(
    "ensemble_weighted",
    oracle=f"""
    SELECT id,
           round(({_W[0]} * p1 + {_W[1]} * p2 + {_W[2]} * p3) / {_WSUM}, 6) AS p_ens,
           CAST(({_W[0]} * p1 + {_W[1]} * p2 + {_W[2]} * p3) / {_WSUM} >= 0.5 AS INT) AS pred
    FROM ({_P_SQL})
    """,
)
def ensemble_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = prob_frame(spark, sf_dir)
    w = (
        _W[0] * F.col("p1") + _W[1] * F.col("p2") + _W[2] * F.col("p3")
    ) / _WSUM
    return p.select(
        "id",
        N.fround(w, 6).alias("p_ens"),
        (w >= 0.5).cast("int").alias("pred"),
    )


# --- E16: alternative blends (src/ensemble/alternative.py:14-243) -----------
@query(
    "ensemble_variants",
    oracle=f"""
    WITH p AS ({_P_SQL}),
    c AS (
      SELECT id,
             greatest(least(p1, 1.0 - 1e-10), 1e-10) AS q1,
             greatest(least(p2, 1.0 - 1e-10), 1e-10) AS q2,
             greatest(least(p3, 1.0 - 1e-10), 1e-10) AS q3
      FROM p
    )
    SELECT id,
           round((q1 + q2 + q3) / 3.0, 6) AS p_mean,
           round(exp((round(ln(q1), 8) + round(ln(q2), 8) + round(ln(q3), 8)) / 3.0), 6) AS p_geom,
           round(3.0 / (1.0 / q1 + 1.0 / q2 + 1.0 / q3), 6) AS p_harm,
           round(q1 + q2 + q3 - least(q1, q2, q3) - greatest(q1, q2, q3), 6) AS p_median,
           round((pow(q1, 2) + pow(q2, 2) + pow(q3, 2))
                 / nullif(q1 + q2 + q3, 0.0), 6) AS p_pow_weighted
    FROM c
    """,
)
def ensemble_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simple / geometric / harmonic / median / power-self-weighted blends,
    with the reference's 1e-10 probability clipping. 3-way median = sum −
    min − max (closed form, no sort)."""
    p = prob_frame(spark, sf_dir)
    qs = [
        F.greatest(F.least(F.col(c), F.lit(1.0 - 1e-10)), F.lit(1e-10)).alias(f"q{i}")
        for i, c in enumerate(("p1", "p2", "p3"), 1)
    ]
    c = p.select("id", *qs)
    q1, q2, q3 = F.col("q1"), F.col("q2"), F.col("q3")
    geom = F.exp(
        (N.fround(F.log(q1), 8) + N.fround(F.log(q2), 8) + N.fround(F.log(q3), 8)) / 3.0
    )
    return c.select(
        "id",
        N.fround((q1 + q2 + q3) / 3.0, 6).alias("p_mean"),
        N.fround(geom, 6).alias("p_geom"),
        N.fround(3.0 / (1.0 / q1 + 1.0 / q2 + 1.0 / q3), 6).alias("p_harm"),
        N.fround(q1 + q2 + q3 - F.least(q1, q2, q3) - F.greatest(q1, q2, q3), 6).alias(
            "p_median"
        ),
        N.fround(
            (F.pow(q1, F.lit(2)) + F.pow(q2, F.lit(2)) + F.pow(q3, F.lit(2)))
            / F.nullif(q1 + q2 + q3, F.lit(0.0)),
            6,
        ).alias("p_pow_weighted"),
    )


# --- E18: soft/hard voting (teamProject/models/ensemble.py:154-208) ---------
@query(
    "ensemble_voting",
    oracle=f"""
    WITH p AS ({_P_SQL}),
    v AS (
      SELECT id, label,
             (p1 + p2 + p3) / 3.0 AS p_soft,
             CAST(p1 >= 0.5 AS INT) + CAST(p2 >= 0.5 AS INT)
               + CAST(p3 >= 0.5 AS INT) AS votes
      FROM p
    )
    SELECT CAST(p_soft >= 0.5 AS INT) AS soft_pred,
           CAST(votes >= 2 AS INT) AS hard_pred,
           count(*) AS n,
           CAST(sum(CAST(CAST(p_soft >= 0.5 AS INT) = label AS BIGINT)) AS BIGINT) AS soft_correct,
           CAST(sum(CAST(CAST(votes >= 2 AS INT) = label AS BIGINT)) AS BIGINT) AS hard_correct
    FROM v GROUP BY 1, 2
    """,
)
def ensemble_voting(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = prob_frame(spark, sf_dir)
    p_soft = (F.col("p1") + F.col("p2") + F.col("p3")) / 3.0
    votes = sum(
        (F.col(c) >= 0.5).cast("int") for c in ("p1", "p2", "p3")
    )
    v = p.select(
        "id",
        "label",
        (p_soft >= 0.5).cast("int").alias("soft_pred"),
        (votes >= 2).cast("int").alias("hard_pred"),
    )
    return v.groupBy("soft_pred", "hard_pred").agg(
        F.count("*").alias("n"),
        F.sum((F.col("soft_pred") == F.col("label")).cast("bigint")).alias(
            "soft_correct"
        ),
        F.sum((F.col("hard_pred") == F.col("label")).cast("bigint")).alias(
            "hard_correct"
        ),
    )
