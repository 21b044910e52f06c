"""Preference / arena analytics — the pairwise-comparison layer of an
RLHF-style training-data pipeline: pairwise win-rate matrices with exact
Wilson intervals, Bradley-Terry strength fitting (Zermelo/Hunter MM
iterations), and the comparison-graph connectivity audit that decides
whether the strengths are even identifiable.

Extends the engine's model-comparison family (queries/model_compare.py —
the reference compares classifier families pairwise with Wilcoxon /
Friedman-Nemenyi over CV folds, teamProject/models.ipynb) from rank tests
to the *strength-fitting* side used by arena-style LLM evaluation and
reward-model data curation. preference_pairs_cluster (queries/dedup.py)
mines the (chosen, rejected) pairs; this module is the analytics that sits
on top of any such pairwise table.

Fixture mapping: "players" are the 25 part brands; one "match" per order
between its two highest-spend brands (exact cents totals; rank ties to
the lexicographically smaller brand — fully deterministic, no RNG), won
by the larger basket. Every key aggregates the raw facts to the
pair-count matrix FIRST (one groupBy(order, brand) shuffle + an
order-partitioned top-2 window + one groupBy(i,j)), so downstream math
runs on a frame bounded by
|players|^2 — independent of fact-table scale. That is exactly the 100 TB
shape: the MM iterations, the Wilson intervals, and the connected-
components pass never touch more than the bounded matrix.

Cross-engine exactness: every iterate is quantized (terms to 1e-6,
strengths to 1e-9) and summed as integers, so both engines walk
bit-identical trajectories regardless of aggregation order — the same
convention as linreg_huber_irls (stats_tests.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_BT_ROUNDS = 8
_Z = "1.959964"  # 95% normal quantile, same constant as proportion_wilson_ci

# --- shared ANSI fragments (valid in both Spark SQL and DuckDB) -------------
# One match per order between its two highest-spend brands, won by the
# larger basket (per-brand spend as exact cents bigints; rank ties break to
# the lexicographically smaller brand, so rank 1 always wins). Defined over
# (order, brand) AGGREGATES — robust to the fixture's non-unique
# l_linenumber and to any line-level reordering.
_MATCH_CTE = """
  ob AS (
    SELECT l_orderkey, p_brand,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey, p_brand
  ),
  rk AS (
    SELECT l_orderkey, p_brand, cents,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY cents DESC, p_brand) AS rn
    FROM ob
  ),
  pairs0 AS (
    SELECT l_orderkey,
           max(CASE WHEN rn = 1 THEN p_brand END) AS b1,
           max(CASE WHEN rn = 2 THEN p_brand END) AS b2
    FROM rk WHERE rn <= 2 GROUP BY l_orderkey
  ),
  m AS (
    SELECT least(b1, b2) AS i, greatest(b1, b2) AS j, b1 AS winner
    FROM pairs0
    WHERE b2 IS NOT NULL
  ),
  mat AS (
    SELECT i, j, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(winner = i AS INT)) AS BIGINT) AS w
    FROM m GROUP BY i, j
  )
"""


def _matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, n, w) pair-count matrix, i < j, w = wins of i — the DataFrame
    twin of the `mat` CTE. One fact shuffle (groupBy order×brand, map-side
    combined), a window PARTITIONED by order (never global), then a
    map-side-combinable groupBy on the bounded (i, j) domain. The cents
    sums use the floor(+0.5) iscaled form (numeric.py) so the per-row
    rounding stays primitive in codegen; the oracle keeps DuckDB's
    vectorized round() — the documented cross-engine pair."""
    from pyspark.sql import Window

    from ..functions import numeric as N

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey", "p_brand")
        .agg(
            F.expr(
                f"sum({N.spark_iscaled('l_extendedprice', 2)}) AS cents"
            )
        )
    )
    wrk = Window.partitionBy("l_orderkey").orderBy(
        F.desc("cents"), F.asc("p_brand")
    )
    rk = ob.withColumn("rn", F.row_number().over(wrk)).filter("rn <= 2")
    pairs0 = rk.groupBy("l_orderkey").agg(
        F.expr("max(CASE WHEN rn = 1 THEN p_brand END) AS b1"),
        F.expr("max(CASE WHEN rn = 2 THEN p_brand END) AS b2"),
    )
    matches = pairs0.filter("b2 IS NOT NULL").selectExpr(
        "least(b1, b2) AS i", "greatest(b1, b2) AS j", "b1 AS winner"
    )
    return matches.groupBy("i", "j").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("CAST(sum(CAST(winner = i AS INT)) AS BIGINT) AS w"),
    )


def _wilson(x: str, n: str, d: str) -> str:
    """Wilson 95% CI bound (d = '-' lower / '+' upper) — the shared text
    form from proportion_wilson_ci, on exact counts cast to double."""
    p = f"(CAST({x} AS DOUBLE) / CAST({n} AS DOUBLE))"
    nn = f"CAST({n} AS DOUBLE)"
    z2 = f"({_Z} * {_Z})"
    return (
        f"round(({p} + {z2} / (2.0 * {nn}) {d} {_Z} * "
        f"sqrt({p} * (1.0 - {p}) / {nn} + {z2} / (4.0 * {nn} * {nn})))"
        f" / (1.0 + {z2} / {nn}), 6)"
    )


# --- pairwise win-rate matrix with Wilson intervals --------------------------
@query(
    "preference_winrate_matrix",
    oracle=f"""
    WITH {_MATCH_CTE}
    SELECT i, j, n AS n_matches, w AS wins_i,
           round(CAST(w AS DOUBLE) / CAST(n AS DOUBLE), 6) AS winrate_i,
           {_wilson('w', 'n', '-')} AS ci_lo,
           {_wilson('w', 'n', '+')} AS ci_hi
    FROM mat
    """,
)
def preference_winrate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arena-style pairwise win-rate matrix: for every observed player pair
    the match count, wins, win rate, and the Wilson 95% interval that
    stays honest at small cell counts (the per-cell sample sizes of a
    pairwise eval are always tiny relative to the corpus). All heavy
    lifting is the two bounded aggregations in _matrix; the interval is a
    shared double expression over exact counts — identical text both
    engines, rounded 6dp."""
    return _matrix(spark, sf_dir).selectExpr(
        "i",
        "j",
        "n AS n_matches",
        "w AS wins_i",
        "round(CAST(w AS DOUBLE) / CAST(n AS DOUBLE), 6) AS winrate_i",
        f"{_wilson('w', 'n', '-')} AS ci_lo",
        f"{_wilson('w', 'n', '+')} AS ci_hi",
    )


# --- Bradley-Terry strengths via quantized MM (Zermelo) iterations -----------
def _bt_oracle() -> str:
    ctes = [
        _MATCH_CTE.strip(),
        """sym AS (
    SELECT i AS p, j AS o, n, w AS wp FROM mat
    UNION ALL SELECT j, i, n, n - w FROM mat
  )""",
        """wt AS (
    SELECT p, CAST(sum(wp) AS BIGINT) AS wtot, CAST(sum(n) AS BIGINT) AS mtot
    FROM sym GROUP BY p
  )""",
        "s0 AS (SELECT p, CAST(1.0 AS DOUBLE) AS s FROM wt)",
    ]
    for k in range(1, _BT_ROUNDS + 1):
        ctes += [
            f"""t{k} AS (
    SELECT y.p,
           CAST(round((CAST(y.n AS DOUBLE) / (sp.s + so.s)) * 1000000)
                AS BIGINT) AS t6
    FROM sym y JOIN s{k - 1} sp ON y.p = sp.p JOIN s{k - 1} so ON y.o = so.p
  )""",
            f"d{k} AS (SELECT p, sum(t6) AS st6 FROM t{k} GROUP BY p)",
            f"""r{k} AS (
    SELECT d.p,
           round(CAST(w.wtot AS DOUBLE)
                 / (CAST(d.st6 AS DOUBLE) / CAST(1000000 AS DOUBLE)), 9) AS s
    FROM d{k} d JOIN wt w ON d.p = w.p
  )""",
            f"""n{k} AS (
    SELECT sum(CAST(round(s * 1000000000) AS BIGINT)) AS t9,
           CAST(count(*) AS BIGINT) AS np
    FROM r{k}
  )""",
            f"""s{k} AS (
    SELECT p, round(s * CAST(np AS DOUBLE)
                    / (CAST(t9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)), 9) AS s
    FROM r{k}, n{k}
  )""",
        ]
    sql = (
        "WITH " + ",\n  ".join(ctes) + f"""
    SELECT w.p AS player, w.wtot AS wins, w.mtot AS matches,
           round(s.s, 6) AS strength,
           CAST(row_number() OVER (ORDER BY s.s DESC, w.p) AS BIGINT) AS bt_rank
    FROM s{_BT_ROUNDS} s JOIN wt w ON s.p = w.p
    """
    )
    # DuckDB inlines plain CTEs; with s{k-1} referenced twice per round the
    # upstream would be duplicated 2^rounds times (measured: fd exhaustion
    # from the exponential scan fan-out). MATERIALIZED pins each CTE to one
    # evaluation — only at CTE definitions, never inside an expression
    # (column aliases carry no "AS (").
    return sql.replace(" AS (", " AS MATERIALIZED (")


@query("preference_bradley_terry", oracle=_bt_oracle())
def preference_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths by {r} minorization-maximization rounds
    (Zermelo 1929 / Hunter 2004: s_i <- W_i / sum_j n_ij/(s_i+s_j), then
    normalized to mean 1) — the model behind arena-style LLM leaderboards
    and reward-model strength calibration.

    Scale shape: the facts collapse to the |players|^2-bounded pair matrix
    before any iteration, so each MM round is a join + groupBy on a frame
    whose size is set by the player DOMAIN, not the corpus; rounds are
    localCheckpointed (tiny eager jobs) so the lineage stays flat.
    Exactness: per-pair terms quantized to 1e-6 and summed as bigints
    (order-free), strengths re-rounded to 1e-9 each round — both engines
    walk the identical trajectory, so the 6dp strengths and the rank are
    bit-equal.""".format(r=_BT_ROUNDS)
    mat = _matrix(spark, sf_dir)
    sym = mat.selectExpr("i AS p", "j AS o", "n", "w AS wp").unionByName(
        mat.selectExpr("j AS p", "i AS o", "n", "n - w AS wp")
    ).localCheckpoint()
    wt = sym.groupBy("p").agg(
        F.expr("CAST(sum(wp) AS BIGINT) AS wtot"),
        F.expr("CAST(sum(n) AS BIGINT) AS mtot"),
    ).localCheckpoint()

    s = wt.selectExpr("p", "CAST(1.0 AS DOUBLE) AS s")
    for _ in range(_BT_ROUNDS):
        sp = s.selectExpr("p AS __p", "s AS sp")
        so = s.selectExpr("p AS __o", "s AS so")
        t = (
            sym.join(sp, sym.p == sp.__p)
            .join(so, sym.o == so.__o)
            .selectExpr(
                "p",
                "CAST(round((CAST(n AS DOUBLE) / (sp + so)) * 1000000)"
                " AS BIGINT) AS t6",
            )
        )
        d = t.groupBy("p").agg(F.expr("sum(t6) AS st6"))
        r = d.join(wt, "p").selectExpr(
            "p",
            "round(CAST(wtot AS DOUBLE)"
            " / (CAST(st6 AS DOUBLE) / CAST(1000000 AS DOUBLE)), 9) AS s",
        )
        tot = r.agg(
            F.expr("sum(CAST(round(s * 1000000000) AS BIGINT)) AS t9"),
            F.expr("CAST(count(*) AS BIGINT) AS np"),
        )
        s = r.crossJoin(F.broadcast(tot)).selectExpr(
            "p",
            "round(s * CAST(np AS DOUBLE)"
            " / (CAST(t9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)), 9) AS s",
        ).localCheckpoint()

    from ..operators.bounded_seq import ordered_row_numbers

    # global rank over the bounded player table — triangular-join form
    # (bounded_seq convention: no unpartitioned WindowExec, ever); (s, p)
    # is a total order because p is unique
    ranked = ordered_row_numbers(
        s.join(wt, "p"), [("s", False), ("p", True)], out="bt_rank"
    )
    return ranked.selectExpr(
        "p AS player", "wtot AS wins", "mtot AS matches",
        "round(s, 6) AS strength", "CAST(bt_rank AS BIGINT) AS bt_rank",
    )


# --- comparison-graph connectivity audit -------------------------------------
@query(
    "preference_graph_connectivity",
    oracle=f"""
    WITH RECURSIVE {_MATCH_CTE},
    edges AS (
      SELECT i AS a, j AS b FROM mat
      UNION SELECT j, i FROM mat
    ),
    walk(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, wk.label FROM walk wk JOIN edges e ON wk.node = e.a
      WHERE wk.label < e.b
    ),
    comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node),
    csz AS (SELECT component, count(*) AS sz FROM comp GROUP BY component),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(n) AS BIGINT) AS n_matches
      FROM mat
    ),
    pl AS (SELECT CAST(count(*) AS BIGINT) AS n_players FROM comp),
    cs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_components,
             CAST(max(sz) AS BIGINT) AS largest_component
      FROM csz
    )
    SELECT pl.n_players, base.n_pairs, base.n_matches,
           round(CAST(base.n_pairs AS DOUBLE)
                 / (CAST(pl.n_players AS DOUBLE)
                    * CAST(pl.n_players - 1 AS DOUBLE) / CAST(2 AS DOUBLE)),
                 6) AS pair_coverage,
           cs.n_components, cs.largest_component
    FROM pl, base, cs
    """,
)
def preference_graph_connectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifiability audit for pairwise-preference data: Bradley-Terry
    strengths are only jointly identifiable on a CONNECTED comparison
    graph (Ford 1957's condition), so a preference pipeline must check
    component structure before fitting. One row: player count, observed
    pair count and coverage of the possible pairs, total matches, number
    of connected components, and the largest component's size.

    Plan: the component pass (operators/graph_ops.connected_components —
    pointer-jumping min-label propagation) runs on the bounded pair
    matrix, never the facts; the three stat frames are one-row broadcast
    crossJoins."""
    from ..operators.graph_ops import connected_components

    mat = _matrix(spark, sf_dir).localCheckpoint()
    cc = connected_components(mat.select("i", "j"), "i", "j", edges_unique=True)
    pl_cs = cc.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_players"),
        F.expr("CAST(count(DISTINCT component) AS BIGINT) AS n_components"),
    )
    largest = (
        cc.groupBy("component")
        .agg(F.expr("count(*) AS sz"))
        .agg(F.expr("CAST(max(sz) AS BIGINT) AS largest_component"))
    )
    base = mat.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_pairs"),
        F.expr("CAST(sum(n) AS BIGINT) AS n_matches"),
    )
    return (
        pl_cs.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(largest))
        .selectExpr(
            "n_players",
            "n_pairs",
            "n_matches",
            "round(CAST(n_pairs AS DOUBLE)"
            " / (CAST(n_players AS DOUBLE)"
            " * CAST(n_players - 1 AS DOUBLE) / CAST(2 AS DOUBLE)), 6)"
            " AS pair_coverage",
            "n_components",
            "largest_component",
        )
    )


# --- DPO-style (chosen, rejected) pair construction --------------------------
@query(
    "preference_dpo_pairs",
    oracle="""
    WITH ob AS (
      SELECT l_orderkey, p_brand,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY l_orderkey, p_brand
    ),
    rk AS (
      SELECT l_orderkey, p_brand, cents,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY cents DESC, p_brand) AS rn_top,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY cents ASC, p_brand) AS rn_bot
      FROM ob
    )
    SELECT l_orderkey AS prompt_id,
           max(CASE WHEN rn_top = 1 THEN p_brand END) AS chosen,
           max(CASE WHEN rn_bot = 1 THEN p_brand END) AS rejected,
           CAST(max(cents) - min(cents) AS BIGINT) AS margin_cents,
           CAST(count(*) AS BIGINT) AS n_responses
    FROM rk GROUP BY l_orderkey
    HAVING count(*) >= 2 AND max(cents) - min(cents) > 0
    """,
)
def preference_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO training-pair construction: per prompt (order), pair the
    highest-scoring response (brand by exact-cents basket spend) against
    the lowest-scoring one, keeping only prompts with >= 2 distinct
    responses and a strictly positive preference margin — the
    (prompt, chosen, rejected, margin) table a direct-preference-
    optimization loader consumes, with the margin available for
    margin-weighted variants (IPO/margin-DPO). Ties at either end break
    to the lexicographically smaller brand, so the pairing is fully
    deterministic; zero-margin prompts (no expressible preference) are
    dropped rather than emitted as coin flips.

    Scale shape: one map-side-combined groupBy(order, brand) fact
    shuffle, one window PARTITIONED by order (two sort orders over the
    same exchange — never a global sort), one groupBy(order) re-using
    the same partitioning. Output is ~one row per multi-response prompt;
    nothing quadratic, no driver state. Extends the preference family's
    match mining (_matrix) from top-2 podium pairs to best-vs-worst
    training pairs. Reference analogue: the pairwise model-comparison
    layer (teamProject/models.ipynb) recast as pair *generation*."""
    from pyspark.sql import Window

    from ..functions import numeric as N

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey", "p_brand")
        .agg(F.expr(f"sum({N.spark_iscaled('l_extendedprice', 2)}) AS cents"))
    )
    w_top = Window.partitionBy("l_orderkey").orderBy(
        F.desc("cents"), F.asc("p_brand")
    )
    w_bot = Window.partitionBy("l_orderkey").orderBy(
        F.asc("cents"), F.asc("p_brand")
    )
    rk = ob.select(
        "l_orderkey",
        "p_brand",
        "cents",
        F.row_number().over(w_top).alias("rn_top"),
        F.row_number().over(w_bot).alias("rn_bot"),
    )
    return (
        rk.groupBy("l_orderkey")
        .agg(
            F.expr("max(CASE WHEN rn_top = 1 THEN p_brand END) AS chosen"),
            F.expr("max(CASE WHEN rn_bot = 1 THEN p_brand END) AS rejected"),
            F.expr("CAST(max(cents) - min(cents) AS BIGINT) AS margin_cents"),
            F.expr("CAST(count(*) AS BIGINT) AS n_responses"),
        )
        .filter("n_responses >= 2 AND margin_cents > 0")
        .selectExpr(
            "l_orderkey AS prompt_id",
            "chosen",
            "rejected",
            "margin_cents",
            "n_responses",
        )
    )
