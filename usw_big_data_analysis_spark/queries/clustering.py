"""Distributed clustering over `embeddings` (north-star extension).

`kmeans_spherical` runs two full Lloyd rounds of spherical k-means — the
standard clustering for unit-direction text embeddings (assignment by
maximum cosine; a cell's centroid DIRECTION is just the elementwise sum of
its members, so the mean's 1/n division cancels out of every cosine and the
whole iteration stays in exact integer arithmetic).

Reference parity: completes the clustering story next to `embed_ann_ivf`
(which assigns to FIXED seed centroids, queries/similarity.py:989) — this
operator actually trains the cells, mirroring the reference's KMeans usage
(`teamProject/eda.ipynb` cluster profiling) re-expressed as joins + aggs.

Cross-engine exactness recipe (the house convention from similarity.py):
components are 1e6-scaled integers (round half-away is identical in Spark
and DuckDB), dot products and norms are integer/decimal sums (order-
independent), and the only floating-point steps — sqrt and one division —
are written as the identical IEEE expression on both sides before a
round(·, 6) quantization.

Scale: each round is (explode → equi-join on pos → partial-agg) — shuffle
∝ corpus × K row-slices, never quadratic in corpus; K and dim are small so
the centroid table broadcasts. Round-2 centroid components are decimal(38)
(a cell summing ~1e11 scaled components stays exact); the round-1 bigint
products carry a ~4.6e18 envelope at 100× the sf0.1 corpus — beyond that,
lift the round-1 sums to decimal too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_K = 8  # coarse cells; seeds = vec_id < _K (deterministic)
_SCALE = 1_000_000.0  # 1e6: float32 inputs carry < 7 significant digits


def _assign(expl: DataFrame, vn: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine cell: equi-join on pos,
    integer-sum the dot, one rounded double division, per-vector argmax."""
    cn = cent.groupBy("cell").agg(
        F.sqrt(
            F.sum(
                F.col("cv").cast("decimal(38,0)") * F.col("cv").cast("decimal(38,0)")
            ).cast("double")
        ).alias("nc")
    )
    dots = (
        expl.join(cent, "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum(F.col("xi") * F.col("cv")).alias("dot"))
    )
    cos = (
        dots.join(vn, "vec_id")
        .join(F.broadcast(cn), "cell")
        .select(
            "vec_id",
            "cell",
            N.fround(
                F.col("dot").cast("double") / (F.col("nx") * F.col("nc")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
    return (
        cos.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "cell", "cos")
    )


@query(
    "kmeans_spherical",
    oracle=f"""
    WITH expl AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_SCALE}, 0)
                  AS BIGINT) AS xi
      FROM embeddings
    ),
    vn AS (
      SELECT vec_id, sqrt(CAST(sum(xi * xi) AS DOUBLE)) AS nx
      FROM expl GROUP BY vec_id
    ),
    c1 AS (SELECT vec_id AS cell, pos, xi AS cv FROM expl WHERE vec_id < {_K}),
    cn1 AS (
      SELECT cell, sqrt(CAST(sum(CAST(cv AS DECIMAL(38,0))
                                 * CAST(cv AS DECIMAL(38,0))) AS DOUBLE)) AS nc
      FROM c1 GROUP BY cell
    ),
    d1 AS (
      SELECT e.vec_id, c.cell, CAST(sum(e.xi * c.cv) AS DOUBLE) AS dot
      FROM expl e JOIN c1 c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cell
    ),
    s1 AS (
      SELECT d.vec_id, d.cell, round(d.dot / (vn.nx * cn1.nc), 6) AS cos
      FROM d1 d JOIN vn ON d.vec_id = vn.vec_id JOIN cn1 ON d.cell = cn1.cell
    ),
    a1 AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rn
        FROM s1) WHERE rn = 1
    ),
    c2 AS (
      SELECT a.cell, e.pos, CAST(sum(e.xi) AS DECIMAL(38,0)) AS cv
      FROM expl e JOIN a1 a ON e.vec_id = a.vec_id
      GROUP BY a.cell, e.pos
    ),
    cn2 AS (
      SELECT cell, sqrt(CAST(sum(cv * cv) AS DOUBLE)) AS nc
      FROM c2 GROUP BY cell
    ),
    d2 AS (
      SELECT e.vec_id, c.cell,
             CAST(sum(CAST(e.xi AS DECIMAL(38,0)) * c.cv) AS DOUBLE) AS dot
      FROM expl e JOIN c2 c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cell
    ),
    s2 AS (
      SELECT d.vec_id, d.cell, round(d.dot / (vn.nx * cn2.nc), 6) AS cos
      FROM d2 d JOIN vn ON d.vec_id = vn.vec_id JOIN cn2 ON d.cell = cn2.cell
    ),
    a2 AS (
      SELECT vec_id, cell, cos FROM (
        SELECT vec_id, cell, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rn
        FROM s2) WHERE rn = 1
    )
    SELECT a2.cell,
           count(*) AS n_members,
           CAST(sum(CASE WHEN a1.cell <> a2.cell THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(sum(CAST(a2.cos AS DECIMAL(16,6))) AS DOUBLE) / count(*)
             AS mean_cos
    FROM a2 JOIN a1 ON a2.vec_id = a1.vec_id
    GROUP BY a2.cell
    ORDER BY a2.cell
    """,
)
def kmeans_spherical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds of spherical k-means: seed cells from the first
    {K} vectors, assign by max cosine, re-derive centroid directions as
    elementwise member sums, re-assign, and report per-cell size, how many
    vectors changed cells between rounds, and mean member cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "fv")
    ).select(
        "vec_id",
        "pos",
        N.fround_int(F.col("fv").cast("double") * F.lit(_SCALE))
        .alias("xi"),
    )
    vn = expl.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("xi") * F.col("xi")).cast("double")).alias("nx")
    )
    cent1 = expl.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cell"), "pos", F.col("xi").alias("cv")
    )
    a1 = _assign(expl, vn, cent1).select("vec_id", "cell")
    cent2 = (
        expl.join(a1, "vec_id")
        .groupBy("cell", "pos")
        .agg(F.sum("xi").cast("decimal(38,0)").alias("cv"))
    )
    a2 = _assign(expl, vn, cent2)
    return (
        a2.join(a1.withColumnRenamed("cell", "cell_prev"), "vec_id")
        .groupBy(a2["cell"])
        .agg(
            F.count("*").alias("n_members"),
            F.sum((F.col("cell_prev") != a2["cell"]).cast("int"))
            .cast("bigint")
            .alias("n_moved"),
            (
                F.sum(F.col("cos").cast("decimal(16,6)")).cast("double")
                / F.count("*")
            ).alias("mean_cos"),
        )
        .orderBy("cell")
    )


# --- SemDeDup: cluster-scoped embedding near-dedup ---------------------------
_SD_TAU = 0.98
_SD_SHIFT = 100000  # same duplicated-corpus trick as dedup_embed_cosine


@query(
    "embed_semdedup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {_SD_SHIFT} AS vec_id, embedding FROM embeddings
    ),
    expl AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_SCALE}, 0)
                  AS BIGINT) AS xi
      FROM corpus
    ),
    vn AS (
      SELECT vec_id, sqrt(CAST(sum(xi * xi) AS DOUBLE)) AS nx
      FROM expl GROUP BY vec_id
    ),
    c1 AS (SELECT vec_id AS cell, pos, xi AS cv FROM expl WHERE vec_id < {_K}),
    cn1 AS (
      SELECT cell, sqrt(CAST(sum(CAST(cv AS DECIMAL(38,0))
                                 * CAST(cv AS DECIMAL(38,0))) AS DOUBLE)) AS nc
      FROM c1 GROUP BY cell
    ),
    d1 AS (
      SELECT e.vec_id, c.cell, CAST(sum(e.xi * c.cv) AS DOUBLE) AS dot
      FROM expl e JOIN c1 c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cell
    ),
    a1 AS (
      SELECT vec_id, cell FROM (
        SELECT d.vec_id, d.cell,
               row_number() OVER (PARTITION BY d.vec_id
                                  ORDER BY round(d.dot / (vn.nx * cn1.nc), 6)
                                           DESC, d.cell) AS rn
        FROM d1 d JOIN vn ON d.vec_id = vn.vec_id JOIN cn1 ON d.cell = cn1.cell
      ) WHERE rn = 1
    ),
    pe AS (
      SELECT a.cell, e.vec_id, e.pos, e.xi
      FROM expl e JOIN a1 a ON e.vec_id = a.vec_id
    ),
    pr AS (
      SELECT x.cell, x.vec_id AS id_a, y.vec_id AS id_b,
             CAST(sum(CAST(x.xi AS DECIMAL(38,0)) * y.xi) AS DOUBLE) AS dot
      FROM pe x JOIN pe y
        ON x.cell = y.cell AND x.pos = y.pos AND x.vec_id < y.vec_id
      GROUP BY x.cell, x.vec_id, y.vec_id
    ),
    dup AS (
      SELECT DISTINCT id_b FROM pr
      JOIN vn a ON pr.id_a = a.vec_id JOIN vn b ON pr.id_b = b.vec_id
      WHERE round(pr.dot / (a.nx * b.nx), 6) >= {_SD_TAU}
    )
    SELECT a1.vec_id, a1.cell, (dup.id_b IS NULL) AS keep
    FROM a1 LEFT JOIN dup ON a1.vec_id = dup.id_b
    """,
)
def embed_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    only ever compares embeddings INSIDE a k-means cell — cluster-assign,
    exact within-cell cosine, greedily keep the lowest id of every >= tau
    pair. The corpus is the fixture plus an exact copy under shifted ids
    (same trick as dedup_embed_cosine) so every vector has a guaranteed
    cosine-1.0 duplicate to drop.

    Scale shape: the pair explode is scoped to a CELL, never the corpus —
    at 100 TB you size K so cells stay ~1e4-1e5 vectors (SemDeDup's own
    regime) and the within-cell join is bounded; run dedup_bucket_stats'
    analogue over cell sizes first if skew is suspected. Assignment is the
    kmeans_spherical equi-join (shuffle ∝ corpus × K row-slices); all
    arithmetic follows the house exact-integer recipe so the verdict
    column hash-matches DuckDB bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + _SD_SHIFT).alias("vec_id"), "embedding")
    )
    expl = corpus.select(
        "vec_id", F.posexplode("embedding").alias("pos", "fv")
    ).select(
        "vec_id",
        "pos",
        N.fround_int(F.col("fv").cast("double") * F.lit(_SCALE))
        .alias("xi"),
    )
    vn = expl.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("xi") * F.col("xi")).cast("double")).alias("nx")
    )
    cent = expl.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cell"), "pos", F.col("xi").alias("cv")
    )
    a1 = _assign(expl, vn, cent).select("vec_id", "cell")
    # within-cell dups via the per-cell numpy kernel instead of the
    # exploded pair self-join (|cell|²·dims/2 rows through a join +
    # decimal groupBy, ~15s at sf0.1 → ~1s): identical integer recipe —
    # see cell_dup_ids' bit-compatibility contract (optimization r07,
    # guide §4.2); oracle parity re-verified at sf0.01 + sf0.1.
    from ..operators.similarity_ops import cell_dup_ids

    assigned = corpus.join(a1, "vec_id")
    dup = cell_dup_ids(assigned, _SCALE, _SD_TAU)
    return a1.join(
        dup, a1["vec_id"] == dup["dup_id"], "left"
    ).select("vec_id", "cell", F.col("dup_id").isNull().alias("keep"))


# --- k-means|| initialization (Bahmani et al. 2012) --------------------------
# The distributed seeding k-means++ cannot do: instead of K sequential
# corpus scans, R rounds each oversample ~L candidates with probability
# L*d²(x)/Φ, then the candidate set is weighted by nearest-point counts
# for the driver-side reduce. Deterministic variant: components are
# 1e4-scaled integers (house convention), d² and Φ are pure bigint sums,
# and the sampling decision u·Φ < L·10⁴·d² is an integer comparison with a
# keyed-hash u — bit-identical across engines and partition orders.
# Overflow headroom: u·Φ ≤ 10⁴ · Σd² stays under 2^63 through ~5·10⁷
# vectors at these magnitudes; widen Φ to a decimal lane past that.
_KPP_SCALE = 10_000
_KPP_L = 6
_KPP_R = 3
_KPP_UMOD = 10_000
_KPP_PACK = 1_000_000  # argmin packing: d2 * PACK + cid


def _kpp_oracle() -> str:
    rounds = []
    for r in range(1, _KPP_R + 1):
        rounds.append(f"""
    dist{r} AS (
      SELECT x.vec_id, c.cid, CAST(sum((x.xv - c.cv) * (x.xv - c.cv))
                                   AS BIGINT) AS d2
      FROM xe x JOIN ce{r - 1} c ON x.pos = c.pos
      GROUP BY x.vec_id, c.cid
    ),
    dmin{r} AS (SELECT vec_id, min(d2) AS dmin FROM dist{r} GROUP BY vec_id),
    phi{r} AS (SELECT CAST(sum(dmin) AS BIGINT) AS phi FROM dmin{r}),
    cand{r} AS (
      SELECT cid, rnd FROM cand{r - 1}
      UNION ALL
      SELECT d.vec_id AS cid, {r} AS rnd
      FROM dmin{r} d CROSS JOIN phi{r}
      WHERE ((d.vec_id * 2654435761 + {r} * 97003) % {_KPP_UMOD}) * phi
            < {_KPP_L} * {_KPP_UMOD} * d.dmin
    ),
    ce{r} AS (
      SELECT c.cid, x.pos, x.xv AS cv FROM cand{r} c
      JOIN xe x ON x.vec_id = c.cid
    )""")
    return f"""
    WITH xe AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(sign(CAST(unnest(embedding) AS DOUBLE))
                  * floor(abs(CAST(unnest(embedding) AS DOUBLE))
                          * {_KPP_SCALE}.0 + 0.5) AS BIGINT) AS xv
      FROM embeddings
    ),
    cand0 AS (
      SELECT min(vec_id) AS cid, 0 AS rnd FROM embeddings
    ),
    ce0 AS (
      SELECT c.cid, x.pos, x.xv AS cv FROM cand0 c
      JOIN xe x ON x.vec_id = c.cid
    ),{','.join(rounds)},
    fdist AS (
      SELECT x.vec_id, c.cid, CAST(sum((x.xv - c.cv) * (x.xv - c.cv))
                                   AS BIGINT) AS d2
      FROM xe x JOIN ce{_KPP_R} c ON x.pos = c.pos
      GROUP BY x.vec_id, c.cid
    ),
    best AS (
      SELECT vec_id, min(d2 * {_KPP_PACK} + cid) AS bkey
      FROM fdist GROUP BY vec_id
    ),
    w AS (
      SELECT CAST(bkey % {_KPP_PACK} AS BIGINT) AS cid,
             CAST(count(*) AS BIGINT) AS weight
      FROM best GROUP BY 1
    )
    SELECT c.cid, CAST(c.rnd AS INT) AS round_added,
           coalesce(w.weight, 0) AS weight
    FROM cand{_KPP_R} c LEFT JOIN w ON c.cid = w.cid
    """


@query("kmeans_parallel_init", oracle=_kpp_oracle())
def kmeans_parallel_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| seeding (Bahmani et al. 2012) — the initialization that
    makes k-means viable at 100 TB: k-means++ needs K strictly sequential
    corpus scans; k-means|| replaces them with {_KPP_R} rounds that each
    OVERSAMPLE ~{_KPP_L} candidates with probability L·d²(x)/Φ against the
    running candidate set, then weights every candidate by its nearest-
    point count (the input to the driver-side weighted reduce; candidates
    are ~L·R rows, so that reduce is trivial). Existing candidates have
    d² = 0 and can never re-select.

    Scale shape: per round ONE corpus pass — the candidate set broadcasts
    (≤ 1+L·R rows), d² is an integer zip_with fold per (vector, candidate),
    the round's Φ is one scalar aggregate, and the sampling decision is a
    pure bigint comparison (no RNG, no floats — see module note for the
    quantization contract and overflow headroom). Output: (cid,
    round_added, weight) for the final candidate set."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        # half-away-from-zero via sign/abs/floor: pure double arithmetic
        # (identical IEEE in both engines) — round() on a double plans as a
        # per-row BigDecimal conversion, which the plan audit rightly flags
        # in a per-element hot path
        F.expr(
            f"transform(embedding, v -> CAST(sign(CAST(v AS DOUBLE))"
            f" * floor(abs(CAST(v AS DOUBLE)) * {_KPP_SCALE}.0D + 0.5D)"
            f" AS BIGINT)) AS v4"
        ),
    )
    seed_id = corpus.agg(F.expr("min(vec_id) AS cid"))
    cands = (
        corpus.join(F.broadcast(seed_id), corpus.vec_id == F.col("cid"))
        .select("cid", F.col("v4").alias("c4"), F.lit(0).alias("rnd"))
    )

    def dists(cand_frame: DataFrame) -> DataFrame:
        return corpus.crossJoin(
            F.broadcast(cand_frame.select("cid", "c4"))
        ).select(
            "vec_id",
            "cid",
            F.expr(
                "aggregate(zip_with(v4, c4, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS d2"
            ),
        )

    for r in range(1, _KPP_R + 1):
        dmin = dists(cands).groupBy("vec_id").agg(F.expr("min(d2) AS dmin"))
        phi = dmin.agg(F.expr("CAST(sum(dmin) AS BIGINT) AS phi"))
        sel = (
            dmin.crossJoin(F.broadcast(phi))
            .filter(
                F.expr(
                    f"((vec_id * 2654435761 + {r} * 97003) % {_KPP_UMOD})"
                    f" * phi < {_KPP_L} * {_KPP_UMOD} * dmin"
                )
            )
            .join(corpus, "vec_id")
            .select(
                F.col("vec_id").alias("cid"),
                F.col("v4").alias("c4"),
                F.lit(r).alias("rnd"),
            )
        )
        # materialize the ≤ 1+L·r-row candidate set each round: without
        # this the round-r plan re-derives EVERY earlier round's dists →
        # dmin → phi → selection from scratch wherever cands appears
        # (the final best-assignment pass paid ~R² corpus scans instead
        # of R+1; optimization r07, guide §2.4/§5 — 5.3s → 0.6s steady)
        cands = cands.unionByName(sel).localCheckpoint()

    best = (
        dists(cands)
        .groupBy("vec_id")
        .agg(F.expr(f"min(d2 * {_KPP_PACK} + cid) AS bkey"))
    )
    w = best.groupBy(
        F.expr(f"CAST(bkey % {_KPP_PACK} AS BIGINT)").alias("cid")
    ).agg(F.expr("CAST(count(*) AS BIGINT) AS weight"))
    return (
        cands.select("cid", "rnd")
        .join(w, "cid", "left")
        .selectExpr(
            "cid",
            "CAST(rnd AS INT) AS round_added",
            "coalesce(weight, CAST(0 AS BIGINT)) AS weight",
        )
    )
