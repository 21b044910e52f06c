"""Similarity search over `embeddings` (north-star extension): brute-force
cosine top-k baseline and random-hyperplane LSH ANN.

Dot products / norms are computed by exploding the vector to (id, pos, v)
and decimal-summing elementwise products — order-independent and therefore
oracle-exact. The Pandas-UDF vectorized form (numpy matmul per Arrow batch,
~10-50× faster per-core) lives in ``operators/similarity_ops.py``; this SQL
form is the semantics contract.

Scale notes: brute-force is O(|Q|·|C|) — the baseline, kept for small query
sets and verification. The LSH path buckets by hyperplane sign bits so the
candidate join is an equi-join on bucket (shuffle ∝ corpus size); recall is
tuned by #hyperplanes and #tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_NQ = 5  # query set: vec_id < 5
_TOPK = 5

# (id, pos, v) exploded embeddings; pos is 0-based in both engines
_EXPL_SQL = """
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
"""

_NORMS_SQL = """
  SELECT vec_id,
         sqrt(CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE)) AS nrm
  FROM expl GROUP BY vec_id
"""


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "fv")
    ).select("vec_id", "pos", F.col("fv").cast("double").alias("v"))


def _norms(expl: DataFrame) -> DataFrame:
    return expl.groupBy("vec_id").agg(
        F.sqrt(
            F.sum((F.col("v") * F.col("v")).cast("decimal(20,12)")).cast("double")
        ).alias("nrm")
    )


def _dec_dot(a: F.Column, b: F.Column) -> F.Column:
    """Exact (order-independent) dot product, bit-equal to the oracle's
    sum(CAST(x*y AS DECIMAL(20,12))): round(x*y * 1e12) as bigint IS that
    decimal's unscaled value (verified bit-identical over every fixture
    pair), and 64 of them sum within 2^53 — so the fold is plain integer
    adds instead of BigDecimal allocation (GC-visible at scale). The
    per-element round is N.fround_int (sign·floor(abs+0.5), half away
    from zero like DuckDB's decimal cast) — the F.round form it replaced
    boxed a BigDecimal per ELEMENT, 64x per pair (ROUND@ROW audit)."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: N.fround_int(x.cast("double") * y.cast("double") * 1e12),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x).cast(
            "double"
        )
        / 1e12
    )


def _hyperplane_sum(r_of_pos) -> F.Column:
    """Signed int64 fold of round12(v·r(pos)) over embedding positions —
    sign-identical to the oracle's ``sum(CAST(v * r AS DECIMAL(20,12)))``:
    the DECIMAL(20,12) cast IS ``fround_int(x·1e12)`` (the verified
    _dec_dot contract) and 64 products of |v|<1, |r|≤0.5 stay far under
    2^53, so the integer sum carries the exact decimal value. Only the
    SIGN ever feeds a bucket bit, so the decimal(30,12) fold this replaces
    — one BigDecimal allocation per element per plane per vector — bought
    nothing (optimization r07, guide §1.2 step 2)."""
    idx = F.sequence(F.lit(0), F.size("embedding") - 1)
    prods = F.zip_with(
        F.col("embedding"),
        idx,
        lambda v, p: N.fround_int(v.cast("double") * r_of_pos(p) * 1e12),
    )
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


# --- brute-force cosine top-k ------------------------------------------------
_EXACT_TOPK_ORACLE = f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    q AS (SELECT vec_id AS qid, pos, v AS qv FROM expl WHERE vec_id < {_NQ}),
    dots AS (
      SELECT q.qid, c.vec_id AS cid,
             CAST(sum(CAST(q.qv * c.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM q JOIN expl c ON q.pos = c.pos
      GROUP BY q.qid, c.vec_id
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
      WHERE qid <> cid
    )
    SELECT qid, cid, cosine, rn FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
      FROM cos
    ) WHERE rn <= {_TOPK}
    """


@query("embed_cosine_topk", oracle=_EXACT_TOPK_ORACLE)
def embed_cosine_topk(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Broadcast the query vectors against the corpus and fold each pair's
    dot product as an array aggregate — no explode, no per-element shuffle;
    the corpus is scanned once. (The posexploded form this replaced shuffles
    |corpus|x64 rows.) Decimal fold keeps it bit-equal to the oracle.

    ``exact=False`` swaps in the Arrow-vectorized numpy-matmul kernel
    (operators/similarity_ops.py) — same result set (top-k ids match; the
    equivalence is pinned in tests/test_similarity_ops.py) at a fraction of
    the cost, because the decimal fold's per-element round+cast in an
    interpreted higher-order function is what the exactness buys. The
    registered/oracle-checked path stays exact; bench.py times the fast
    path, which is what production similarity search would run."""
    if not exact:
        from ..operators.similarity_ops import cosine_topk_vectorized

        emb = load_table(spark, sf_dir, "embeddings")
        return cosine_topk_vectorized(emb, n_queries=_NQ, k=_TOPK)
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn("nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding"))))
    q = withn.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
    )
    c = withn.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("cid"))
    cos = pairs.select(
        "qid",
        "cid",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb")) / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TOPK)


# --- random-hyperplane LSH buckets + within-bucket ANN ----------------------
_NPLANES = 4

# deterministic pseudo-random hyperplane component for (plane j, position p):
# ((j*64 + p) * 2654435761 % 1000) / 1000 - 0.5  (same arithmetic both engines)
def _r_sql(j: int) -> str:
    return f"(CAST(({j} * 64 + pos) * 2654435761 % 1000 AS DOUBLE) / 1000.0 - 0.5)"


_BUCKET_SQL = f"""
  SELECT vec_id,
         {' + '.join(
           f"(CASE WHEN CAST(sum(CAST(v * {_r_sql(j)} AS DECIMAL(20,12))) AS DOUBLE) > 0 "
           f"THEN {1 << j} ELSE 0 END)"
           for j in range(_NPLANES))} AS bucket
  FROM expl GROUP BY vec_id
"""


_LSH_TOPK_ORACLE = f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    buckets AS ({_BUCKET_SQL}),
    q AS (SELECT e.vec_id AS qid, e.pos, e.v AS qv, b.bucket
          FROM expl e JOIN buckets b ON e.vec_id = b.vec_id
          WHERE e.vec_id < {_NQ}),
    cand AS (
      SELECT q.qid, c.vec_id AS cid, q.pos, q.qv, c.v
      FROM q JOIN expl c ON q.pos = c.pos
      JOIN buckets cb ON c.vec_id = cb.vec_id AND cb.bucket = q.bucket
      WHERE q.qid <> c.vec_id
    ),
    dots AS (
      SELECT qid, cid,
             CAST(sum(CAST(qv * v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand GROUP BY qid, cid
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    )
    SELECT qid, cid, cosine, rn FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
      FROM cos
    ) WHERE rn <= {_TOPK}
    """


@query("embed_ann_lsh", oracle=_LSH_TOPK_ORACLE)
def embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit bucket per vector from {_NPLANES} fixed hyperplanes, then
    exact cosine only within the query's bucket — the ANN trade: ~1/2^planes
    of the corpus scored per query."""
    expl = _exploded(spark, sf_dir)
    norms = _norms(expl)

    def r_col(j: int) -> F.Column:
        return ((F.lit(j) * 64 + F.col("pos")) * 2654435761 % 1000).cast(
            "double"
        ) / 1000.0 - 0.5

    bucket_terms = [
        F.when(
            F.sum((F.col("v") * r_col(j)).cast("decimal(20,12)")).cast("double") > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j in range(_NPLANES)
    ]
    buckets = expl.groupBy("vec_id").agg(
        sum(bucket_terms[1:], bucket_terms[0]).alias("bucket")
    )
    q = (
        expl.join(buckets, "vec_id")
        .filter(F.col("vec_id") < _NQ)
        .select(
            F.col("vec_id").alias("qid"), "pos", F.col("v").alias("qv"), "bucket"
        )
    )
    c = expl.select(F.col("vec_id").alias("cid"), "pos", "v").join(
        buckets.select(F.col("vec_id").alias("cid"), F.col("bucket").alias("cbucket")),
        "cid",
    )
    cand = q.join(
        c, (q.pos == c.pos) & (F.col("bucket") == F.col("cbucket"))
    ).filter(F.col("qid") != F.col("cid"))
    dots = cand.groupBy("qid", "cid").agg(
        F.sum((F.col("qv") * F.col("v")).cast("decimal(20,12)"))
        .cast("double")
        .alias("dot")
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nrm_q"))
    nc = norms.select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nrm_c"))
    cos = (
        dots.join(F.broadcast(nq), "qid")
        .join(nc, "cid")
        .select(
            "qid",
            "cid",
            N.fround(F.col("dot") / (F.col("nrm_q") * F.col("nrm_c")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TOPK)


# --- hard-negative mining for contrastive embedding training -----------------
# The training-loop shape: for every anchor in the CURRENT BATCH (not a
# fixed tiny query set), surface the corpus vectors that are similar-but-
# not-duplicate — the negatives that actually move a contrastive loss.
# Candidates come from the anchor's LSH bucket (equi-join, linear in corpus
# size — never all-pairs), the similarity band [LO, HI) drops both the easy
# negatives (below LO, gradient≈0) and the near-duplicates (>= HI, likely
# false negatives = same content), and each anchor keeps its K hardest.
_HNM_BATCH = 64  # anchor batch: vec_id < 64 (one training step's anchors)
_HNM_K = 3
_HNM_LO = 0.15  # ~p90 of the corpus cosine distribution — "hard" territory
_HNM_HI = 0.95  # near-dup ceiling: above this it's the same content

_HARD_NEG_ORACLE = f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    buckets AS ({_BUCKET_SQL}),
    q AS (SELECT e.vec_id AS qid, e.pos, e.v AS qv, b.bucket
          FROM expl e JOIN buckets b ON e.vec_id = b.vec_id
          WHERE e.vec_id < {_HNM_BATCH}),
    cand AS (
      SELECT q.qid, c.vec_id AS cid, q.pos, q.qv, c.v
      FROM q JOIN expl c ON q.pos = c.pos
      JOIN buckets cb ON c.vec_id = cb.vec_id AND cb.bucket = q.bucket
      WHERE q.qid <> c.vec_id
    ),
    dots AS (
      SELECT qid, cid,
             CAST(sum(CAST(qv * v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand GROUP BY qid, cid
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    )
    SELECT qid, cid, cosine, rn FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
      FROM cos
      WHERE cosine >= {_HNM_LO} AND cosine < {_HNM_HI}
    ) WHERE rn <= {_HNM_K}
    """


@query("embed_hard_negatives", oracle=_HARD_NEG_ORACLE)
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for a {nq}-anchor training batch: same-LSH-
    bucket candidates, exact decimal cosine, band-filtered to
    [{lo}, {hi}) — similar enough to be hard, below the near-duplicate
    ceiling that would make them false negatives — then the {k} hardest
    per anchor. This is the LSH-bucketed scale path that
    knn_hard_negatives' docstring promises (that key is the brute-force
    label-mismatch top-1 baseline; this one is unsupervised — the band
    stands in for the label filter when labels don't exist, the normal
    case for pretraining corpora). The band filter runs on the ROUNDED
    cosine so the boundary is the same value in both engines. Plan: one
    bucket equi-join (shuffle linear in corpus size), one grouped
    dot-product aggregate, and a per-anchor window — the per-batch
    mining cost is |batch| x bucket-size, independent of corpus size.

    Since optimization r08 the registered path is the two-kernel vectorized
    form (operators/similarity_ops.hard_negatives_vectorized): one
    mapInPandas pass computes sign-bit buckets + norms, one applyInPandas
    per bucket scores anchors against their own bucket — bit-identical to
    the exploded bucket-join plan retained as ``_hard_negatives_relational``
    (equivalence pinned in tests/test_similarity_ops.py; oracle parity at
    3 SFs).""".format(
        nq=_HNM_BATCH, lo=_HNM_LO, hi=_HNM_HI, k=_HNM_K
    )
    from ..operators.similarity_ops import hard_negatives_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives_vectorized(
        emb, _NPLANES, _HNM_BATCH, _HNM_K, _HNM_LO, _HNM_HI
    )


def _hard_negatives_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original exploded bucket-join + decimal-fold plan — the
    semantics contract the kernel is tested against (~2.2s steady at
    sf0.1)."""
    expl = _exploded(spark, sf_dir)
    norms = _norms(expl)

    def r_col(j: int) -> F.Column:
        return ((F.lit(j) * 64 + F.col("pos")) * 2654435761 % 1000).cast(
            "double"
        ) / 1000.0 - 0.5

    bucket_terms = [
        F.when(
            F.sum((F.col("v") * r_col(j)).cast("decimal(20,12)")).cast("double") > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j in range(_NPLANES)
    ]
    buckets = expl.groupBy("vec_id").agg(
        sum(bucket_terms[1:], bucket_terms[0]).alias("bucket")
    )
    q = (
        expl.join(buckets, "vec_id")
        .filter(F.col("vec_id") < _HNM_BATCH)
        .select(
            F.col("vec_id").alias("qid"), "pos", F.col("v").alias("qv"), "bucket"
        )
    )
    c = expl.select(F.col("vec_id").alias("cid"), "pos", "v").join(
        buckets.select(F.col("vec_id").alias("cid"), F.col("bucket").alias("cbucket")),
        "cid",
    )
    cand = q.join(
        c, (q.pos == c.pos) & (F.col("bucket") == F.col("cbucket"))
    ).filter(F.col("qid") != F.col("cid"))
    dots = cand.groupBy("qid", "cid").agg(
        F.sum((F.col("qv") * F.col("v")).cast("decimal(20,12)"))
        .cast("double")
        .alias("dot")
    )
    nq_ = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nrm_q"))
    nc_ = norms.select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nrm_c"))
    cos = (
        dots.join(F.broadcast(nq_), "qid")
        .join(nc_, "cid")
        .select(
            "qid",
            "cid",
            N.fround(F.col("dot") / (F.col("nrm_q") * F.col("nrm_c")), 6).alias(
                "cosine"
            ),
        )
        .filter((F.col("cosine") >= _HNM_LO) & (F.col("cosine") < _HNM_HI))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _HNM_K)


# --- embedding-cosine near-dup (north star dedup family) --------------------
_DUP_TAU = 0.98
_SHIFT = 100000

# corpus = embeddings + an exact copy under shifted ids, so every vector has
# at least one guaranteed near-duplicate (cosine 1.0) — same fixture trick
# as dedup_exact. Candidates come from the hyperplane buckets (identical
# vectors land in identical buckets), keeping the join linear in corpus
# size instead of all-pairs.
_DUP_EXPL_SQL = f"""
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {_SHIFT} AS vec_id, embedding FROM embeddings
  )
"""


@query(
    "dedup_embed_cosine",
    oracle=f"""
    WITH expl AS ({_DUP_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    buckets AS ({_BUCKET_SQL}),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.pos, a.v AS va, b.v AS vb
      FROM expl a
      JOIN buckets ba ON a.vec_id = ba.vec_id
      JOIN buckets bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
      JOIN expl b ON b.vec_id = bb.vec_id AND a.pos = b.pos
    ),
    dots AS (
      SELECT id_a, id_b,
             CAST(sum(CAST(va * vb AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand GROUP BY id_a, id_b
    ),
    cos AS (
      SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
      FROM dots JOIN norms na ON id_a = na.vec_id
                JOIN norms nb ON id_b = nb.vec_id
    )
    SELECT id_a, id_b, cosine FROM cos WHERE cosine >= {_DUP_TAU}
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: hyperplane-LSH buckets prune the
    pair space (equi-join on bucket — shuffle linear in corpus), exact
    decimal cosine confirms within buckets, keep pairs ≥ {_DUP_TAU}. The
    dedup action downstream is `keep min(id) per connected component`
    (connected components via iterated min-propagation — out of SQL scope)."""
    return _dup_candidate_cosines(spark, sf_dir).filter(
        F.col("cosine") >= _DUP_TAU
    )


def _hyperplane_tagged(frame: DataFrame) -> DataFrame:
    """(vec_id, embedding) frame + exact decimal norm + hyperplane bucket —
    the no-explode bucket builder shared by the dup-candidate head and the
    eval-decontamination scan. Bucket from the vector column directly: dot
    each vector against the fixed pseudo-random hyperplane via aggregate
    over positions."""
    withn = frame.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )

    def r_col(j: int, pos: F.Column) -> F.Column:
        return ((F.lit(j) * 64 + pos) * 2654435761 % 1000).cast("double") / 1000.0 - 0.5

    def plane_dot(j: int) -> F.Column:
        return _hyperplane_sum(lambda p: r_col(j, p))

    bucket = sum(
        (F.when(plane_dot(j) > 0, F.lit(1 << j)).otherwise(0) for j in range(1, _NPLANES)),
        F.when(plane_dot(0) > 0, F.lit(1)).otherwise(0),
    )
    return withn.withColumn("bucket", bucket)


def _dup_candidate_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, cosine) for every LSH-bucket candidate pair of the
    duplicated corpus — the shared head of dedup_embed_cosine and the
    threshold sweep."""
    from ..operators.similarity_ops import bucket_pair_cosines

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + _SHIFT).alias("vec_id"), "embedding")
    )
    # per-bucket numpy kernel instead of the bucket self-join + interpreted
    # 64-element fold per pair: the self-join evaluated the hyperplane
    # tagging TWICE (once per side) and folded |corpus|²/B pairs
    # element-by-element (~26s at sf0.1); the kernel shuffles each bucket
    # once and batch-computes all pairwise quantized dots (~1s).
    # Bit-identical arithmetic — see bucket_pair_cosines' contract
    # (optimization r07, guide §4.2); oracle parity re-verified.
    tagged = _hyperplane_tagged(corpus)
    return bucket_pair_cosines(tagged.select("vec_id", "embedding", "bucket"))


# --- semantic eval-set decontamination ---------------------------------------
# n-gram decontamination (queries/decontam.py decontam_ngram) misses
# paraphrased leakage; the semantic scan catches it in embedding space.
# Eval set = vec_id % 97 == 0. The natural fixture has no leakage (max
# eval-vs-corpus cosine measured 0.47), so the corpus re-inserts each eval
# vector under a shifted id — the same guaranteed-positive trick as
# dedup_embed_cosine — and tau 0.9 flags exactly the planted leaks.
_EVAL_MOD = 97
_EVAL_TAU = 0.9


def _decontam_bucket_sql(src: str) -> str:
    return _BUCKET_SQL.replace("FROM expl", f"FROM {src}")


@query(
    "decontam_embedding_eval",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE vec_id % {_EVAL_MOD} <> 0
      UNION ALL
      SELECT vec_id + {_SHIFT} AS vec_id, label, embedding FROM embeddings
      WHERE vec_id % {_EVAL_MOD} = 0
    ),
    ev AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % {_EVAL_MOD} = 0),
    cexpl AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM corpus
    ),
    eexpl AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM ev
    ),
    cnorm AS (
      SELECT vec_id, sqrt(CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE))
               AS nrm
      FROM cexpl GROUP BY vec_id
    ),
    enorm AS (
      SELECT vec_id, sqrt(CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE))
               AS nrm
      FROM eexpl GROUP BY vec_id
    ),
    cbuck AS ({_decontam_bucket_sql('cexpl')}),
    ebuck AS ({_decontam_bucket_sql('eexpl')}),
    dots AS (
      SELECT cb.vec_id AS cid, eb.vec_id AS eid,
             CAST(sum(CAST(a.v * b.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cbuck cb
      JOIN ebuck eb ON cb.bucket = eb.bucket
      JOIN cexpl a ON a.vec_id = cb.vec_id
      JOIN eexpl b ON b.vec_id = eb.vec_id AND a.pos = b.pos
      GROUP BY 1, 2
    ),
    mc AS (
      SELECT cid, round(max(dot / (cn.nrm * en.nrm)), 6) AS max_cos
      FROM dots
      JOIN cnorm cn ON cid = cn.vec_id
      JOIN enorm en ON eid = en.vec_id
      GROUP BY cid
    )
    SELECT c.label,
           CAST(count(*) AS BIGINT) AS n_corpus,
           CAST(sum(CASE WHEN mc.max_cos >= {_EVAL_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           round(CAST(sum(CASE WHEN mc.max_cos >= {_EVAL_TAU} THEN 1 ELSE 0
                          END) AS DOUBLE) / count(*), 6) AS flag_rate
    FROM corpus c LEFT JOIN mc ON c.vec_id = mc.cid
    GROUP BY c.label
    """,
)
def decontam_embedding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination: flag corpus vectors whose cosine
    to ANY eval vector reaches {tau} — the embedding-space complement of
    decontam_ngram that catches paraphrased leakage n-gram overlap misses.
    Candidates come from shared hyperplane-LSH buckets (equi-join on
    bucket — corpus-linear shuffle, never eval×corpus all-pairs; identical
    vectors always collide, so a true leak can't be missed), then the
    exact decimal cosine confirms, and the per-label report gives the
    release decision (which slices of the corpus are contaminated, at
    what rate). At 100 TB the eval set is tiny — the bucket table on the
    eval side could also broadcast — while the corpus side streams
    map-side; per-candidate cost is one 64-element integer fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % _EVAL_MOD == 0).select(
        "vec_id", "embedding"
    )
    corpus = (
        emb.filter(F.col("vec_id") % _EVAL_MOD != 0)
        .select("vec_id", "label", "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") % _EVAL_MOD == 0).select(
                (F.col("vec_id") + _SHIFT).alias("vec_id"),
                "label",
                "embedding",
            )
        )
    )
    c = _hyperplane_tagged(corpus).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ec"),
        F.col("nrm").alias("nc"),
        "bucket",
    )
    e = _hyperplane_tagged(ev).select(
        F.col("vec_id").alias("eid"),
        F.col("embedding").alias("ee"),
        F.col("nrm").alias("ne"),
        "bucket",
    )
    dots = c.join(e, "bucket").select(
        "cid",
        (_dec_dot(F.col("ec"), F.col("ee")) / (F.col("nc") * F.col("ne"))).alias(
            "cos_raw"
        ),
    )
    mc = dots.groupBy("cid").agg(
        N.fround(F.max("cos_raw"), 6).alias("max_cos")
    )
    lab = corpus.select("vec_id", "label")
    flagged = lab.join(mc, lab["vec_id"] == mc["cid"], "left")
    flag = F.when(F.col("max_cos") >= _EVAL_TAU, 1).otherwise(0)
    return flagged.groupBy("label").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_corpus"),
        F.sum(flag).cast("bigint").alias("n_flagged"),
        N.fround(
            F.sum(flag).cast("double") / F.count("*"), 6
        ).alias("flag_rate"),
    )


decontam_embedding_eval.__doc__ = decontam_embedding_eval.__doc__.format(
    tau=_EVAL_TAU
)


_SWEEP_TAUS = [0.80, 0.85, 0.90, 0.95]


@query(
    "embed_dedup_threshold_sweep",
    oracle=f"""
    WITH expl AS ({_DUP_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    buckets AS ({_BUCKET_SQL}),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.pos, a.v AS va, b.v AS vb
      FROM expl a
      JOIN buckets ba ON a.vec_id = ba.vec_id
      JOIN buckets bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
      JOIN expl b ON b.vec_id = bb.vec_id AND a.pos = b.pos
    ),
    dots AS (
      SELECT id_a, id_b,
             CAST(sum(CAST(va * vb AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand GROUP BY id_a, id_b
    ),
    cos AS (
      SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
      FROM dots JOIN norms na ON id_a = na.vec_id
                JOIN norms nb ON id_b = nb.vec_id
    ),
    th AS (SELECT unnest([{', '.join(repr(t) for t in _SWEEP_TAUS)}]) AS tau),
    pairs_t AS (
      SELECT t.tau, count(*) AS n FROM cos c JOIN th t ON c.cosine >= t.tau
      GROUP BY t.tau
    ),
    docs_t AS (
      SELECT t.tau, count(DISTINCT u.vid) AS n
      FROM (SELECT id_a AS vid, cosine FROM cos
            UNION ALL SELECT id_b, cosine FROM cos) u
      JOIN th t ON u.cosine >= t.tau GROUP BY t.tau
    )
    SELECT th.tau,
           CAST(coalesce(pairs_t.n, 0) AS BIGINT) AS n_dup_pairs,
           CAST(coalesce(docs_t.n, 0) AS BIGINT) AS n_docs_flagged
    FROM th LEFT JOIN pairs_t ON th.tau = pairs_t.tau
            LEFT JOIN docs_t ON th.tau = docs_t.tau
    """,
)
def embed_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate curve vs cosine threshold — the calibration run a
    pipeline does before committing a near-dup cutoff at corpus scale:
    for each candidate threshold, how many candidate pairs and how many
    distinct documents would be flagged. ONE pass over the LSH-bucketed
    candidate cosines (never all-pairs); the 4-row threshold dim
    cross-joins in broadcast, zero-count thresholds survive via the
    left join from the dim — same frame both engines."""
    cos = _dup_candidate_cosines(spark, sf_dir)
    taus = ", ".join(f"(CAST({t!r} AS DOUBLE))" for t in _SWEEP_TAUS)
    th = spark.sql(f"SELECT * FROM VALUES {taus} AS t(tau)")
    pairs_t = (
        cos.crossJoin(F.broadcast(th))
        .filter(F.col("cosine") >= F.col("tau"))
        .groupBy("tau")
        .agg(F.count("*").alias("np"))
    )
    both = cos.select(
        F.explode(F.array("id_a", "id_b")).alias("vid"), "cosine"
    )
    docs_t = (
        both.crossJoin(F.broadcast(th))
        .filter(F.col("cosine") >= F.col("tau"))
        .groupBy("tau")
        .agg(F.countDistinct("vid").alias("nd"))
    )
    return (
        th.join(pairs_t, "tau", "left")
        .join(docs_t, "tau", "left")
        .select(
            "tau",
            F.coalesce(F.col("np"), F.lit(0)).cast("bigint").alias("n_dup_pairs"),
            F.coalesce(F.col("nd"), F.lit(0)).cast("bigint").alias("n_docs_flagged"),
        )
    )


# --- product quantization: subvector codebook assignment ---------------------
_PQ_SUB = 8  # subspaces (64-dim -> 8 x 8-dim subvectors)
_PQ_CODES = 16  # centroids per subspace (codebook = first 16 corpus vectors)


@query(
    "embed_pq_assign",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    cb AS (SELECT vec_id AS code, pos, v AS cv FROM expl WHERE vec_id < {_PQ_CODES}),
    dist AS (
      SELECT e.vec_id, CAST(e.pos // 8 AS INT) AS subspace, c.code,
             sum(CAST((e.v - c.cv) * (e.v - c.cv) AS DECIMAL(25,12))) AS d2
      FROM expl e JOIN cb c ON e.pos = c.pos
      GROUP BY e.vec_id, subspace, c.code
    ),
    assign AS (
      SELECT vec_id, subspace, code, d2,
             row_number() OVER (PARTITION BY vec_id, subspace
                                ORDER BY d2, code) AS rn
      FROM dist
    )
    SELECT subspace, code,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(CAST(sum(d2) AS DOUBLE), 6) AS distortion
    FROM assign WHERE rn = 1
    GROUP BY subspace, code
    """,
)
def embed_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization, the memory side of billion-scale ANN: each
    vector splits into {_PQ_SUB} subvectors, each assigned to its nearest
    of {_PQ_CODES} codebook centroids (squared-L2, exact quantized-integer
    arithmetic so the argmin ties identically across engines) — compressing
    64 floats to {_PQ_SUB} byte codes. Codebook = first {_PQ_CODES} corpus
    vectors (k-means training is the non-portable piece, as with IVF).

    Since optimization r08 the registered path is the vectorized kernel
    (operators/similarity_ops.pq_assign_vectorized): one mapInPandas corpus
    pass with per-task partial aggregation, bit-identical to the relational
    explode + DECIMAL(25,12) groupBy plan retained below as
    ``_pq_assign_relational`` (equivalence pinned in
    tests/test_similarity_ops.py; oracle parity checked at 3 SFs)."""
    from ..operators.similarity_ops import pq_assign_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_assign_vectorized(emb, _PQ_CODES)


def _pq_assign_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original explode + decimal-fold plan — the semantics contract the
    kernel is tested against (one row per (vec, pos, code) through a
    fact-scale DECIMAL(25,12) aggregation; ~3.3s steady at sf0.1 vs the
    kernel's sub-second)."""
    expl = _exploded(spark, sf_dir)
    cb = expl.filter(F.col("vec_id") < _PQ_CODES).select(
        F.col("vec_id").alias("code"), "pos", F.col("v").alias("cv")
    )
    dist = (
        expl.join(F.broadcast(cb), "pos")
        .groupBy(
            "vec_id",
            F.expr("CAST(pos div 8 AS INT)").alias("subspace"),
            "code",
        )
        .agg(
            F.sum(
                ((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))).cast(
                    "decimal(25,12)"
                )
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "code")
    assign = dist.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return assign.groupBy("subspace", "code").agg(
        F.count("*").alias("n_assigned"),
        F.round(F.sum("d2").cast("double"), 6).alias("distortion"),
    )


@query(
    "embed_pq_search",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    cb AS (SELECT vec_id AS code, pos, v AS cv FROM expl WHERE vec_id < {_PQ_CODES}),
    dist AS (
      SELECT e.vec_id, CAST(e.pos // 8 AS INT) AS subspace, c.code,
             sum(CAST((e.v - c.cv) * (e.v - c.cv) AS DECIMAL(25,12))) AS d2
      FROM expl e JOIN cb c ON e.pos = c.pos
      GROUP BY e.vec_id, subspace, c.code
    ),
    codes AS (
      SELECT vec_id AS cid, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2, code) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS qid, subspace, code, d2 FROM dist
      WHERE vec_id < {_NQ}
    ),
    adc AS (
      SELECT l.qid, c.cid,
             CAST(sum(l.d2) AS DOUBLE) AS adc_d2
      FROM codes c JOIN lut l ON c.subspace = l.subspace AND c.code = l.code
      WHERE c.cid <> l.qid
      GROUP BY l.qid, c.cid
    )
    SELECT qid, cid, round(adc_d2, 6) AS adc_d2, rn FROM (
      SELECT qid, cid, adc_d2,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adc_d2, cid) AS rn
      FROM adc
    ) WHERE rn <= {_TOPK}
    """,
)
def embed_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (ADC) — the query side of
    billion-scale product quantization, completing embed_pq_assign: the
    query's per-(subspace, code) distance table is tiny
    ({_NQ}×{_PQ_SUB}×{_PQ_CODES} entries, closed over), the corpus is
    represented ONLY by its byte codes, and a candidate's approximate
    distance is the sum of 8 table lookups — no corpus float is touched
    at query time. Top-k per query under a (distance, cid) total order.

    Since optimization r08 the registered path is the vectorized kernel
    (operators/similarity_ops.pq_search_vectorized): codes and ADC sums as
    numpy batch ops in one mapInPandas pass, exact quantized-integer
    arithmetic bit-identical to the relational DECIMAL(25,12) plan retained
    as ``_pq_search_relational`` (equivalence pinned in
    tests/test_similarity_ops.py; oracle parity checked at 3 SFs)."""
    from ..operators.similarity_ops import pq_search_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_search_vectorized(emb, _PQ_CODES, _NQ, _TOPK)


def _pq_search_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original explode + decimal-fold ADC plan — the semantics
    contract the kernel is tested against (two fact-scale aggregations and
    a (subspace, code) lookup join; ~3.5s steady at sf0.1)."""
    expl = _exploded(spark, sf_dir)
    cb = expl.filter(F.col("vec_id") < _PQ_CODES).select(
        F.col("vec_id").alias("code"), "pos", F.col("v").alias("cv")
    )
    dist = (
        expl.join(F.broadcast(cb), "pos")
        .groupBy(
            "vec_id",
            F.expr("CAST(pos div 8 AS INT)").alias("subspace"),
            "code",
        )
        .agg(
            F.sum(
                ((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))).cast(
                    "decimal(25,12)"
                )
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "code")
    codes = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("cid"), "subspace", "code")
    )
    lut = dist.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), "subspace", "code", "d2"
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("cid") != F.col("qid"))
        .groupBy("qid", "cid")
        .agg(F.sum("d2").cast("double").alias("adc_d2"))
    )
    # rank on the UNROUNDED distance (as the oracle does), round only the
    # reported value — ordering by the rounded value could resolve
    # sub-1e-6 gaps as ties and diverge on the cid tie-break
    wq = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        adc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _TOPK)
        .select("qid", "cid", N.fround(F.col("adc_d2"), 6).alias("adc_d2"), "rn")
    )


# --- LSH-KNN classifier (SURVEY §2.10 E6: the approximate KNN the model zoo
# lacks a distributed form of) ------------------------------------------------
_KNN_K = 5
_KNN_NTEST = 20

# deterministic train labels from the key (same arithmetic both engines)
_KNN_LABEL_SQL = "CAST((vec_id * 2654435761) % 1000 >= 500 AS INT)"


@query(
    "knn_lsh",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    buckets AS ({_BUCKET_SQL}),
    labels AS (SELECT vec_id, {_KNN_LABEL_SQL} AS label FROM embeddings),
    q AS (SELECT e.vec_id AS qid, e.pos, e.v AS qv, b.bucket
          FROM expl e JOIN buckets b ON e.vec_id = b.vec_id
          WHERE e.vec_id < {_KNN_NTEST}),
    cand AS (
      SELECT q.qid, c.vec_id AS cid, q.pos, q.qv, c.v
      FROM q JOIN expl c ON q.pos = c.pos
      JOIN buckets cb ON c.vec_id = cb.vec_id AND cb.bucket = q.bucket
      WHERE c.vec_id >= {_KNN_NTEST}
    ),
    dots AS (
      SELECT qid, cid,
             CAST(sum(CAST(qv * v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand GROUP BY qid, cid
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    ),
    topk AS (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
      FROM cos
    )
    SELECT t.qid,
           CAST(count(*) AS BIGINT) AS n_neighbors,
           CAST(sum(CAST(l.label AS BIGINT)) AS BIGINT) AS votes_1,
           CAST(2 * sum(l.label) > count(*) AS INT) AS pred
    FROM topk t JOIN labels l ON t.cid = l.vec_id
    WHERE t.rn <= {_KNN_K}
    GROUP BY t.qid
    """,
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed approximate-KNN classification: hyperplane-LSH buckets
    prune the neighbor search to an equi-join on bucket (shuffle linear in
    corpus size, never all-pairs), exact cosine re-ranks within candidates,
    and the top-{_KNN_K} vote decides the class. This is the scale path for
    the reference's sklearn KNeighborsClassifier
    (cross-validation/wine_analysis.py:77-86), which has no distributed
    Spark-ML form. At 100 TB the buckets are the partitioning key; per-query
    state is O(k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )

    def r_col(j: int, pos: F.Column) -> F.Column:
        return ((F.lit(j) * 64 + pos) * 2654435761 % 1000).cast("double") / 1000.0 - 0.5

    def plane_dot(j: int) -> F.Column:
        return _hyperplane_sum(lambda p: r_col(j, p))

    bucket = sum(
        (F.when(plane_dot(j) > 0, F.lit(1 << j)).otherwise(0) for j in range(1, _NPLANES)),
        F.when(plane_dot(0) > 0, F.lit(1)).otherwise(0),
    )
    tagged = withn.withColumn("bucket", bucket).withColumn(
        "label",
        ((F.col("vec_id") * F.lit(2654435761)) % 1000 >= 500).cast("int"),
    )
    test = tagged.filter(F.col("vec_id") < _KNN_NTEST).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
        "bucket",
    )
    train = tagged.filter(F.col("vec_id") >= _KNN_NTEST).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
        "bucket",
        "label",
    )
    cand = train.join(F.broadcast(test), "bucket")
    cos = cand.select(
        "qid",
        "cid",
        "label",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb")) / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    topk = cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KNN_K)
    return topk.groupBy("qid").agg(
        F.count("*").alias("n_neighbors"),
        F.sum(F.col("label").cast("bigint")).alias("votes_1"),
        (2 * F.sum("label") > F.count("*")).cast("int").alias("pred"),
    )


# --- multi-table LSH: the #tables recall axis --------------------------------
# second independent hyperplane family: offset the component index stream so
# table 1's planes are uncorrelated with table 0's (same arithmetic both
# engines, different constants)
def _r2_sql(j: int) -> str:
    return (
        f"(CAST(({j} * 64 + pos + 7777) * 2654435761 % 1000 AS DOUBLE)"
        " / 1000.0 - 0.5)"
    )


_BUCKET2_SQL = f"""
  SELECT vec_id,
         {' + '.join(
           f"(CASE WHEN CAST(sum(CAST(v * {_r2_sql(j)} AS DECIMAL(20,12))) AS DOUBLE) > 0 "
           f"THEN {1 << j} ELSE 0 END)"
           for j in range(_NPLANES))} AS bucket
  FROM expl GROUP BY vec_id
"""


@query(
    "embed_ann_multitable",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    b0 AS ({_BUCKET_SQL}),
    b1 AS ({_BUCKET2_SQL}),
    buckets AS (
      SELECT vec_id, 0 AS tbl, bucket FROM b0
      UNION ALL SELECT vec_id, 1, bucket FROM b1
    ),
    q AS (SELECT e.vec_id AS qid, e.pos, e.v AS qv, b.tbl, b.bucket
          FROM expl e JOIN buckets b ON e.vec_id = b.vec_id
          WHERE e.vec_id < {_NQ}),
    cand AS (
      SELECT DISTINCT q.qid, c.vec_id AS cid
      FROM q JOIN buckets cb ON cb.tbl = q.tbl AND cb.bucket = q.bucket
      JOIN expl c ON c.vec_id = cb.vec_id
      WHERE q.qid <> c.vec_id AND q.pos = 0 AND c.pos = 0
    ),
    dots AS (
      SELECT cd.qid, cd.cid,
             CAST(sum(CAST(qe.v * ce.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand cd
      JOIN expl qe ON qe.vec_id = cd.qid
      JOIN expl ce ON ce.vec_id = cd.cid AND ce.pos = qe.pos
      GROUP BY cd.qid, cd.cid
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    )
    SELECT qid, cid, cosine, rn FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
      FROM cos
    ) WHERE rn <= {_TOPK}
    """,
)
def embed_ann_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table LSH ANN: each vector buckets under TWO independent
    hyperplane families; a candidate qualifies by colliding with the query
    in EITHER table (the union-of-tables OR-construction — each extra
    table multiplies recall's miss rate by the single-table miss
    probability at linear extra cost). Candidates dedup before the exact
    re-rank so no pair is scored twice. This is the #tables axis of the
    LSH recall/cost trade; #hyperplanes (bucket width) is the other, and
    embed_ann_recall measures where the deployment sits."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )

    def plane_dot(j: int, offset: int) -> F.Column:
        def r_col(p: F.Column) -> F.Column:
            return (
                ((F.lit(j) * 64 + p + offset) * 2654435761 % 1000).cast("double")
                / 1000.0
                - 0.5
            )

        return _hyperplane_sum(r_col)

    def bucket_col(offset: int) -> F.Column:
        return sum(
            (
                F.when(plane_dot(j, offset) > 0, F.lit(1 << j)).otherwise(0)
                for j in range(1, _NPLANES)
            ),
            F.when(plane_dot(0, offset) > 0, F.lit(1)).otherwise(0),
        )

    tagged = withn.withColumn("b0", bucket_col(0)).withColumn("b1", bucket_col(7777))
    buckets = tagged.select(
        "vec_id", "embedding", "nrm",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("tbl"), F.col("b0").alias("bucket")),
                F.struct(F.lit(1).alias("tbl"), F.col("b1").alias("bucket")),
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", "nrm", "tb.tbl", "tb.bucket")
    q = buckets.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
        "tbl",
        "bucket",
    )
    c = buckets.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
        "tbl",
        "bucket",
    )
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("qid") != F.col("cid"))
        # OR-construction dedup: a pair colliding in both tables scores once
        .dropDuplicates(["qid", "cid"])
    )
    cos = cand.select(
        "qid",
        "cid",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb")) / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TOPK)


# --- ANN recall: the approximation's error contract, hash-gated --------------
@query(
    "embed_ann_recall",
    oracle=f"""
    WITH exact_topk AS ({_EXACT_TOPK_ORACLE}),
    lsh_topk AS ({_LSH_TOPK_ORACLE})
    SELECT e.qid,
           CAST(count(*) AS BIGINT) AS k,
           CAST(count(l.cid) AS BIGINT) AS n_hit,
           round(CAST(count(l.cid) AS DOUBLE) / count(*), 6) AS recall
    FROM exact_topk e
    LEFT JOIN lsh_topk l ON e.qid = l.qid AND e.cid = l.cid
    GROUP BY e.qid
    """,
)
def embed_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_TOPK} of the LSH ANN against the exact brute force — the
    verified-approximation pattern (scale_ops' HLL/percentile contracts)
    applied to similarity search: the approximation ships WITH its measured
    error, and the oracle hash-gates the recall values themselves, so a
    bucketing regression (bad hyperplanes, over-aggressive pruning) fails
    the correctness gate rather than silently degrading search quality.
    This is the recall harness a production ANN deployment runs on every
    index build, expressed as one join of the two registered queries."""
    exact = embed_cosine_topk(spark, sf_dir).select("qid", "cid")
    lsh = embed_ann_lsh(spark, sf_dir).select(
        F.col("qid").alias("lqid"), F.col("cid").alias("lcid"), F.lit(1).alias("hit")
    )
    joined = exact.join(
        lsh,
        (exact.qid == lsh.lqid) & (exact.cid == lsh.lcid),
        "left",
    )
    return joined.groupBy("qid").agg(
        F.count("*").alias("k"),
        F.count("hit").alias("n_hit"),
        F.round(F.count("hit").cast("double") / F.count("*"), 6).alias("recall"),
    )


# --- vectorized (Arrow) brute-force top-k — the throughput path --------------
@query("embed_cosine_topk_pandas", oracle=_EXACT_TOPK_ORACLE)
def embed_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy-per-Arrow-batch form of embed_cosine_topk, upgraded from
    rows-only to fully oracle-checked: the kernel's exact_int mode performs
    the SAME per-product round(x·y·1e12) integer fold as the decimal oracle
    (similarity_ops._round_half_up_e12 mirrors F.round's HALF_UP), so the
    Python path hash-matches DuckDB bit-for-bit. The float-matmul mode of
    the same operator remains the throughput variant bench.py times;
    float-vs-exact equivalence is asserted in tests/test_similarity_ops.py."""
    from ..operators.similarity_ops import cosine_topk_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_vectorized(emb, n_queries=_NQ, k=_TOPK, exact_int=True)


# --- IVF (inverted-file) ANN: coarse quantizer + cell-restricted search -----
_NCELLS = 8
_NPROBE = 2

# Deterministic coarse centroids: the first _NCELLS corpus vectors. A real
# IVF trains k-means centroids; the cell-assignment / inverted-list /
# nprobe machinery — the part that must scale — is identical, and fixed
# centroids keep the query oracle-checkable (k-means itself is the
# non-portable piece, like every trained model here).
_IVF_ASSIGN_SQL = f"""
  cent AS (SELECT vec_id AS cell, pos, v FROM expl WHERE vec_id < {_NCELLS}),
  cdots AS (
    SELECT e.vec_id, c.cell,
           CAST(sum(CAST(e.v * c.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
    FROM expl e JOIN cent c ON e.pos = c.pos
    GROUP BY e.vec_id, c.cell
  ),
  cnorm AS (SELECT cell, sqrt(CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE)) AS cnrm
            FROM cent GROUP BY cell),
  ccos AS (
    SELECT d.vec_id, d.cell,
           round(d.dot / (n.nrm * cn.cnrm), 6) AS ccos
    FROM cdots d JOIN norms n ON d.vec_id = n.vec_id
                 JOIN cnorm cn ON d.cell = cn.cell
  ),
  ranked_cells AS (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crn
    FROM ccos
  )
"""


@query(
    "embed_ann_ivf",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    {_IVF_ASSIGN_SQL},
    assign AS (SELECT vec_id, cell FROM ranked_cells WHERE crn = 1),
    probes AS (SELECT vec_id AS qid, cell FROM ranked_cells
               WHERE crn <= {_NPROBE} AND vec_id < {_NQ}),
    cand AS (
      SELECT p.qid, a.vec_id AS cid
      FROM probes p JOIN assign a ON p.cell = a.cell
      WHERE p.qid <> a.vec_id
    ),
    dots AS (
      SELECT c.qid, c.cid,
             CAST(sum(CAST(q.v * e.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN expl q ON q.vec_id = c.qid
      JOIN expl e ON e.vec_id = c.cid AND e.pos = q.pos
      GROUP BY c.qid, c.cid
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    )
    SELECT qid, cid, cosine, rn FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
      FROM cos
    ) WHERE rn <= {_TOPK}
    """,
)
def embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: every vector is assigned to its nearest coarse centroid
    (the inverted lists); a query scores only vectors in its {_NPROBE}
    closest cells — ~nprobe/ncells of the corpus. At scale the inverted
    lists are the partitioning key (repartition by cell → each probe is a
    partition-local scan); centroid assignment is one broadcast-join pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )
    cent = withn.filter(F.col("vec_id") < _NCELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    ccos = (
        withn.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "cell",
            N.fround(
                _dec_dot(F.col("embedding"), F.col("cemb"))
                / (F.col("nrm") * F.col("cnrm")),
                6,
            ).alias("ccos"),
        )
    )
    wcell = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    ranked = ccos.withColumn("crn", F.row_number().over(wcell))
    assign = ranked.filter(F.col("crn") == 1).select(
        "vec_id", "cell", "embedding", "nrm"
    )
    probes = ranked.filter((F.col("crn") <= _NPROBE) & (F.col("vec_id") < _NQ)).select(
        F.col("vec_id").alias("qid"),
        "cell",
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
    )
    cand = probes.join(
        assign.select(
            F.col("vec_id").alias("cid"),
            "cell",
            F.col("embedding").alias("cemb"),
            F.col("nrm").alias("nrm_c"),
        ),
        "cell",
    ).filter(F.col("qid") != F.col("cid"))
    cos = cand.select(
        "qid",
        "cid",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb")) / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TOPK)


# New-ingest batch: every 10th vector (excluding the centroid seed rows)
# plays the "today's embeddings" role; the rest are the standing index.
_INCR_BATCH_PRED = f"vec_id % 10 = 7 AND vec_id >= {_NCELLS}"


@query(
    "embed_ann_incremental",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    {_IVF_ASSIGN_SQL},
    probes AS (
      SELECT vec_id AS bid, cell, crn FROM ranked_cells
      WHERE crn <= {_NPROBE} AND ({_INCR_BATCH_PRED})
    ),
    ins AS (SELECT bid, cell AS ins_cell FROM probes WHERE crn = 1),
    standing AS (
      SELECT vec_id AS cid, cell FROM ranked_cells
      WHERE crn = 1 AND NOT ({_INCR_BATCH_PRED})
    ),
    cand AS (
      SELECT p.bid, s.cid FROM probes p JOIN standing s ON p.cell = s.cell
    ),
    dots AS (
      SELECT c.bid, c.cid,
             CAST(sum(CAST(q.v * e.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN expl q ON q.vec_id = c.bid
      JOIN expl e ON e.vec_id = c.cid AND e.pos = q.pos
      GROUP BY c.bid, c.cid
    ),
    cos AS (
      SELECT bid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON bid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    ),
    topk AS (
      SELECT bid, cid, cosine, rn FROM (
        SELECT bid, cid, cosine,
               row_number() OVER (PARTITION BY bid
                                  ORDER BY cosine DESC, cid) AS rn
        FROM cos
      ) WHERE rn <= {_TOPK}
    )
    SELECT t.bid, i.ins_cell, t.cid, t.cosine, t.rn
    FROM topk t JOIN ins i ON t.bid = i.bid
    """,
)
def embed_ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN ingest — the daily-batch shape that never rebuilds
    the standing index (the ANN twin of dedup_incremental_bands): each NEW
    vector is (1) assigned its insertion cell (crn = 1 — the inverted-list
    append a real ingest would perform) and (2) near-dup/neighbor-checked
    against the STANDING corpus only, probing its {_NPROBE} closest cells.
    Standing vectors are never re-scored against each other — per-ingest
    cost is |batch| x probed-list sizes, independent of corpus size.
    At scale the standing lists are partitioned by cell, so each probe is
    a partition-local scan; centroids broadcast. Output: (bid, ins_cell,
    cid, cosine, rn) — the append action and the top-{_TOPK} standing
    neighbors per new vector, exact decimal cosine.

    Since optimization r08 the registered path is the two-kernel vectorized
    form (operators/similarity_ops.incremental_ann_vectorized): one
    mapInPandas corpus pass assigns cells with a quantized matmul (same
    integer arithmetic as _dec_dot), one applyInPandas per probed cell
    scores batch-vs-standing pairs — bit-identical to the crossJoin-fold
    relational plan retained as ``_incremental_relational`` (equivalence
    pinned in tests/test_similarity_ops.py; oracle parity at 3 SFs)."""
    from ..operators.similarity_ops import incremental_ann_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return incremental_ann_vectorized(emb, _NCELLS, _NPROBE, _TOPK)


def _incremental_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original crossJoin + interpreted-fold plan — the semantics
    contract the kernel is tested against (~3.6s steady at sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )
    is_batch = F.expr(_INCR_BATCH_PRED)
    cent = withn.filter(F.col("vec_id") < _NCELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    ccos = withn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "nrm",
        "cell",
        N.fround(
            _dec_dot(F.col("embedding"), F.col("cemb"))
            / (F.col("nrm") * F.col("cnrm")),
            6,
        ).alias("ccos"),
    )
    wcell = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    ranked = ccos.withColumn("crn", F.row_number().over(wcell))
    probes = ranked.filter(is_batch & (F.col("crn") <= _NPROBE)).select(
        F.col("vec_id").alias("bid"),
        "cell",
        "crn",
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
    )
    ins = probes.filter(F.col("crn") == 1).select(
        "bid", F.col("cell").alias("ins_cell")
    )
    standing = ranked.filter((F.col("crn") == 1) & ~is_batch).select(
        F.col("vec_id").alias("cid"),
        "cell",
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
    )
    cos = probes.join(standing, "cell").select(
        "bid",
        "cid",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb"))
            / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("bid").orderBy(F.desc("cosine"), F.asc("cid"))
    topk = cos.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _TOPK
    )
    return topk.join(ins, "bid").select("bid", "ins_cell", "cid", "cosine", "rn")


@query(
    "embed_ivf_cell_stats",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    {_IVF_ASSIGN_SQL},
    assign AS (SELECT vec_id, cell FROM ranked_cells WHERE crn = 1),
    sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members
              FROM assign GROUP BY cell),
    tot AS (SELECT CAST(sum(n_members) AS BIGINT) AS n,
                   CAST(sum(n_members * n_members) AS BIGINT) AS sq,
                   CAST(count(*) AS BIGINT) AS nc
            FROM sizes)
    SELECT s.cell, s.n_members,
           CAST(FLOOR(s.n_members * 1000000.0 / t.n + 0.5) AS BIGINT)
             AS share_ppm,
           CAST(FLOOR(t.nc * t.sq * 1000000.0 / (t.n * t.n) + 0.5) AS BIGINT)
             AS imbalance_ppm
    FROM sizes s CROSS JOIN tot t
    """,
)
def embed_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list balance audit — the pre-flight an operator reads
    BEFORE sizing ncells/nprobe at 100 TB (the ANN twin of
    dedup_bucket_stats): per-cell member counts and shares, plus FAISS's
    imbalance factor ncells·Σsz²/N² (1.0 = perfectly balanced; a skewed
    coarse quantizer makes every probe of the fat cell scan a corpus
    fraction and caps ANN speedup). One groupBy of the assignment — the
    same shuffle the index build itself needs — then a broadcast of the
    two-value total; exact integer arithmetic (ppm units) on both
    engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )
    cent = withn.filter(F.col("vec_id") < _NCELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    ccos = withn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell",
        N.fround(
            _dec_dot(F.col("embedding"), F.col("cemb"))
            / (F.col("nrm") * F.col("cnrm")),
            6,
        ).alias("ccos"),
    )
    wcell = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    assign = (
        ccos.withColumn("crn", F.row_number().over(wcell))
        .filter(F.col("crn") == 1)
        .select("vec_id", "cell")
    )
    sizes = assign.groupBy("cell").agg(F.count("*").alias("n_members"))
    tot = sizes.agg(
        F.sum("n_members").alias("n"),
        F.sum(F.col("n_members") * F.col("n_members")).alias("sq"),
        F.count("*").alias("nc"),
    )
    return sizes.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_members",
        F.expr(
            "CAST(FLOOR(n_members * 1000000.0D / n + 0.5D) AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "CAST(FLOOR(nc * sq * 1000000.0D / (n * n) + 0.5D) AS BIGINT)"
        ).alias("imbalance_ppm"),
    )


@query(
    "embed_norm_audit",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS (
      SELECT vec_id, any_value(dim) AS dim,
             sqrt(CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE)) AS nrm
      FROM (SELECT vec_id, pos, v,
                   count(*) OVER (PARTITION BY vec_id) AS dim
            FROM expl)
      GROUP BY vec_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(dim) AS INT) AS dim_min,
           CAST(max(dim) AS INT) AS dim_max,
           round(min(nrm), 6) AS norm_min,
           round(CAST(sum(CAST(round(nrm, 9) AS DECIMAL(25,12))) AS DOUBLE)
                 / count(*), 6) AS norm_mean,
           round(max(nrm), 6) AS norm_max,
           CAST(sum(CAST(nrm = 0.0 AS BIGINT)) AS BIGINT) AS n_zero_vectors
    FROM norms
    """,
)
def embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column sanity audit before any similarity work: vector
    count, dimension consistency (min/max length — a ragged column breaks
    every kernel downstream), L2-norm distribution, and zero-vector count
    (cosine is undefined on them). One scan; norms come from the exact
    integer-fold dot product, the mean over 9-dp-rounded decimal sums so
    both engines agree bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.select(
        F.size("embedding").alias("dim"),
        F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    return withn.agg(
        F.count("*").alias("n_vectors"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.round(F.min("nrm"), 6).alias("norm_min"),
        F.round(
            F.sum(N.fround(F.col("nrm"), 9).cast("decimal(25,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("norm_mean"),
        F.round(F.max("nrm"), 6).alias("norm_max"),
        F.sum((F.col("nrm") == 0.0).cast("bigint")).alias("n_zero_vectors"),
    )


# --- matryoshka truncation recall audit -------------------------------------
_MRL_DIM = 16  # prefix dims scored in the truncated pass


@query(
    "embed_matryoshka_recall",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    tnorms AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE)) AS nrm
      FROM expl WHERE pos < {_MRL_DIM} GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS qid, pos, v AS qv FROM expl WHERE vec_id < {_NQ}),
    full_top AS (
      SELECT qid, cid FROM (
        SELECT d.qid, d.cid,
               row_number() OVER (
                 PARTITION BY d.qid
                 ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC, d.cid
               ) AS rn
        FROM (
          SELECT q.qid, c.vec_id AS cid,
                 CAST(sum(CAST(q.qv * c.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
          FROM q JOIN expl c ON q.pos = c.pos
          GROUP BY q.qid, c.vec_id
        ) d JOIN norms nq ON d.qid = nq.vec_id
            JOIN norms nc ON d.cid = nc.vec_id
        WHERE d.qid <> d.cid
      ) WHERE rn <= {_TOPK}
    ),
    trunc_top AS (
      SELECT qid, cid FROM (
        SELECT d.qid, d.cid,
               row_number() OVER (
                 PARTITION BY d.qid
                 ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC, d.cid
               ) AS rn
        FROM (
          SELECT q.qid, c.vec_id AS cid,
                 CAST(sum(CAST(q.qv * c.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
          FROM q JOIN expl c ON q.pos = c.pos AND c.pos < {_MRL_DIM}
          WHERE q.pos < {_MRL_DIM}
          GROUP BY q.qid, c.vec_id
        ) d JOIN tnorms nq ON d.qid = nq.vec_id
            JOIN tnorms nc ON d.cid = nc.vec_id
        WHERE d.qid <> d.cid
      ) WHERE rn <= {_TOPK}
    )
    SELECT f.qid,
           CAST(count(t.cid) AS BIGINT) AS n_overlap,
           CAST(count(t.cid) AS DOUBLE) / {_TOPK} AS recall
    FROM full_top f LEFT JOIN trunc_top t
      ON f.qid = t.qid AND f.cid = t.cid
    GROUP BY f.qid
    """,
)
def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: score the exact top-{K} under the
    full {D}-dim embedding and under its first-{M} prefix, and report
    per-query recall of the truncated ranking — the measurement that
    decides how far a matryoshka-trained embedding column can be cut for
    cheap first-stage retrieval before re-ranking with full dims. Both
    passes are the brute-force exact form (this is an audit, run on a
    query SAMPLE, not the serving path); prefix scoring reuses the same
    exploded join with a pos < {M} prune that reaches the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = _exploded(spark, sf_dir)
    texpl = expl.filter(F.col("pos") < _MRL_DIM)

    def _topk(e: DataFrame) -> DataFrame:
        norms = _norms(e)
        q = e.filter(F.col("vec_id") < _NQ).select(
            F.col("vec_id").alias("qid"), "pos", F.col("v").alias("qv")
        )
        dots = (
            q.join(e.withColumnRenamed("vec_id", "cid"), "pos")
            .filter(F.col("qid") != F.col("cid"))
            .groupBy("qid", "cid")
            .agg(
                F.sum(
                    (F.col("qv") * F.col("v")).cast("decimal(20,12)")
                ).cast("double").alias("dot")
            )
        )
        nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nrm_q"))
        nc = norms.select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nrm_c"))
        cos = (
            dots.join(F.broadcast(nq), "qid")
            .join(nc, "cid")
            .select(
                "qid",
                "cid",
                N.fround(
                    F.col("dot") / (F.col("nrm_q") * F.col("nrm_c")), 6
                ).alias("cos"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
        return (
            cos.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOPK)
            .select("qid", "cid")
        )

    full_top = _topk(expl)
    trunc_top = _topk(texpl).withColumnRenamed("cid", "tcid")
    return (
        full_top.join(
            trunc_top,
            (full_top["qid"] == trunc_top["qid"])
            & (full_top["cid"] == trunc_top["tcid"]),
            "left",
        )
        .groupBy(full_top["qid"])
        .agg(
            F.count("tcid").cast("bigint").alias("n_overlap"),
            (F.count("tcid").cast("double") / _TOPK).alias("recall"),
        )
    )


# --- hard-negative mining for contrastive training ---------------------------
_HN_NQ = 25  # anchor set


@query(
    "knn_hard_negatives",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    lab AS (SELECT vec_id, label FROM embeddings),
    q AS (SELECT e.vec_id AS qid, e.pos, e.v AS qv, l.label AS q_label
          FROM expl e JOIN lab l ON e.vec_id = l.vec_id
          WHERE e.vec_id < {_HN_NQ}),
    dots AS (
      SELECT q.qid, any_value(q.q_label) AS q_label, c.vec_id AS cid,
             CAST(sum(CAST(q.qv * c.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM q JOIN expl c ON q.pos = c.pos
      GROUP BY q.qid, c.vec_id
    ),
    cos AS (
      SELECT d.qid, d.q_label, d.cid, cl.label AS neg_label,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots d
      JOIN lab cl ON d.cid = cl.vec_id
      JOIN norms nq ON d.qid = nq.vec_id
      JOIN norms nc ON d.cid = nc.vec_id
      WHERE cl.label <> d.q_label
    )
    SELECT qid, q_label, cid, neg_label, cosine FROM (
      SELECT qid, q_label, cid, neg_label, cosine,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, cid) AS rn
      FROM cos
    ) WHERE rn = 1
    """,
)
def knn_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for each
    anchor vector, the single most-similar corpus vector with a DIFFERENT
    label (the negative that contributes the largest loss gradient).

    Plan: anchors broadcast against one corpus scan (same shape as
    embed_cosine_topk — no posexplode shuffle, corpus never reshuffled);
    the label-mismatch filter runs before ranking, and the final top-1 is
    a window over |anchors| partitions of ≤|corpus| scored rows. At 100 TB
    swap the scored-pair window for the per-partition top-k guard of
    topk_per_group, and the anchor side grows via LSH bucketing
    (embed_ann_lsh) rather than brute force — this exact form is the
    verification baseline the ANN variant is recalled against.

    Since optimization r08 the registered path is the vectorized kernel
    (operators/similarity_ops.knn_hard_negatives_vectorized): one
    mapInPandas corpus pass, per-batch quantized matmul + best-per-anchor,
    bit-identical to the crossJoin fold retained as
    ``_knn_hard_negatives_relational`` (equivalence pinned in
    tests/test_similarity_ops.py; oracle parity at 3 SFs)."""
    from ..operators.similarity_ops import knn_hard_negatives_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_hard_negatives_vectorized(emb, _HN_NQ)


def _knn_hard_negatives_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original broadcast-crossJoin + interpreted-fold plan — the
    semantics contract the kernel is tested against (~1.7s steady at
    sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )
    q = withn.filter(F.col("vec_id") < _HN_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
    )
    c = withn.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neg_label") != F.col("q_label")
    )
    cos = pairs.select(
        "qid",
        "q_label",
        "cid",
        "neg_label",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb"))
            / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        cos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- per-label centroid drift audit ------------------------------------------
@query(
    "embed_label_centroid_drift",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    lab AS (SELECT vec_id, label FROM embeddings),
    e AS (SELECT l.label, x.pos, x.v FROM expl x JOIN lab l
          ON x.vec_id = l.vec_id),
    cl AS (
      SELECT label, pos,
             CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS m
      FROM e GROUP BY label, pos
    ),
    gl AS (
      SELECT pos, CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS m
      FROM e GROUP BY pos
    ),
    dots AS (
      SELECT c.label,
             CAST(sum(CAST(c.m * g.m AS DECIMAL(30,15))) AS DOUBLE) AS dot,
             CAST(sum(CAST(c.m * c.m AS DECIMAL(30,15))) AS DOUBLE) AS cc,
             CAST(sum(CAST(g.m * g.m AS DECIMAL(30,15))) AS DOUBLE) AS gg
      FROM cl c JOIN gl g ON c.pos = g.pos
      GROUP BY c.label
    ),
    sizes AS (SELECT label, count(*) AS n_vecs FROM lab GROUP BY label)
    SELECT d.label, s.n_vecs,
           round(dot / sqrt(cc * gg), 6) AS cos_to_global
    FROM dots d JOIN sizes s ON d.label = s.label
    """,
)
def embed_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus drift audit: cosine between each label's centroid
    and the global centroid — the per-slice distribution check run before
    training on a new corpus snapshot (a label whose centroid swings away
    from global signals ingestion or upstream-model drift).

    Scale shape: centroids are per-(label, pos) decimal-mean aggregates —
    one map-side-combined pass over the exploded vectors, output bounded
    by |labels| x dim; the cosine then runs entirely on centroid tables
    (the fact is touched once). Decimal sums keep the means and products
    order-independent; cosines round at 6dp."""
    expl = _exploded(spark, sf_dir)
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    e = expl.join(lab, "vec_id").select("label", "pos", "v")
    cl = e.groupBy("label", "pos").agg(
        F.expr(
            "CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS m"
        )
    )
    gl = e.groupBy("pos").agg(
        F.expr(
            "CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS gm"
        )
    )
    dots = (
        cl.join(F.broadcast(gl), "pos")
        .groupBy("label")
        .agg(
            F.expr("CAST(sum(CAST(m * gm AS DECIMAL(30,15))) AS DOUBLE) AS dot"),
            F.expr("CAST(sum(CAST(m * m AS DECIMAL(30,15))) AS DOUBLE) AS cc"),
            F.expr("CAST(sum(CAST(gm * gm AS DECIMAL(30,15))) AS DOUBLE) AS gg"),
        )
    )
    sizes = lab.groupBy("label").agg(F.expr("count(*) AS n_vecs"))
    return (
        dots.join(F.broadcast(sizes), "label")
        .selectExpr("label", "n_vecs", "round(dot / sqrt(cc * gg), 6) AS cos_to_global")
    )


# --- LSH-bucket outlier audit ------------------------------------------------
_OUT_K = 10


@query(
    "embed_bucket_outliers",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    buckets AS ({_BUCKET_SQL}),
    e AS (SELECT b.bucket, x.vec_id, x.pos, x.v
          FROM expl x JOIN buckets b ON x.vec_id = b.vec_id),
    cent AS (
      SELECT bucket, pos,
             CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS m
      FROM e GROUP BY bucket, pos
    ),
    dots AS (
      SELECT e.vec_id, e.bucket,
             CAST(sum(CAST(e.v * c.m AS DECIMAL(30,15))) AS DOUBLE) AS dot,
             CAST(sum(CAST(e.v * e.v AS DECIMAL(30,15))) AS DOUBLE) AS vv,
             CAST(sum(CAST(c.m * c.m AS DECIMAL(30,15))) AS DOUBLE) AS mm
      FROM e JOIN cent c ON e.bucket = c.bucket AND e.pos = c.pos
      GROUP BY e.vec_id, e.bucket
    )
    SELECT vec_id, bucket, round(dot / sqrt(vv * mm), 6) AS cos_c
    FROM dots
    ORDER BY cos_c ASC, vec_id LIMIT {_OUT_K}
    """,
)
def embed_bucket_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit: the {_OUT_K} vectors least aligned
    with their own LSH bucket's centroid — mis-embedded or out-of-
    distribution points that pollute dedup/ANN buckets (the cheap LOF
    stand-in that needs no per-point kNN).

    Scale shape: buckets come from the fixed sign-bit hyperplanes
    (embed_ann_lsh's), centroids are per-(bucket, dim) decimal means —
    one pass over the exploded vectors, |buckets| x dim output — and the
    per-vector cosine joins centroid rows back by (bucket, pos): shuffle
    keys are (bucket, pos)/(vec_id), never a pair explosion. Final
    bottom-k compiles to TakeOrderedAndProject."""
    expl = _exploded(spark, sf_dir)

    def r_col(j: int) -> F.Column:
        return ((F.lit(j) * 64 + F.col("pos")) * 2654435761 % 1000).cast(
            "double"
        ) / 1000.0 - 0.5

    bucket_terms = [
        F.when(
            F.sum((F.col("v") * r_col(j)).cast("decimal(20,12)")).cast("double") > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j in range(_NPLANES)
    ]
    buckets = expl.groupBy("vec_id").agg(
        sum(bucket_terms[1:], bucket_terms[0]).alias("bucket")
    )
    e = expl.join(buckets, "vec_id")
    cent = e.groupBy("bucket", "pos").agg(
        F.expr("CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS m")
    )
    dots = (
        e.join(cent, ["bucket", "pos"])
        .groupBy("vec_id", "bucket")
        .agg(
            F.expr("CAST(sum(CAST(v * m AS DECIMAL(30,15))) AS DOUBLE) AS dot"),
            F.expr("CAST(sum(CAST(v * v AS DECIMAL(30,15))) AS DOUBLE) AS vv"),
            F.expr("CAST(sum(CAST(m * m AS DECIMAL(30,15))) AS DOUBLE) AS mm"),
        )
    )
    return (
        dots.selectExpr("vec_id", "bucket", "round(dot / sqrt(vv * mm), 6) AS cos_c")
        .orderBy(F.asc("cos_c"), F.asc("vec_id"))
        .limit(_OUT_K)
    )


# --- Johnson-Lindenstrauss projection distortion audit -----------------------
_JL_K = 16


def _jl_sign_sql(j: int) -> str:
    # deterministic +-1 entry for (projection row j, input pos)
    return f"(CAST(({j} * 64 + pos) * 2654435761 % 2 AS INT) * 2 - 1)"


@query(
    "embed_jl_projection_audit",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    lab AS (SELECT vec_id, label FROM embeddings),
    proj AS (
      SELECT vec_id,
             {', '.join(
               f"CAST(sum(CAST(v * {_jl_sign_sql(j)} AS DECIMAL(20,12))) "
               f"AS DOUBLE) AS p{j}" for j in range(_JL_K))},
             CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE) AS vv
      FROM expl GROUP BY vec_id
    ),
    ratio AS (
      SELECT p.vec_id, l.label,
             round(({' + '.join(
               f"CAST(p{j} * p{j} AS DECIMAL(30,15))" for j in range(_JL_K))})
                   / ({_JL_K} * CAST(p.vv AS DECIMAL(30,15))), 8) AS r
      FROM proj p JOIN lab l ON p.vec_id = l.vec_id
    )
    SELECT label, count(*) AS n_vecs,
           round(CAST(sum(CAST(r AS DECIMAL(20,8))) AS DOUBLE)
                 / count(*), 6) AS mean_ratio,
           round(min(r), 6) AS min_ratio,
           round(max(r), 6) AS max_ratio
    FROM ratio GROUP BY label
    """,
)
def embed_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit: project every 64-dim vector
    to {_JL_K} dims with a deterministic ±1 matrix and report the
    norm-preservation ratio ‖Rv‖²/(k‖v‖²) per label (≈1 with JL-bounded
    spread — the check run before swapping full embeddings for projected
    ones in ANN/dedup to cut shuffle width 4x).

    Exactness: projections are decimal-summed (order-independent), the
    ratio is decimal arithmetic with one rounding at 8dp per vector, then
    decimal-mean per label.

    Since optimization r08 the fact-scale projection pass is the vectorized
    kernel (operators/similarity_ops.jl_projections_vectorized): one int64
    matmul per Arrow batch replaces the {_JL_K}+1 per-element decimal
    aggregates over the exploded vectors, bit-identical by the same
    quantized-integer contract as _dec_dot (equivalence pinned in
    tests/test_similarity_ops.py; oracle parity at 3 SFs). The per-vector
    decimal ratio and per-label rollup stay relational — their DECIMAL
    division/rounding semantics are what the oracle matches."""
    from ..operators.similarity_ops import jl_projections_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    proj = jl_projections_vectorized(emb, _JL_K)
    sq = " + ".join(f"CAST(p{j} * p{j} AS DECIMAL(30,15))" for j in range(_JL_K))
    ratio = proj.selectExpr(
        "label",
        f"round(({sq}) / ({_JL_K} * CAST(vv AS DECIMAL(30,15))), 8) AS r",
    )
    return ratio.groupBy("label").agg(
        F.expr("count(*) AS n_vecs"),
        F.expr(
            "round(CAST(sum(CAST(r AS DECIMAL(20,8))) AS DOUBLE)"
            " / count(*), 6) AS mean_ratio"
        ),
        F.expr("CAST(round(min(r), 6) AS DOUBLE) AS min_ratio"),
        F.expr("CAST(round(max(r), 6) AS DOUBLE) AS max_ratio"),
    )


def _jl_projections_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original exploded decimal-aggregate projection pass (vec_id,
    label, p0..p{k-1}, vv) — the semantics contract
    jl_projections_vectorized is tested against."""
    expl = _exploded(spark, sf_dir)
    proj_aggs = [
        F.expr(
            f"CAST(sum(CAST(v * (CAST(({j} * 64 + pos) * 2654435761 % 2 AS INT)"
            f" * 2 - 1) AS DECIMAL(20,12))) AS DOUBLE) AS p{j}"
        )
        for j in range(_JL_K)
    ]
    proj = expl.groupBy("vec_id").agg(
        *proj_aggs,
        F.expr("CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DOUBLE) AS vv"),
    )
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cols = ["vec_id", "label"] + [f"p{j}" for j in range(_JL_K)] + ["vv"]
    return proj.join(lab, "vec_id").select(*cols)


# --- LSH tuning curve: bucket stats per plane count --------------------------
_TUNE_PLANES = (2, 3, 4)


def _tune_bucket_sql(np_: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN CAST(sum(CAST(v * {_r_sql(j)} AS DECIMAL(20,12))) "
        f"AS DOUBLE) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(np_)
    )
    return f"SELECT vec_id, {terms} AS bucket FROM expl GROUP BY vec_id"


@query(
    "embed_lsh_tuning_curve",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    {', '.join(f"b{np_} AS ({_tune_bucket_sql(np_)})" for np_ in _TUNE_PLANES)},
    {', '.join(
      f"s{np_} AS (SELECT bucket, CAST(count(*) AS BIGINT) AS sz FROM b{np_}"
      f" GROUP BY bucket)" for np_ in _TUNE_PLANES)},
    u AS (
      {' UNION ALL '.join(
        f"SELECT {np_} AS n_planes, count(*) AS n_buckets,"
        f" CAST(max(sz) AS BIGINT) AS max_bucket,"
        f" CAST(sum(sz * (sz - 1)) AS BIGINT) AS pair_probes,"
        f" CAST(sum(sz) AS BIGINT) AS n_vecs"
        f" FROM s{np_}" for np_ in _TUNE_PLANES)}
    )
    SELECT n_planes, n_buckets, max_bucket,
           CAST(pair_probes * 1000 // n_vecs AS BIGINT)
             AS avg_candidates_x1000
    FROM u
    """,
)
def embed_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN tuning curve: for each hyperplane count, the bucket population
    stats that determine the LSH cost/recall trade — bucket count, max
    bucket size (skew), and the average candidate count a query probes
    (Σ sz·(sz−1)/N, milli-units). Doubling planes should ~halve
    candidates; this is the table that picks embed_ann_lsh's
    {_NPLANES}-plane setting and decides when to add OR-tables
    (embed_ann_multitable).

    Scale shape: the candidate workload comes from bucket-size moments
    only — no pair join materializes anywhere; one exploded-vector pass
    per plane count (the sign-bit aggregates share the scan shape)."""
    expl = _exploded(spark, sf_dir)

    def r_col(j: int) -> F.Column:
        return ((F.lit(j) * 64 + F.col("pos")) * 2654435761 % 1000).cast(
            "double"
        ) / 1000.0 - 0.5

    frames = []
    for np_ in _TUNE_PLANES:
        terms = [
            F.when(
                F.sum((F.col("v") * r_col(j)).cast("decimal(20,12)")).cast(
                    "double"
                )
                > 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j in range(np_)
        ]
        b = expl.groupBy("vec_id").agg(
            sum(terms[1:], terms[0]).alias("bucket")
        )
        s = b.groupBy("bucket").agg(F.expr("CAST(count(*) AS BIGINT) AS sz"))
        frames.append(
            s.agg(
                F.expr(f"{np_} AS n_planes"),
                F.expr("count(*) AS n_buckets"),
                F.expr("CAST(max(sz) AS BIGINT) AS max_bucket"),
                F.expr("CAST(sum(sz * (sz - 1)) AS BIGINT) AS pair_probes"),
                F.expr("CAST(sum(sz) AS BIGINT) AS n_vecs"),
            )
        )
    from functools import reduce

    u = reduce(DataFrame.unionByName, frames)
    return u.selectExpr(
        "n_planes",
        "n_buckets",
        "max_bucket",
        "CAST(pair_probes * 1000 div n_vecs AS BIGINT) AS avg_candidates_x1000",
    )


# --- per-vector standardization (layernorm-prep) audit -----------------------
@query(
    "embed_standardize_audit",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    pv AS (
      SELECT vec_id,
             CAST(count(*) AS DOUBLE) AS d,
             CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) AS s,
             CAST(sum(CAST(v * v AS DECIMAL(30,15))) AS DOUBLE) AS ss
      FROM expl GROUP BY vec_id
    ),
    lab AS (SELECT vec_id, label FROM embeddings),
    st AS (
      SELECT l.label,
             round(p.s / p.d, 8) AS mu,
             round(sqrt(greatest(p.ss / p.d - (p.s / p.d) * (p.s / p.d),
                                 1e-15)), 8) AS sigma
      FROM pv p JOIN lab l ON p.vec_id = l.vec_id
    )
    SELECT label, count(*) AS n_vecs,
           round(CAST(sum(CAST(mu AS DECIMAL(20,8))) AS DOUBLE) / count(*), 6)
             AS mean_mu,
           round(CAST(sum(CAST(sigma AS DECIMAL(20,8))) AS DOUBLE)
                 / count(*), 6) AS mean_sigma,
           CAST(sum(CAST(abs(mu) > 0.25 AS INT)) AS BIGINT) AS n_off_center
    FROM st GROUP BY label
    """,
)
def embed_standardize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector standardization audit (the layernorm-prep check): each
    embedding's across-dimension mean and sigma, rolled up per label —
    mean_mu far from 0 or wildly varying sigma flags vectors that need
    per-vector normalization before cosine/ANN work treats them
    comparably. One pass over the exploded vectors; per-vector moments
    decimal-summed, 8dp-rounded before the decimal label means; the
    1e-15 variance clip absorbs constant vectors."""
    expl = _exploded(spark, sf_dir)
    pv = expl.groupBy("vec_id").agg(
        F.expr("CAST(count(*) AS DOUBLE) AS d"),
        F.expr("CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE) AS s"),
        F.expr("CAST(sum(CAST(v * v AS DECIMAL(30,15))) AS DOUBLE) AS ss"),
    )
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    st = pv.join(lab, "vec_id").selectExpr(
        "label",
        N.spark_fround("s / d", 8) + " AS mu",
        N.spark_fround("sqrt(greatest(ss / d - (s / d) * (s / d), 1e-15))", 8)
        + " AS sigma",
    )
    return st.groupBy("label").agg(
        F.expr("count(*) AS n_vecs"),
        F.expr(
            "round(CAST(sum(CAST(mu AS DECIMAL(20,8))) AS DOUBLE)"
            " / count(*), 6) AS mean_mu"
        ),
        F.expr(
            "round(CAST(sum(CAST(sigma AS DECIMAL(20,8))) AS DOUBLE)"
            " / count(*), 6) AS mean_sigma"
        ),
        F.expr("CAST(sum(CAST(abs(mu) > 0.25D AS INT)) AS BIGINT) AS n_off_center"),
    )


# --- IVF+PQ composed search: the FAISS IVFADC shape ---------------------------
@query(
    "embed_ann_ivfpq",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    {_IVF_ASSIGN_SQL},
    assign AS (SELECT vec_id, cell FROM ranked_cells WHERE crn = 1),
    probes AS (SELECT vec_id AS qid, cell FROM ranked_cells
               WHERE crn <= {_NPROBE} AND vec_id < {_NQ}),
    cand AS (
      SELECT p.qid, a.vec_id AS cid
      FROM probes p JOIN assign a ON p.cell = a.cell
      WHERE p.qid <> a.vec_id
    ),
    cb AS (SELECT vec_id AS code, pos, v AS cv FROM expl WHERE vec_id < {_PQ_CODES}),
    pqd AS (
      SELECT e.vec_id, CAST(e.pos // 8 AS INT) AS subspace, c.code,
             sum(CAST((e.v - c.cv) * (e.v - c.cv) AS DECIMAL(25,12))) AS d2
      FROM expl e JOIN cb c ON e.pos = c.pos
      GROUP BY e.vec_id, subspace, c.code
    ),
    codes AS (
      SELECT vec_id AS cid, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2, code) AS rn
        FROM pqd
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS qid, subspace, code, d2 FROM pqd WHERE vec_id < {_NQ}
    ),
    adc AS (
      SELECT cd.qid, cd.cid, CAST(sum(l.d2) AS DOUBLE) AS adc_d2
      FROM cand cd
      JOIN codes c ON c.cid = cd.cid
      JOIN lut l ON l.qid = cd.qid AND l.subspace = c.subspace
                AND l.code = c.code
      GROUP BY cd.qid, cd.cid
    )
    SELECT qid, cid, round(adc_d2, 6) AS adc_d2, rn FROM (
      SELECT qid, cid, adc_d2,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adc_d2, cid) AS rn
      FROM adc
    ) WHERE rn <= {_TOPK}
    """,
)
def embed_ann_ivfpq(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """IVF + PQ composed — FAISS's IVFADC, the production billion-scale
    index, assembled from the repo's two halves: coarse IVF cells prune the
    corpus to {nprobe}/{ncells} of its cells (embed_ann_ivf), and within
    the probed cells candidate distance is PQ asymmetric lookup — the sum
    of 8 per-subspace table entries against the query's LUT, touching NO
    corpus floats at query time (embed_pq_search). At scale: inverted
    lists partition by cell, the codebook and per-query LUT broadcast
    (nq x 8 x {codes} entries), and per-partition only ≤ topk candidates
    per query survive — nothing quadratic, nothing nested-loop.

    Since optimization r08 BOTH paths are the one-pass vectorized kernel
    (operators/similarity_ops.ivfpq_vectorized): cell argmax, PQ code
    argmin and ADC lookup-sum as numpy batch ops, with every product
    quantized by the same e12 half-away rule the DECIMAL(2x,12) casts
    apply, so the result is bit-identical to the relational decimal plan —
    retained below as ``_ivfpq_relational`` and pinned by
    tests/test_similarity_ops.py::test_ivfpq_fast_variant_matches_exact
    (oracle parity checked at 3 SFs). The ``exact`` kwarg is kept for the
    bench-variant call contract; both values now run the same kernel."""
    from ..operators.similarity_ops import ivfpq_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_vectorized(
        emb,
        ncells=_NCELLS,
        nprobe=_NPROBE,
        nq=_NQ,
        pq_codes=_PQ_CODES,
        topk=_TOPK,
    )


def _ivfpq_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original explode + decimal-fold IVFADC plan — the semantics
    contract ivfpq_vectorized is tested against (~3.6s steady at sf0.1)."""
    dec20 = "decimal(20,12)"
    dec25 = "decimal(25,12)"
    expl = _exploded(spark, sf_dir)
    norms = _norms(expl)
    cent = expl.filter(F.col("vec_id") < _NCELLS).select(
        F.col("vec_id").alias("cell"), "pos", F.col("v").alias("cv")
    )
    cdots = (
        expl.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cell")
        .agg(
            F.sum((F.col("v") * F.col("cv")).cast(dec20))
            .cast("double")
            .alias("dot")
        )
    )
    cnorm = cent.groupBy("cell").agg(
        F.sqrt(
            F.sum((F.col("cv") * F.col("cv")).cast(dec20)).cast("double")
        ).alias("cnrm")
    )
    ccos = (
        cdots.join(norms, "vec_id")
        .join(F.broadcast(cnorm), "cell")
        .select(
            "vec_id",
            "cell",
            N.fround(F.col("dot") / (F.col("nrm") * F.col("cnrm")), 6).alias("ccos"),
        )
    )
    wcell = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    ranked = ccos.withColumn("crn", F.row_number().over(wcell))
    assign = ranked.filter(F.col("crn") == 1).select(
        F.col("vec_id").alias("cid"), "cell"
    )
    probes = ranked.filter(
        (F.col("crn") <= _NPROBE) & (F.col("vec_id") < _NQ)
    ).select(F.col("vec_id").alias("qid"), "cell")
    # probes is bounded by the QUERY set (nq x nprobe rows), not the corpus
    # — broadcast it so the corpus-scale assign side is neither shuffled
    # nor sorted (was a SortMergeJoin with an exchange on every assign row;
    # optimization r07, guide §3.1)
    cand = (
        F.broadcast(probes)
        .join(assign, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    cb = expl.filter(F.col("vec_id") < _PQ_CODES).select(
        F.col("vec_id").alias("code"), "pos", F.col("v").alias("cv")
    )
    pqd = (
        expl.join(F.broadcast(cb), "pos")
        .groupBy(
            "vec_id", F.expr("CAST(pos div 8 AS INT)").alias("subspace"), "code"
        )
        .agg(
            F.sum(
                ((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))).cast(
                    dec25
                )
            ).alias("d2")
        )
    )
    wsub = Window.partitionBy("vec_id", "subspace").orderBy("d2", "code")
    codes = (
        pqd.withColumn("rn", F.row_number().over(wsub))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("cid"), "subspace", "code")
    )
    lut = pqd.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), "subspace", "code", "d2"
    )
    adc = (
        # both sides are corpus-scale (cand ~ probed-cell members, codes =
        # 8 rows/vec) so neither is broadcastable; shuffle_hash skips the
        # two per-partition sorts a sort-merge would add (guide §3.1)
        cand.join(codes.hint("shuffle_hash"), "cid")
        .join(F.broadcast(lut), ["qid", "subspace", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("d2").cast("double").alias("adc_d2"))
    )
    wq = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        adc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _TOPK)
        .select("qid", "cid", N.fround(F.col("adc_d2"), 6).alias("adc_d2"), "rn")
    )


# --- PQ codebook training: one exact Lloyd refinement ------------------------
@query(
    "embed_pq_train",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    cb AS (SELECT vec_id AS code, pos, v AS cv FROM expl WHERE vec_id < {_PQ_CODES}),
    dist AS (
      SELECT e.vec_id, CAST(e.pos // 8 AS INT) AS subspace, c.code,
             sum(CAST((e.v - c.cv) * (e.v - c.cv) AS DECIMAL(25,12))) AS d2
      FROM expl e JOIN cb c ON e.pos = c.pos
      GROUP BY e.vec_id, subspace, c.code
    ),
    assign AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2, code) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    newc AS (
      SELECT a.subspace, a.code, e.pos,
             CAST(sum(CAST(e.v AS DECIMAL(25,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS nv
      FROM assign a JOIN expl e
        ON a.vec_id = e.vec_id AND a.subspace = CAST(e.pos // 8 AS INT)
      GROUP BY a.subspace, a.code, e.pos
    )
    SELECT n.subspace, n.code,
           CAST(count(*) AS BIGINT) AS n_dims,
           round(sqrt(CAST(sum(CAST((n.nv - c.cv) * (n.nv - c.cv)
                                    AS DECIMAL(30,15))) AS DOUBLE)), 6)
             AS movement
    FROM newc n JOIN cb c ON n.pos = c.pos AND n.code = c.code
    GROUP BY n.subspace, n.code
    ORDER BY n.subspace, n.code
    """,
)
def embed_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd refinement of the PQ codebook — the training step
    ``embed_pq_assign`` seeds (its docstring calls k-means training the
    non-portable piece; this makes the refinement itself portable):
    assign every subvector to its nearest seed centroid (same exact
    decimal argmin as the assign query), recompute each (subspace, code)
    centroid as the exact decimal mean of its members per dimension, and
    report how far every centroid moved (L2 over the subspace's
    dimensions) — the convergence signal a PQ build monitors per
    iteration.

    Scale shape: codebook broadcasts into the one corpus-explode scan;
    assignment and the recompute are map-side-combined aggregations keyed
    by (vec_id, subspace) then (subspace, code, pos) — no all-pairs
    work, shuffles bounded by corpus x subspaces. Determinism: member
    sums are decimal-exact, the mean is one IEEE division, movement sums
    the 8 per-dimension squared deltas through decimal before one sqrt.

    Since optimization r08 the fact-scale 2/3 (assignment + member sums) is
    the vectorized kernel operators/similarity_ops.pq_train_partials_vectorized
    — per-task partial (n, Σ CAST(v AS DECIMAL(25,12))) statistics whose
    Spark-side decimal sum is exact and associative, hence bit-equal to the
    relational member aggregation retained as ``_pq_train_relational``
    (equivalence pinned in tests/test_similarity_ops.py; oracle parity at
    3 SFs). The tiny ({_PQ_CODES}×64-row) movement stage stays relational."""
    from ..operators.similarity_ops import pq_train_partials_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    part = pq_train_partials_vectorized(emb, _PQ_CODES)
    newc = (
        part.groupBy("code", "pos")
        .agg(F.expr("CAST(sum(vsum) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS nv"))
        .withColumn("subspace", F.expr("CAST(pos div 8 AS INT)"))
    )
    expl = _exploded(spark, sf_dir)
    cb = expl.filter(F.col("vec_id") < _PQ_CODES).select(
        F.col("vec_id").alias("code"), "pos", F.col("v").alias("cv")
    )
    return (
        newc.join(F.broadcast(cb), ["pos", "code"])
        .groupBy("subspace", "code")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_dims"),
            F.expr(
                "round(sqrt(CAST(sum(CAST((nv - cv) * (nv - cv)"
                " AS DECIMAL(30,15))) AS DOUBLE)), 6) AS movement"
            ),
        )
        .orderBy("subspace", "code")
    )


def _pq_train_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original explode + decimal-fold Lloyd step — the semantics
    contract the kernel is tested against (~3.8s steady at sf0.1)."""
    expl = _exploded(spark, sf_dir)
    cb = expl.filter(F.col("vec_id") < _PQ_CODES).select(
        F.col("vec_id").alias("code"), "pos", F.col("v").alias("cv")
    )
    dist = (
        expl.join(F.broadcast(cb), "pos")
        .groupBy(
            "vec_id",
            F.expr("CAST(pos div 8 AS INT)").alias("subspace"),
            "code",
        )
        .agg(
            F.sum(
                ((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))).cast(
                    "decimal(25,12)"
                )
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "code")
    assign = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "subspace", "code")
    )
    members = assign.join(
        expl.withColumn("subspace", F.expr("CAST(pos div 8 AS INT)")),
        ["vec_id", "subspace"],
    )
    newc = members.groupBy("subspace", "code", "pos").agg(
        F.expr(
            "CAST(sum(CAST(v AS DECIMAL(25,12))) AS DOUBLE)"
            " / CAST(count(*) AS DOUBLE) AS nv"
        )
    )
    return (
        newc.join(F.broadcast(cb), ["pos", "code"])
        .groupBy("subspace", "code")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_dims"),
            F.expr(
                "round(sqrt(CAST(sum(CAST((nv - cv) * (nv - cv)"
                " AS DECIMAL(30,15))) AS DOUBLE)), 6) AS movement"
            ),
        )
        .orderBy("subspace", "code")
    )


# --- binary (sign-bit) quantization + Hamming shortlist + exact rerank -------
_BQ_SHORTLIST = 16
_BQ_TOPK = 5


@query(
    "embed_binary_quantize_hamming",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    q AS (SELECT vec_id AS qid, pos, v AS qv FROM expl WHERE vec_id < {_NQ}),
    ham AS (
      SELECT q.qid, c.vec_id AS cid,
             CAST(sum(CASE WHEN (q.qv >= 0) <> (c.v >= 0) THEN 1 ELSE 0 END)
                  AS BIGINT) AS hamming
      FROM q JOIN expl c ON q.pos = c.pos
      WHERE c.vec_id <> q.qid
      GROUP BY q.qid, c.vec_id
    ),
    cand AS (
      SELECT qid, cid, hamming FROM (
        SELECT qid, cid, hamming,
               row_number() OVER (PARTITION BY qid ORDER BY hamming, cid) AS rn
        FROM ham
      ) WHERE rn <= {_BQ_SHORTLIST}
    ),
    dots AS (
      SELECT cand.qid, cand.cid, cand.hamming,
             CAST(sum(CAST(q.qv * c.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand
      JOIN q ON q.qid = cand.qid
      JOIN expl c ON c.vec_id = cand.cid AND c.pos = q.pos
      GROUP BY cand.qid, cand.cid, cand.hamming
    ),
    cos AS (
      SELECT qid, cid, hamming,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    )
    SELECT qid, cid, hamming, cosine, rn FROM (
      SELECT qid, cid, hamming, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
               AS rn
      FROM cos
    ) WHERE rn <= {_BQ_TOPK}
    """,
)
def embed_binary_quantize_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization ANN: each embedding collapses to its sign bits
    (1 bit per dimension, a 32x memory cut — the standard first-stage filter
    in production vector search); candidates are shortlisted per query by
    Hamming distance on those bits (integer arithmetic, exact in any
    engine), then the shortlist alone is reranked by exact cosine. The
    two-stage shape is the point: the expensive float kernel touches
    SHORTLIST << corpus rows per query.

    Exactness: Hamming is a pure integer fold (no floats to tame); the
    rerank reuses the decimal dot-product fold (_dec_dot), so every stage
    is bit-equal to the oracle.

    Scale shape: the corpus is scanned once against broadcast queries (the
    same no-explode shape as embed_cosine_topk); at 100 TB the sign bits
    pack into 1-2 bigints per vector (persisted alongside the parquet), the
    Hamming fold becomes bit_count(a XOR b) per word, and the shortlist
    stage prunes with an LSH/IVF bucket join first — this query pins the
    two-stage semantics those variants must preserve.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    withn = emb.withColumn(
        "nrm", F.sqrt(_dec_dot(F.col("embedding"), F.col("embedding")))
    )
    q = withn.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("nrm_q"),
    )
    c = withn.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("nrm_c"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("cid"))
    ham = F.aggregate(
        F.zip_with(
            F.col("qemb"),
            F.col("cemb"),
            lambda x, y: ((x >= 0) != (y >= 0)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    shortlisted = (
        pairs.withColumn("hamming", ham)
        .withColumn(
            "srn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("hamming", "cid")
            ),
        )
        .filter(F.col("srn") <= _BQ_SHORTLIST)
    )
    cos = shortlisted.select(
        "qid",
        "cid",
        "hamming",
        N.fround(
            _dec_dot(F.col("qemb"), F.col("cemb"))
            / (F.col("nrm_q") * F.col("nrm_c")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _BQ_TOPK
    )


# --- multi-probe LSH: probe the least-confident neighboring bucket -----------
# Single-table hyperplane LSH recovers recall by probing MORE buckets per
# query instead of building more tables (Lv et al., multi-probe LSH): the
# query's strongest miss candidates live in the bucket reached by flipping
# the sign bit whose hyperplane margin is smallest. T=2 probes (home bucket
# + least-confident flip) at 4 planes scores ~2/16 of the corpus per query
# — half the tables a 2-table scheme would need for similar recall.


def _mp_flip_mask_sql() -> str:
    """CASE expression: 1 << argmin_j |m_j| with smallest-index tie-break —
    identical literal form in both engines (no engine-specific shift op)."""
    conds = []
    for j in range(_NPLANES):
        others = [k for k in range(_NPLANES) if k != j]
        cond = " AND ".join(f"abs(m{j}) <= abs(m{k})" for k in others)
        conds.append(f"WHEN {cond} THEN {1 << j}")
    return "CASE " + " ".join(conds) + " ELSE 1 END"


_MP_MARGINS_SQL = f"""
  SELECT vec_id,
         {', '.join(
           f"CAST(sum(CAST(v * {_r_sql(j)} AS DECIMAL(20,12))) AS DOUBLE)"
           f" AS m{j}"
           for j in range(_NPLANES))}
  FROM expl GROUP BY vec_id
"""


@query(
    "embed_ann_multiprobe",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    norms AS ({_NORMS_SQL}),
    marg AS ({_MP_MARGINS_SQL}),
    buckets AS (
      SELECT vec_id,
             {' + '.join(
               f"(CASE WHEN m{j} > 0 THEN {1 << j} ELSE 0 END)"
               for j in range(_NPLANES))} AS bucket,
             {_mp_flip_mask_sql()} AS fmask
      FROM marg
    ),
    q AS (
      SELECT vec_id AS qid, bucket,
             bucket + fmask - 2 * (bucket & fmask) AS bucket2
      FROM buckets WHERE vec_id < {_NQ}
    ),
    cand AS (
      SELECT q.qid, cb.vec_id AS cid
      FROM q JOIN buckets cb
        ON cb.bucket = q.bucket OR cb.bucket = q.bucket2
      WHERE q.qid <> cb.vec_id
    ),
    dots AS (
      SELECT c.qid, c.cid,
             CAST(sum(CAST(qe.v * ce.v AS DECIMAL(20,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN expl qe ON qe.vec_id = c.qid
      JOIN expl ce ON ce.vec_id = c.cid AND ce.pos = qe.pos
      GROUP BY c.qid, c.cid
    ),
    cos AS (
      SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON qid = nq.vec_id
                JOIN norms nc ON cid = nc.vec_id
    )
    SELECT qid, cid, cosine, rn FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
               AS rn
      FROM cos
    ) WHERE rn <= {_TOPK}
    """,
)
def embed_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane LSH top-k (Lv et al. 2007): each query scores
    its home bucket AND the bucket across its least-confident hyperplane
    (smallest |margin| sign flip), recovering most of the recall a second
    hash table would buy without storing one. Margins fall out of the same
    decimal plane-dot aggregate that signs the bucket, so the probe set
    costs nothing extra at index time.

    Scale shape: bucketing is one map-side-combined aggregate per vector
    (margins and bucket in the same pass); the two probes are TWO bucket
    equi-joins (expressed as a union in Spark — never an OR-join on the
    fact side), candidates are exact-reranked with one decimal dot per
    (query, candidate), and per-query top-k is a window over each query's
    own candidates. Probe fan-out is 2/2^{_NPLANES} of the corpus per
    query by construction."""
    expl = _exploded(spark, sf_dir)
    norms = _norms(expl)

    def r_col(j: int) -> F.Column:
        return ((F.lit(j) * 64 + F.col("pos")) * 2654435761 % 1000).cast(
            "double"
        ) / 1000.0 - 0.5

    marg = expl.groupBy("vec_id").agg(
        *[
            F.sum((F.col("v") * r_col(j)).cast("decimal(20,12)"))
            .cast("double")
            .alias(f"m{j}")
            for j in range(_NPLANES)
        ]
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN m{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_NPLANES)
    )
    buckets = marg.selectExpr(
        "vec_id",
        f"{bucket_expr} AS bucket",
        f"{_mp_flip_mask_sql()} AS fmask",
    )
    q = buckets.filter(F.col("vec_id") < _NQ).selectExpr(
        "vec_id AS qid",
        "bucket",
        "bucket + fmask - 2 * (bucket & fmask) AS bucket2",
    )
    cb = buckets.select(F.col("vec_id").alias("cid"), F.col("bucket").alias("cb"))
    # two equi-joins, not an OR-join: each probe is a proper shuffle-hash
    # key; a vector lives in exactly one bucket and the two probe buckets
    # differ, so the union is disjoint — no dedup pass needed.
    cand = (
        q.select("qid", F.col("bucket").alias("pb"))
        .join(cb, F.col("pb") == F.col("cb"))
        .unionByName(
            q.select("qid", F.col("bucket2").alias("pb")).join(
                cb, F.col("pb") == F.col("cb")
            )
        )
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    qe = expl.select(F.col("vec_id").alias("qid"), "pos", F.col("v").alias("qv"))
    ce = expl.select(F.col("vec_id").alias("cid"), "pos", F.col("v").alias("cv"))
    dots = (
        cand.join(qe, "qid")
        .join(ce, ["cid", "pos"])
        .groupBy("qid", "cid")
        .agg(
            F.sum((F.col("qv") * F.col("cv")).cast("decimal(20,12)"))
            .cast("double")
            .alias("dot")
        )
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nrm_q"))
    nc = norms.select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nrm_c"))
    cos = (
        dots.join(F.broadcast(nq), "qid")
        .join(nc, "cid")
        .select(
            "qid",
            "cid",
            N.fround(
                F.col("dot") / (F.col("nrm_q") * F.col("nrm_c")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _TOPK
    )


# --- per-dimension variance audit (dead-dimension pruning) -------------------
@query(
    "embed_dim_variance_audit",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    stats AS (
      SELECT pos, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS DECIMAL(20,12))) AS DECIMAL(38,12)) AS s,
             CAST(sum(CAST(v * v AS DECIMAL(20,12))) AS DECIMAL(38,12)) AS ss
      FROM expl GROUP BY pos
    ),
    pv AS (
      SELECT CAST(pos AS INT) AS pos, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
             (CAST(ss AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE) AS var_v
      FROM stats
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_dims,
             CAST(sum(CAST(round(var_v, 9) AS DECIMAL(25,12))) AS DOUBLE)
               AS total_var
      FROM pv
    )
    SELECT pos, n, round(mean_v, 6) AS mean_v, round(var_v, 6) AS var_v,
           CAST(var_v * CAST(n_dims AS DOUBLE) * 10.0 < total_var AS INT)
             AS low_var_flag
    FROM pv, tot
    """,
)
def embed_dim_variance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding column with a
    dead-dimension flag (variance below 10% of the across-dims average) —
    the audit run before storage-cutting tricks (matryoshka truncation,
    PQ subspace splits, int8 ranges) that all silently assume every
    dimension carries signal.

    Scale shape: one posexplode scan compressed map-side to the
    dimension-bounded stats table; per-dim moments are exact DECIMAL
    sums, the across-dims total averages 9dp-rounded decimal variances
    (order-free — the same trick as embed_norm_audit's norm_mean), and
    the flag is one identical double comparison."""
    expl = _exploded(spark, sf_dir)
    stats = expl.groupBy("pos").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(20,12)"))
        .cast("decimal(38,12)")
        .alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(20,12)"))
        .cast("decimal(38,12)")
        .alias("ss"),
    )
    pv = stats.select(
        F.col("pos").cast("int").alias("pos"),
        "n",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mean_v"),
        (
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double")
                * F.col("s").cast("double")
                / F.col("n").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("var_v"),
    )
    tot = pv.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.sum(N.fround(F.col("var_v"), 9).cast("decimal(25,12)"))
        .cast("double")
        .alias("total_var"),
    )
    return pv.crossJoin(F.broadcast(tot)).select(
        "pos",
        "n",
        F.round("mean_v", 6).alias("mean_v"),
        F.round("var_v", 6).alias("var_v"),
        (
            F.col("var_v") * F.col("n_dims").cast("double") * 10.0
            < F.col("total_var")
        )
        .cast("int")
        .alias("low_var_flag"),
    )


# --- nearest-centroid (Rocchio) classifier evaluation --------------------------
# The simplest embedding classifier — per-class mean vectors, assign by
# nearest centroid — is the standard probe for "are these embeddings
# linearly separable at all?" before training anything. Train and eval on
# the full table (resubstitution — the capacity of a 10-centroid model is
# low enough that this is the conventional quick read).
@query(
    "rocchio_centroid_eval",
    oracle=f"""
    WITH expl AS ({_EXPL_SQL}),
    lab AS (SELECT vec_id, label FROM embeddings),
    cent AS (
      SELECT l.label AS c, e.pos,
             CAST(sum(CAST(e.v AS DECIMAL(20,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS m
      FROM expl e JOIN lab l ON e.vec_id = l.vec_id
      GROUP BY l.label, e.pos
    ),
    d2 AS (
      SELECT e.vec_id, c.c,
             CAST(sum(CAST(round((e.v - c.m) * (e.v - c.m), 12)
                           AS DECIMAL(25,14))) AS DOUBLE) AS dist2
      FROM expl e JOIN cent c ON e.pos = c.pos
      GROUP BY e.vec_id, c.c
    ),
    best AS (
      SELECT vec_id, min(dist2) AS bd FROM d2 GROUP BY vec_id
    ),
    pred AS (
      SELECT d2.vec_id, CAST(min(d2.c) AS INT) AS pred
      FROM d2 JOIN best ON d2.vec_id = best.vec_id AND d2.dist2 = best.bd
      GROUP BY d2.vec_id
    )
    SELECT CAST(l.label AS INT) AS label, p.pred,
           CAST(count(*) AS BIGINT) AS n
    FROM pred p JOIN lab l ON p.vec_id = l.vec_id
    GROUP BY l.label, p.pred
    """,
)
def rocchio_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification of the embedding table
    against its own labels, emitted as the confusion matrix — the
    capacity-1 linear-separability probe run before any classifier
    training. Centroids are exact decimal per-(class, dim) means; each
    squared-difference term quantizes to 12dp DECIMAL before the per-pair
    sum (order-free), so the argmin (tie-break: smallest class) is
    engine-stable.

    Scale shape: one explode scan to (class x dim) centroid stats
    (bounded), one broadcast join back (centroid table is class x dim
    rows), per-vector distance reduction partitioned by vec_id —
    vectors never pair with vectors."""
    expl = _exploded(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    lab = emb.select("vec_id", "label")
    cent = (
        expl.join(lab, "vec_id")
        .groupBy(F.col("label").alias("c"), "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(20,12)")).cast("double")
                / F.count("*").cast("double")
            ).alias("m")
        )
    )
    d2 = (
        expl.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c")
        .agg(
            F.sum(
                N.fround(
                    (F.col("v") - F.col("m")) * (F.col("v") - F.col("m")), 12
                ).cast("decimal(25,14)")
            )
            .cast("double")
            .alias("dist2")
        )
    )
    best = d2.groupBy("vec_id").agg(F.min("dist2").alias("bd"))
    pred = (
        d2.join(best, "vec_id")
        .filter(F.col("dist2") == F.col("bd"))
        .groupBy("vec_id")
        .agg(F.min("c").cast("int").alias("pred"))
    )
    return (
        pred.join(lab, "vec_id")
        .groupBy(F.col("label").cast("int").alias("label"), "pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
