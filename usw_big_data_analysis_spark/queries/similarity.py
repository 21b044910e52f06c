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
    """Exact (order-independent) dot product: per-element double products
    cast to decimal, folded with exact decimal addition."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(20,12)")
    )
    # re-cast keeps the accumulator type fixed (Spark decimal addition widens
    # precision); scale 12 is preserved, so the fold stays exact
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    ).cast("double")


# --- brute-force cosine top-k ------------------------------------------------
@query(
    "embed_cosine_topk",
    oracle=f"""
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
    """,
)
def embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast the query vectors against the corpus and fold each pair's
    dot product as an array aggregate — no explode, no per-element shuffle;
    the corpus is scanned once. (The posexploded form this replaced shuffles
    |corpus|x64 rows.) Decimal fold keeps it bit-equal to the oracle."""
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
        F.round(
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


@query(
    "embed_ann_lsh",
    oracle=f"""
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
    """,
)
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
            F.round(F.col("dot") / (F.col("nrm_q") * F.col("nrm_c")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TOPK)
