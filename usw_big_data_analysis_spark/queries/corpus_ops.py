"""Corpus-preparation operators over `documents` (extension family: the
LLM-training-data steps that sit between raw crawl and tokenizer): PII
redaction, fixed-size chunking with overlap, per-source mixture quota
sampling, hash-Bernoulli downsampling, and an ORC sink/scan roundtrip for
format coverage.

Determinism: the "random" choices are md5-derived integer hashes (the
engine-portable seeded RNG, same idiom as queries/dedup.py); chunk
boundaries are pure integer arithmetic; the PII fixture is synthesized
deterministically from doc_id so the redaction check is non-vacuous on the
fixture corpus (whose text contains no natural PII).

Scale notes (100 TB):
- text_pii_scrub / doc_chunk_fixed: narrow per-row transforms — zero
  shuffles; chunk explode multiplies rows ~len/stride with no exchange.
- mixture_quota: the only window partitions by source; with few huge
  sources the hash-order rank is the skew case — the documented swap is a
  two-phase per-source top-k (TakeOrderedAndProject per salt then merge).
- doc_sample_hash: embarrassingly parallel filter, no shuffle, no RNG
  state — the Bernoulli form that survives any partitioning/retry regime.
- sink_orc_roundtrip: columnar ORC with the same predicate/column pushdown
  contract as parquet.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ._shared import process_tmp as _process_tmp
from ..sources import load_table
from .dedup import _h_spark, _h_sql

_TMP = _process_tmp()

# --- deterministic PII fixture + redaction ----------------------------------
# Fixture text has no natural PII, so append a synthetic email + phone derived
# from doc_id — then the scrub provably removes exactly what was injected.
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "\\+[0-9]+-[0-9]+-[0-9]+"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@mail.com or +1-555-', CAST(doc_id AS VARCHAR)) AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
           length(t) - length(regexp_replace(regexp_replace(t,
             '{_EMAIL_RE}', '', 'g'), '{_PHONE_RE}', '', 'g')) AS n_pii_chars
    FROM dirty
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, phone numbers) — the compliance scrub
    every training corpus passes through. JVM-side regexp_replace (no
    Python in the row path); patterns restricted to the regex subset with
    identical semantics in Java regex and DuckDB's RE2. Also reports how
    many characters were redacted per doc."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.com or +1-555-"),
            F.col("doc_id").cast("string"),
        ).alias("t"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    strip = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, ""), _PHONE_RE, ""
    )
    return dirty.select(
        "doc_id",
        scrub.alias("clean"),
        (F.length("t") - F.length(strip)).alias("n_pii_chars"),
    )


# --- fixed-size chunking with overlap ---------------------------------------
_CHUNK = 200
_STRIDE = 160  # 40-char overlap


@query(
    "doc_chunk_fixed",
    oracle=f"""
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS INT) AS chunk_idx,
           substr(text, s, {_CHUNK}) AS chunk,
           length(substr(text, s, {_CHUNK})) AS chunk_len
    FROM documents,
         unnest(generate_series(1, greatest(length(text), 1), {_STRIDE}))
           AS t(s)
    """,
)
def doc_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding fixed-size chunking ({_CHUNK} chars, {_CHUNK - _STRIDE}
    overlap) — the context-window packing step before tokenization. Pure
    integer substring arithmetic via sequence+explode: a narrow per-row
    blowup of ~len/stride with ZERO shuffles; chunk boundaries are
    engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    starts = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_STRIDE))
    ).alias("s")
    return docs.select("doc_id", "text", starts).select(
        "doc_id",
        ((F.col("s") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
        F.expr(f"substr(text, s, {_CHUNK})").alias("chunk"),
        F.length(F.expr(f"substr(text, s, {_CHUNK})")).alias("chunk_len"),
    )


# --- per-source mixture quota sampling --------------------------------------
_QUOTA = 25


@query(
    "mixture_quota",
    oracle=f"""
    SELECT source, doc_id, rn FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_h_sql("concat('mx:', CAST(doc_id AS VARCHAR))")},
                        doc_id) AS rn
      FROM documents)
    WHERE rn <= {_QUOTA}
    """,
)
def mixture_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: an exact quota of {_QUOTA} docs per
    source, chosen by md5-hash order — a deterministic uniform draw that
    needs no RNG state and is stable under reshuffling/retries. The window
    partitions by source; for few-huge-source skew the documented swap is
    per-salt top-k + merge (operators/skew.py)."""
    docs = load_table(spark, sf_dir, "documents")
    h = _h_spark(F.concat(F.lit("mx:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QUOTA)
    )


# --- hash-Bernoulli downsampling --------------------------------------------
_KEEP_PCT = 25


@query(
    "doc_sample_hash",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE {_h_sql("concat('smp:', CAST(doc_id AS VARCHAR))")} % 100 < {_KEEP_PCT}
    """,
)
def doc_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KEEP_PCT}% corpus downsample by md5 hash — the shuffle-free,
    state-free Bernoulli sample (same rows kept regardless of partitioning,
    executor count, or task retries; `sample()`'s seeded RNG guarantees
    none of that across engines or cluster layouts)."""
    docs = load_table(spark, sf_dir, "documents")
    h = _h_spark(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    return docs.filter(h % 100 < _KEEP_PCT).select("doc_id", "source")


# --- ORC sink/scan roundtrip ------------------------------------------------
@query(
    "sink_orc_roundtrip",
    oracle="""
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the per-source document profile to ORC and read it back —
    format coverage for Spark's second native columnar format (same
    pushdown/pruning contract as parquet). The oracle states the roundtrip
    is lossless by recomputing from the source table."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    path = os.path.join(_TMP, "usw_q_sink_orc")
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


# --- edit-distance-1 entity resolution (deletion-neighborhood blocking) -----
@query(
    "fuzzy_join_names",
    oracle="""
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a, customer b
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: all customer-name pairs within edit distance 1, via
    DELETION-NEIGHBORHOOD blocking — each name joins on its ~len single-
    deletion variants (+ itself), so any distance-1 pair (substitution,
    insert, delete) shares a block; candidates then verify with the exact
    levenshtein filter. Spark runs the scalable blocked plan
    (O(n·len) variant rows, equi-join, verify); the oracle brute-forces
    the O(n²) cross join — independent formulations, same exact pairs.
    The classic near-dup entity-resolution shape for training-data
    identity hygiene."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.concat(
                F.array(F.col("c_name")),  # the name itself (insert/delete pairs)
                F.expr(
                    "transform(sequence(1, length(c_name)), i -> "
                    "concat(substr(c_name, 1, i - 1), substr(c_name, i + 1)))"
                ),
            )
        ).alias("block"),
    ).distinct()
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("a_key"),
            F.col("b.c_custkey").alias("b_key"),
            F.col("a.c_name").alias("a_name"),
            F.col("b.c_name").alias("b_name"),
        )
        .distinct()
    )
    return cand.select(
        "a_key",
        "b_key",
        F.levenshtein("a_name", "b_name").alias("dist"),
    ).filter(F.col("dist") <= 1)


# --- inverted index build ----------------------------------------------------
_POSTINGS_CAP = 20


@query(
    "inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT token, count(*) AS df,
           array_to_string(
             list_transform(
               (list(doc_id ORDER BY doc_id))[1:{_POSTINGS_CAP}],
               x -> CAST(x AS VARCHAR)), ',') AS postings
    FROM tok WHERE token <> '' GROUP BY token
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency + the first
    {cap} postings as a sorted CSV (the capped posting-list page an IR /
    retrieval layer materializes). (doc_id, token) distincts map-side
    before the token shuffle; the per-token collect is bounded by the cap
    after sorting — the documented 100 TB swap is bucketed posting-list
    pages rather than one row per token.""".format(cap=_POSTINGS_CAP)
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    return tok.groupBy("token").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",",
            F.expr(
                f"transform(slice(array_sort(collect_list(doc_id)), 1, "
                f"{_POSTINGS_CAP}), x -> cast(x as string))"
            ),
        ).alias("postings"),
    )


# --- composed end-to-end training-mix pipeline ------------------------------
_MIX_QUOTA = 40


@query(
    "pipeline_training_mix",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, source, text FROM documents WHERE lang = 'en'
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source,
             any_value(text) AS text
      FROM gated GROUP BY md5(text)
    ),
    chunks AS (
      SELECT doc_id, source,
             CAST((s - 1) // {_STRIDE} AS INT) AS chunk_idx,
             substr(text, s, {_CHUNK}) AS chunk
      FROM deduped,
           unnest(generate_series(1, greatest(length(text), 1), {_STRIDE}))
             AS t(s)
    ),
    ranked AS (
      SELECT source, doc_id, chunk_idx,
             length(chunk) - length(replace(chunk, ' ', '')) + 1 AS n_tokens,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_h_sql(
                 "concat(CAST(doc_id AS VARCHAR), '#', CAST(chunk_idx AS VARCHAR))"
               )},
               doc_id, chunk_idx) AS rn
      FROM chunks
    )
    SELECT source, doc_id, chunk_idx, n_tokens, rn
    FROM ranked WHERE rn <= {_MIX_QUOTA}
    """,
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus pipeline as ONE query plan: language gate →
    exact dedup (md5 grouping, keep min doc_id — dedup BEFORE chunking so
    duplicate docs don't multiply) → fixed-size chunking → md5-ordered
    per-source quota of {quota} chunks → whitespace token counts per
    surviving chunk. Every stage is the registered operator's logic
    inlined into a single Catalyst plan — the filters and the dedup
    aggregate run before the chunk explode, so the expensive blowup only
    sees surviving documents. This is the end-to-end shape a training-mix
    builder runs nightly.""".format(quota=_MIX_QUOTA)
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(F.col("lang") == "en").select("doc_id", "source", "text")
    # min_by keeps the min-doc_id's source: any_value(source) would be
    # nondeterministic when identical texts appear under different sources.
    # text is identical across the md5 group, so any_value(text) is safe.
    deduped = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(source, doc_id)").alias("source"),
        F.any_value("text").alias("text"),
    )
    chunks = deduped.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_STRIDE)
            )
        ).alias("s"),
        "text",
    ).select(
        "doc_id",
        "source",
        ((F.col("s") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
        F.expr(f"substr(text, s, {_CHUNK})").alias("chunk"),
    )
    h = _h_spark(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit("#"),
            F.col("chunk_idx").cast("string"),
        )
    )
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"), F.col("chunk_idx"))
    ranked = chunks.select(
        "source",
        "doc_id",
        "chunk_idx",
        (
            F.length("chunk") - F.length(F.replace(F.col("chunk"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_tokens"),
        F.row_number().over(w).alias("rn"),
    )
    return ranked.filter(F.col("rn") <= _MIX_QUOTA)


# --- int8 embedding quantization --------------------------------------------
@query(
    "embed_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings
    )
    SELECT vec_id, CAST(maxabs AS DOUBLE) AS maxabs,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(CASE WHEN maxabs = 0 THEN 0
                  ELSE floor(CAST(x AS DOUBLE) * 127.0 / maxabs) END
                  AS BIGINT) AS VARCHAR)), ',') AS q_csv
    FROM m
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization (absmax scaling) of the embedding
    column — the 4x vector-store compression step. All arithmetic is one
    widening cast + one multiply + one divide + floor per element, every
    step IEEE-deterministic (floor, not round: both engines floor doubles
    identically; .5-boundary rounding modes never enter). Zero vectors
    quantize to zeros. Narrow per-row transform — no shuffle, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = emb.withColumn(
        "maxabs",
        F.array_max(
            F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
        ),
    )
    q = F.transform(
        F.col("embedding"),
        lambda x: F.when(F.col("maxabs") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(x.cast("double") * F.lit(127.0) / F.col("maxabs")).cast(
                "bigint"
            )
        )
        .cast("string"),
    )
    return m.select(
        "vec_id",
        F.col("maxabs").cast("double").alias("maxabs"),
        F.concat_ws(",", q).alias("q_csv"),
    )


# --- weighted corpus sampling (priority sampling) ---------------------------
_PRI_K = 200


@query(
    "sample_weighted_priority",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           CAST(n_chars AS DOUBLE)
             / CAST({_h_sql("concat('pri:', CAST(doc_id AS VARCHAR))")} + 1
                    AS DOUBLE) AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT {_PRI_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield/Lund/Thorup): each doc draws priority = w/u with u a
    content-free md5-derived uniform and w = n_chars; the global top-k by
    priority is a weighted sample whose inclusion probability ∝ weight.
    Hash-derived u makes the draw deterministic under any partitioning,
    retry, or engine (no RNG state); the top-k compiles to
    TakeOrderedAndProject — per-partition heaps + a driver merge of k·P
    rows, never a global sort. The w/u division is one IEEE double op
    written identically in the oracle, so order (and the emitted priority)
    is bit-stable cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    u = _h_spark(F.concat(F.lit("pri:"), F.col("doc_id").cast("string")))
    pri = (F.col("n_chars").cast("double") / (u + 1).cast("double")).alias(
        "priority"
    )
    return (
        docs.select("doc_id", "source", "n_chars", pri)
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(_PRI_K)
    )


# --- token-budgeted corpus selection ----------------------------------------
_BUDGET_FRAC = 0.4
_BUD_BUCKETS = 64  # top-6 hash bits: bucket order == hash order


@query(
    "mixture_token_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             {_h_sql("concat('bud:', CAST(doc_id AS VARCHAR))")} AS h
      FROM documents
    ),
    b AS (
      SELECT source,
             CAST(floor({_BUDGET_FRAC} * CAST(sum(n_chars) AS DOUBLE))
                  AS BIGINT) AS budget
      FROM documents GROUP BY source
    ),
    c AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    )
    SELECT c.source, b.budget AS budget_chars,
           count(*) AS n_kept,
           CAST(sum(c.n_chars) AS BIGINT) AS chars_kept
    FROM c JOIN b ON c.source = b.source
    WHERE c.cum <= b.budget
    GROUP BY c.source, b.budget
    """,
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted corpus selection: each source greedily fills a
    per-source character budget ({FRAC} of its total) in deterministic
    hash order — the mixture-construction step that caps every source's
    contribution before training. The oracle's per-source ordered window
    is the semantics; the Spark plan is the scalable two-phase prefix sum
    (per-(source, hash-bucket) subtotals → offsets over the tiny bucket
    table → bucket-PARTITIONED in-bucket cumsum), so no per-source
    single-partition sort of the corpus exists — the same pattern as
    operators/rank_ops.py. Bucket = top hash bits, so bucket order is
    hash order and the two phases reconstruct the exact running sum."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    h = _h_spark(F.concat(F.lit("bud:"), F.col("doc_id").cast("string")))
    d = docs.withColumn("h", h).withColumn(
        "bkt", F.floor(F.col("h") / F.lit(2**60 // _BUD_BUCKETS))
    )
    budgets = docs.groupBy("source").agg(
        F.floor(F.lit(_BUDGET_FRAC) * F.sum("n_chars").cast("double"))
        .cast("bigint")
        .alias("budget")
    )
    # phase 1: per-(source, bucket) subtotals; offsets over the tiny table
    sub = d.groupBy("source", "bkt").agg(F.sum("n_chars").alias("sub"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = sub.withColumn("off", F.coalesce(F.sum("sub").over(w_off), F.lit(0)))
    # phase 2: in-bucket cumsum, bucket-partitioned
    w_in = (
        Window.partitionBy("source", "bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        d.join(off.select("source", "bkt", "off"), ["source", "bkt"])
        .withColumn("cum", F.col("off") + F.sum("n_chars").over(w_in))
    )
    return (
        cum.join(F.broadcast(budgets), "source")
        .filter(F.col("cum") <= F.col("budget"))
        .groupBy("source", F.col("budget").alias("budget_chars"))
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
    )


# --- epochs-per-source plan under a token budget -----------------------------
_EP_BUDGET = 200_000  # target training tokens
_EP_ALPHA_NUM, _EP_ALPHA_DEN = 7, 10  # temperature 0.7 as a rational


@query(
    "mixture_epochs_plan",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_tok,
             round(exp(round(ln(CAST(n_tok AS DOUBLE)), 8)
                       * {_EP_ALPHA_NUM} / {_EP_ALPHA_DEN}), 8) AS wgt
      FROM tok
    ),
    t AS (SELECT sum(CAST(wgt AS DECIMAL(25,8))) AS wsum FROM w)
    SELECT w.source, w.n_tok,
           CAST(round(CAST(w.wgt AS DOUBLE) / CAST(t.wsum AS DOUBLE)
                      * {_EP_BUDGET}) AS BIGINT) AS budget_tok,
           round(CAST(round(CAST(w.wgt AS DOUBLE) / CAST(t.wsum AS DOUBLE)
                            * {_EP_BUDGET}) AS BIGINT)
                 / CAST(w.n_tok AS DOUBLE), 6) AS epochs
    FROM w CROSS JOIN t
    """,
)
def mixture_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing epoch plan: temperature-reweight source sizes
    (w = n^0.7 — the n^alpha upsampling rule), allocate the token budget
    proportionally, and report how many EPOCHS of each source that
    implies (epochs > 1 ⇒ the source repeats; the over-epoching audit
    run before a training mix is frozen).

    Exactness: token counts are integers; n^0.7 = exp(0.7·ln n) with the
    8dp-rounded ln/exp convention, weights decimal-summed; the final
    budget split is one shared double tree. One token-count shuffle; all
    planning on the |sources| table."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.expr("CAST(sum(size(split(text, ' '))) AS BIGINT) AS n_tok")
    )
    w = tok.selectExpr(
        "source",
        "n_tok",
        f"round(exp(round(ln(CAST(n_tok AS DOUBLE)), 8)"
        f" * {_EP_ALPHA_NUM} / {_EP_ALPHA_DEN}), 8) AS wgt",
    )
    t = w.agg(F.expr("sum(CAST(wgt AS DECIMAL(25,8))) AS wsum"))
    return w.crossJoin(F.broadcast(t)).selectExpr(
        "source",
        "n_tok",
        f"CAST(round(CAST(wgt AS DOUBLE) / CAST(wsum AS DOUBLE)"
        f" * {_EP_BUDGET}) AS BIGINT) AS budget_tok",
        f"round(CAST(round(CAST(wgt AS DOUBLE) / CAST(wsum AS DOUBLE)"
        f" * {_EP_BUDGET}) AS BIGINT) / CAST(n_tok AS DOUBLE), 6) AS epochs",
    )


# --- context-window overflow audit -------------------------------------------
_CTX_SIZES = (32, 64, 128, 256)


@query(
    "doc_length_overflow",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           {', '.join(
             f"CAST(sum(CAST(n_tok > {c} AS INT)) * 1000000 // count(*) "
             f"AS BIGINT) AS over_{c}_ppm" for c in _CTX_SIZES)}
    FROM tok GROUP BY source
    """,
)
def doc_length_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window overflow audit: per source, the ppm share of
    documents longer than each candidate context size — the table that
    decides chunking policy (doc_chunk_fixed) and window length before a
    training run. One map-side-combined aggregate over token counts;
    integer ppm output."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.selectExpr(
        "source", "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok"
    )
    return tok.groupBy("source").agg(
        F.expr("count(*) AS n_docs"),
        *[
            F.expr(
                f"CAST(sum(CAST(n_tok > {c} AS INT)) * 1000000"
                f" div count(*) AS BIGINT) AS over_{c}_ppm"
            )
            for c in _CTX_SIZES
        ],
    )


# --- the shipping manifest: what actually goes to training -------------------
@query(
    "training_data_manifest",
    oracle="""
    WITH exact_w AS (
      SELECT md5(text) AS h, min(doc_id) AS keeper FROM documents
      GROUP BY md5(text)
    ),
    kept AS (
      SELECT d.doc_id, d.source, d.lang,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
      FROM documents d
      JOIN exact_w w ON md5(d.text) = w.h AND d.doc_id = w.keeper
      WHERE d.lang = 'en' AND len(string_split(d.text, ' ')) >= 10
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(min(n_tok) AS BIGINT) AS min_tok,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) * 1000000
                // sum(sum(n_tok)) OVER () AS BIGINT) AS token_share_ppm
    FROM kept GROUP BY source
    """,
)
def training_data_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shipping manifest: per source, exactly what survives the
    baseline hygiene gates (language = en, length >= 10 tokens, exact
    dedup keep-min) with document/token counts, length envelope, and
    each source's token share of the final mix — the one table a
    training run records next to its data card. One composed Catalyst
    plan: exact-winner min aggregate, gate filters in the scan
    projection, a single rollup; the share uses a window over the
    |sources| aggregate (bounded)."""
    docs = load_table(spark, sf_dir, "documents")
    exact_w = docs.groupBy(F.md5("text").alias("h")).agg(
        F.expr("min(doc_id) AS keeper")
    )
    kept = (
        docs.withColumn("h", F.md5("text"))
        .join(exact_w, "h")
        .filter("doc_id = keeper")
        .filter("lang = 'en' AND size(split(text, ' ')) >= 10")
        .selectExpr(
            "doc_id", "source",
            "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok",
        )
    )
    per_src = kept.groupBy("source").agg(
        F.expr("count(*) AS n_docs"),
        F.expr("CAST(sum(n_tok) AS BIGINT) AS n_tokens"),
        F.expr("CAST(min(n_tok) AS BIGINT) AS min_tok"),
        F.expr("CAST(max(n_tok) AS BIGINT) AS max_tok"),
    )
    tot = per_src.agg(F.expr("CAST(sum(n_tokens) AS BIGINT) AS total_tok"))
    return per_src.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_docs",
        "n_tokens",
        "min_tok",
        "max_tok",
        "CAST(n_tokens * 1000000 div total_tok AS BIGINT) AS token_share_ppm",
    )


# --- composite document quality score ----------------------------------------
@query(
    "doc_quality_score_composite",
    oracle="""
    WITH f AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_types,
             CAST(lang = 'en' AS INT) AS is_en
      FROM documents
    ),
    sc AS (
      SELECT source,
             CAST(least(n_tok, 50) * 40 // 50
                  + (n_types * 100 // n_tok) * 40 // 100
                  + is_en * 20 AS BIGINT) AS score
      FROM f
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CAST(score >= 60 AS INT)) AS BIGINT) AS n_pass,
           CAST(sum(score) AS BIGINT) AS score_sum
    FROM sc GROUP BY source
    """,
)
def doc_quality_score_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 0-100 document quality score — 40 points for length (to
    a 50-token cap), 40 for type-token diversity, 20 for the target
    language — with a pass threshold at 60: the single-number gate that
    replaces chained booleans when a pipeline wants RANKED quality
    (curriculum ordering, budget-constrained selection). Pure integer
    arithmetic throughout (scaled divisions, no floats); one scan, one
    per-source rollup."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.selectExpr(
        "source",
        "size(split(text, ' ')) AS n_tok",
        "size(array_distinct(split(text, ' '))) AS n_types",
        "CAST(lang = 'en' AS INT) AS is_en",
    )
    sc = f.selectExpr(
        "source",
        "CAST(least(n_tok, 50) * 40 div 50"
        " + (n_types * 100 div n_tok) * 40 div 100"
        " + is_en * 20 AS BIGINT) AS score",
    )
    return sc.groupBy("source").agg(
        F.expr("count(*) AS n_docs"),
        F.expr("CAST(sum(CAST(score >= 60 AS INT)) AS BIGINT) AS n_pass"),
        F.expr("CAST(sum(score) AS BIGINT) AS score_sum"),
    )


# --- deterministic shard assignment ------------------------------------------
_N_SHARDS = 8


@query(
    "shard_assignment",
    oracle=f"""
    SELECT doc_id,
           CAST({_h_sql("concat('shard:', CAST(doc_id AS VARCHAR))")}
                % {_N_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY {_h_sql("concat('shard:', CAST(doc_id AS VARCHAR))")}
                          % {_N_SHARDS}
             ORDER BY {_h_sql("concat('pos:', CAST(doc_id AS VARCHAR))")},
                      doc_id) AS BIGINT) AS pos
    FROM documents
    """,
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into {_N_SHARDS} training shards —
    the step that turns a cleaned corpus into the randomized, resumable
    file layout a data loader streams: shard = md5-hash of doc_id (stable
    under repartitioning and task retries, unlike seeded RNG), position
    within shard = a second independent hash order, so both the shard
    membership AND the intra-shard read order are reproducible from the
    doc_id alone. One hash shuffle + per-shard sort — exactly the
    repartition(shard).sortWithinPartitions plan a shard writer runs. At
    100 TB the shard count is chosen so each shard is ~file-sized
    (O(100k) shards of ~1 GB), so the per-shard sort is bounded by
    design; the window never sees unbounded cardinality. Reference
    analogue: the train/test row split materialized to files
    (/root/reference/teamProject/sap.py:31-42)."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        _h_spark(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
        % _N_SHARDS
    ).cast("int")
    posh = _h_spark(F.concat(F.lit("pos:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("posh", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard"), posh.alias("posh"))
        .select(
            "doc_id", "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


# --- per-source cap with drop accounting -------------------------------------
_SRC_CAP = 120


@query(
    "corpus_source_cap_audit",
    oracle=f"""
    WITH ranked AS (
      SELECT source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_h_sql("concat('cap:', CAST(doc_id AS VARCHAR))")},
                        doc_id) AS rn,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CAST(rn <= {_SRC_CAP} AS INT)) AS BIGINT) AS n_kept,
           CAST(sum(CAST(rn > {_SRC_CAP} AS INT)) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rn <= {_SRC_CAP} THEN n_tok ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN rn > {_SRC_CAP} THEN n_tok ELSE 0 END)
                AS BIGINT) AS dropped_tokens
    FROM ranked GROUP BY source
    """,
)
def corpus_source_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap ({_SRC_CAP}) with full drop accounting —
    the over-represented-domain throttle (RefinedWeb/C4-style per-host
    caps) in its auditable form: before running the cap at 100 TB an
    operator wants kept/dropped doc AND token counts per source, not
    just the surviving rows (mixture_quota emits those). Hash-order
    rank makes the cap a deterministic uniform draw; the window
    partitions by source and everything above it is a single per-source
    rollup, so the only scale hazard is a single mega-source, the same
    documented skew case as mixture_quota (per-salt top-k swap)."""
    docs = load_table(spark, sf_dir, "documents")
    h = _h_spark(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    ranked = docs.select(
        "source",
        F.row_number().over(w).alias("rn"),
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tok"),
    )
    return ranked.groupBy("source").agg(
        F.expr("count(*) AS n_docs"),
        F.expr(f"CAST(sum(CAST(rn <= {_SRC_CAP} AS INT)) AS BIGINT) AS n_kept"),
        F.expr(f"CAST(sum(CAST(rn > {_SRC_CAP} AS INT)) AS BIGINT) AS n_dropped"),
        F.expr(
            f"CAST(sum(CASE WHEN rn <= {_SRC_CAP} THEN n_tok ELSE 0 END)"
            " AS BIGINT) AS kept_tokens"
        ),
        F.expr(
            f"CAST(sum(CASE WHEN rn > {_SRC_CAP} THEN n_tok ELSE 0 END)"
            " AS BIGINT) AS dropped_tokens"
        ),
    )


# --- curriculum ordering: difficulty-sorted, source-interleaved --------------
# The training-order step of a data pipeline: feed easy (short) documents
# first, but round-robin across sources so no single source dominates any
# phase of training (curriculum learning + source balancing in one order).
@query(
    "curriculum_interleave",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS INT) AS difficulty
      FROM documents
    ),
    r AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY source
                       ORDER BY difficulty, doc_id) AS INT) AS rn
      FROM t
    )
    SELECT doc_id, source, difficulty, rn,
           CAST(row_number() OVER (ORDER BY rn, source) AS INT) AS global_pos
    FROM r
    """,
)
def curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum order: rank docs inside each source by
    difficulty (whitespace token count, doc_id tie-break), then interleave
    sources round-robin — global order = (rn, source).

    The oracle states the semantics with a global row_number; the Spark plan
    must NOT (unpartitioned window = single-partition sort of the corpus).
    Instead the interleaved position is closed-form from the bounded
    per-source size table S (sources are a curated catalog, ~dozens):

        global_pos = 1 + SUM_{s'} min(n_{s'}, rn-1)
                       + |{s' < source : n_{s'} >= rn}|

    (docs of any source with smaller rn, plus same-rn docs of earlier
    sources). S is collected into ONE array struct, broadcast, and each row
    evaluates the two terms with higher-order array functions — the only
    shuffles are the source-partitioned window and the 20-row count agg;
    everything after is map-only at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("int").alias("difficulty"),
    )
    w = Window.partitionBy("source").orderBy("difficulty", "doc_id")
    r = t.withColumn("rn", F.row_number().over(w).cast("int"))
    counts = r.groupBy("source").agg(F.count("*").cast("int").alias("n"))
    arr = counts.agg(
        F.collect_list(
            F.struct(F.col("source").alias("s"), F.col("n").alias("n"))
        ).alias("__cnts")
    )
    pos = (
        F.expr(
            "aggregate(__cnts, 0, (acc, x) -> acc + least(x.n, rn - 1))"
        )
        + F.expr("size(filter(__cnts, x -> x.s < source AND x.n >= rn))")
        + F.lit(1)
    )
    return (
        r.crossJoin(F.broadcast(arr))
        .select(
            "doc_id",
            "source",
            "difficulty",
            "rn",
            pos.cast("int").alias("global_pos"),
        )
    )


# --- DSIR-style importance selection ------------------------------------------
# target domain = these sources; the rest of the corpus is the raw pool
_DSIR_TARGET = ("src0", "src1")
_DSIR_TOPK = 50
_DSIR_T_IN = "('src0', 'src1')"


@query(
    "select_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word,
             CAST(sum(CASE WHEN source IN {_DSIR_T_IN} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN source IN {_DSIR_T_IN} THEN 0 ELSE 1 END)
                  AS BIGINT) AS c_r
      FROM tok GROUP BY word
    ),
    tot AS (
      SELECT CAST(sum(c_t) AS BIGINT) AS n_t, CAST(sum(c_r) AS BIGINT) AS n_r,
             CAST(count(*) AS BIGINT) AS v
      FROM vocab
    ),
    wts AS (
      SELECT word,
             CAST(round(ln((c_t + 0.5) / (n_t + 0.5 * v)) * 1000000000)
                  AS BIGINT)
           - CAST(round(ln((c_r + 0.5) / (n_r + 0.5 * v)) * 1000000000)
                  AS BIGINT) AS w
      FROM vocab, tot
    ),
    pool AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(w.w) AS BIGINT) AS w_sum
      FROM tok t JOIN wts w ON t.word = w.word
      WHERE t.source NOT IN {_DSIR_T_IN}
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tok, w_sum,
           round(CAST(w_sum AS DOUBLE) / n_tok / 1000000000, 6) AS score
    FROM pool
    ORDER BY CAST(w_sum AS DOUBLE) / n_tok DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def select_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023, DSIR),
    unigram form: estimate a target-domain LM (docs from _DSIR_TARGET
    sources) and a raw-pool LM (everything else), score each pool document
    by its length-normalized log importance ratio
    mean_w[ ln p_target(w) - ln p_raw(w) ]  (add-1/2 smoothing over the
    shared vocabulary), and keep the top-k most target-like documents —
    the standard recipe for carving a domain-matched training subset out
    of a web-scale crawl.

    Exactness: one IEEE ln + one round to 1e-9 units per DISTINCT word per
    LM (the quality_perplexity_proxy convention), then pure bigint sums;
    the ranking key is the deterministic double division of those exact
    integers, tie-broken by doc_id.

    Scale shape: two corpus-linear aggregations (token counts), one
    vocab-sized weight table probed back by broadcast equi-join, one
    per-doc sum, and a TakeOrderedAndProject top-k — no corpus reshuffle,
    no window. At 100 TB the vocab table is feature-hashed to a fixed
    width (DSIR's actual trick) so the broadcast stays a few MB.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    is_t = F.col("source").isin(*_DSIR_TARGET)
    vocab = tok.groupBy("word").agg(
        F.sum(is_t.cast("bigint")).alias("c_t"),
        F.sum((~is_t).cast("bigint")).alias("c_r"),
    )
    tot = vocab.agg(
        F.sum("c_t").alias("n_t"),
        F.sum("c_r").alias("n_r"),
        F.count("*").alias("v"),
    )
    from ..functions import numeric as N

    def _lnw(c: F.Column, n: F.Column, v: F.Column) -> F.Column:
        return N.fround_int(
            F.log((c + F.lit(0.5)) / (n + F.lit(0.5) * v)) * 1e9
        )

    wts = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        (
            _lnw(F.col("c_t"), F.col("n_t"), F.col("v"))
            - _lnw(F.col("c_r"), F.col("n_r"), F.col("v"))
        ).alias("w"),
    )
    pool = (
        # plain equi-join on word: the importance-weight table spans the
        # VOCABULARY, which grows with the corpus (ADVICE r6 class — never
        # force-broadcast an unbounded frame); AQE broadcasts while small.
        tok.filter(~is_t)
        .join(wts, "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("w").alias("w_sum"))
    )
    return (
        pool.select(
            "doc_id",
            "n_tok",
            "w_sum",
            F.round(
                F.col("w_sum").cast("double") / F.col("n_tok") / 1e9, 6
            ).alias("score"),
        )
        .orderBy(
            (F.col("w_sum").cast("double") / F.col("n_tok")).desc(), "doc_id"
        )
        .limit(_DSIR_TOPK)
    )


# --- sliding-window chunking with overlap ------------------------------------
_SLIDE_SIZE = 64
_SLIDE_STRIDE = 48


@query(
    "doc_chunk_sliding",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(
               0,
               CAST(floor((greatest(n - {_SLIDE_SIZE}, 0) + {_SLIDE_STRIDE - 1})
                          / {_SLIDE_STRIDE}.0) AS BIGINT)
             )) AS j
      FROM base
    )
    SELECT doc_id,
           CAST(j AS BIGINT) AS chunk_idx,
           CAST(1 + {_SLIDE_STRIDE} * j AS BIGINT) AS chunk_start,
           CAST(least({_SLIDE_SIZE}, n - (1 + {_SLIDE_STRIDE} * j) + 1)
                AS BIGINT) AS chunk_len,
           md5(array_to_string(
             list_slice(toks, 1 + {_SLIDE_STRIDE} * j,
                        least(1 + {_SLIDE_STRIDE} * j + {_SLIDE_SIZE - 1}, n)),
             ' ')) AS chunk_hash
    FROM idx
    """,
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap — the standard pretraining /
    RAG chunker (window SIZE tokens, STRIDE < SIZE, so consecutive chunks
    share SIZE-STRIDE tokens of context; the non-overlapping sibling is
    doc_chunk_fixed). Chunk count per doc is 1 + ceil(max(0, n-SIZE)/STRIDE)
    so every token lands in >=1 chunk and the final chunk always reaches the
    end of the document; chunks carry their start/length and a content hash
    for downstream dedup of chunk collisions.

    Scale shape: a narrow per-row transform — chunk explode multiplies rows
    by ~n/STRIDE with no exchange anywhere; the hash is computed inside the
    same projection. Pure map-side at any scale.
    """
    size, stride = _SLIDE_SIZE, _SLIDE_STRIDE
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks_m1 = F.floor(
        (F.greatest(n - size, F.lit(0)) + (stride - 1)) / float(stride)
    ).cast("bigint")
    base = docs.select(
        "doc_id", toks.alias("toks"), n.cast("bigint").alias("n"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks_m1)).alias("j"),
    )
    start = 1 + F.lit(stride) * F.col("j")
    return base.select(
        "doc_id",
        F.col("j").alias("chunk_idx"),
        start.cast("bigint").alias("chunk_start"),
        F.least(F.lit(size).cast("bigint"), F.col("n") - start + 1)
        .cast("bigint")
        .alias("chunk_len"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), start.cast("int"), size))
        ).alias("chunk_hash"),
    )


# --- shard-topology rebalance cost -------------------------------------------
# Rendezvous (highest-random-weight) hashing vs plain mod-N when the shard
# count changes. HRW moves only the keys whose argmax lands on a new shard
# (expected (M-N)/M of the corpus); mod-N remaps almost everything. The
# weight is the portable md5 hash, quantized to 55 bits so the packed
# (weight, shard) tie-break key stays inside a signed 64-bit integer.
_RB_OLD, _RB_NEW = 8, 10
_RB_Q = 1 << 55


@query(
    "shard_rebalance_cost",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, s,
             ({_h_sql("concat('rv:', CAST(doc_id AS VARCHAR), ':', CAST(s AS VARCHAR))")}
              % {_RB_Q}) * 16 + (15 - s) AS k
      FROM documents, generate_series(0, {_RB_NEW - 1}) AS t(s)
    ),
    a AS (
      SELECT doc_id,
             15 - CAST(max(CASE WHEN s < {_RB_OLD} THEN k END) % 16 AS INT)
               AS s_old,
             15 - CAST(max(k) % 16 AS INT) AS s_new
      FROM e GROUP BY doc_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(s_old <> s_new AS INT)) AS BIGINT) AS mv_hrw,
             CAST(sum(CAST(doc_id % {_RB_OLD} <> doc_id % {_RB_NEW} AS INT))
                  AS BIGINT) AS mv_mod
      FROM a
    )
    SELECT 'rendezvous' AS strategy, n_docs, mv_hrw AS n_moved,
           CAST(mv_hrw * 1000000 // n_docs AS BIGINT) AS moved_ppm FROM m
    UNION ALL
    SELECT 'mod', n_docs, mv_mod,
           CAST(mv_mod * 1000000 // n_docs AS BIGINT) FROM m
    """,
)
def shard_rebalance_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-topology rebalance audit: how much of the corpus moves when
    the shard count grows {_RB_OLD}->{_RB_NEW}, under rendezvous (HRW)
    hashing vs the naive doc_id mod N. Companion to `shard_assignment`
    (which fixes ONE topology): at 100 TB a reshard is a full-corpus
    rewrite, so the assignment function's stability under topology change
    is a first-order storage-cost knob. HRW's argmax-of-hash moves only
    keys whose winning shard is one of the new ones (expected (M-N)/M
    ~ 200000 ppm here); mod-N remaps ~(1 - 1/lcm(N,M)/...) — nearly
    everything — which the readout makes concrete.

    Scale shape: one explode by the constant shard count (x{_RB_NEW} rows,
    map-side), ONE map-side-combinable groupBy(doc_id) whose max() packs
    (55-bit weight, shard) into a single bigint — argmax with a
    deterministic smaller-shard tie-break, no window, no self-join — then
    a scalar aggregate. Shuffle volume is docs x {_RB_NEW} packed
    bigints; nothing quadratic, nothing driver-side. Reference analogue:
    the train/test file split (teamProject/sap.py:31-42) scaled to a
    sharded corpus layout."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    e = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_RB_NEW - 1))).alias("s"),
    )
    k = (
        _h_spark(
            F.concat(
                F.lit("rv:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("s").cast("string"),
            )
        )
        % _RB_Q
    ) * 16 + (F.lit(15) - F.col("s"))
    a = (
        e.select("doc_id", "s", k.alias("k"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                f"15 - CAST(max(CASE WHEN s < {_RB_OLD} THEN k END) % 16"
                " AS INT) AS s_old"
            ),
            F.expr("15 - CAST(max(k) % 16 AS INT) AS s_new"),
        )
    )
    m = a.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(CAST(s_old <> s_new AS INT)) AS BIGINT) AS mv_hrw"),
        F.expr(
            f"CAST(sum(CAST(doc_id % {_RB_OLD} <> doc_id % {_RB_NEW} AS INT))"
            " AS BIGINT) AS mv_mod"
        ),
    )
    return m.selectExpr(
        "stack(2, 'rendezvous', mv_hrw, 'mod', mv_mod) AS (strategy, n_moved)",
        "n_docs",
    ).selectExpr(
        "strategy",
        "n_docs",
        "n_moved",
        "CAST(n_moved * 1000000 div n_docs AS BIGINT) AS moved_ppm",
    )


# --- two-phase (main + annealing) mixture plan -------------------------------
# Llama-3 / MiniCPM style: the bulk of the token budget is allocated
# proportionally to source size, but the final ~10% ("annealing" phase) is
# re-weighted toward high-quality sources. Quality is the same deterministic
# per-doc gate score as corpus_source_cap_audit, collapsed to a per-source
# pass rate in integer per-mille.
_ANN_BUDGET = 200_000           # total training-token budget
_ANN_FRAC_PM = 100              # annealing share, per mille (10%)
_ANN_MAIN = _ANN_BUDGET * (1000 - _ANN_FRAC_PM) // 1000
_ANN_ANNEAL = _ANN_BUDGET - _ANN_MAIN


@query(
    "mixture_annealing_plan",
    oracle=f"""
    WITH sc AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(least(CAST(len(string_split(text, ' ')) AS BIGINT), 50)
                    * 40 // 50
                  + (CAST(len(list_distinct(string_split(text, ' ')))
                          AS BIGINT) * 100
                     // CAST(len(string_split(text, ' ')) AS BIGINT))
                    * 40 // 100
                  + CAST(lang = 'en' AS INT) * 20 AS BIGINT) AS score
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(sum(n_tok) AS BIGINT) AS n_tok,
             CAST(sum(CAST(score >= 60 AS INT)) * 1000 // count(*)
                  AS BIGINT) AS qual_pm
      FROM sc GROUP BY source
    ),
    t AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tok,
             CAST(sum(n_tok * qual_pm) AS BIGINT) AS wsum
      FROM s
    )
    SELECT s.source, s.n_tok, s.qual_pm,
           CAST({_ANN_MAIN} * s.n_tok // t.tot_tok AS BIGINT) AS main_tok,
           CAST({_ANN_ANNEAL} * (s.n_tok * s.qual_pm) // t.wsum
                AS BIGINT) AS anneal_tok,
           round(CAST({_ANN_MAIN} * s.n_tok // t.tot_tok
                      + {_ANN_ANNEAL} * (s.n_tok * s.qual_pm) // t.wsum
                      AS DOUBLE) / CAST(s.n_tok AS DOUBLE), 6) AS epochs
    FROM s CROSS JOIN t
    """,
)
def mixture_annealing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase data-mixture plan: {_ANN_MAIN} main-phase tokens allocated
    proportionally to source size, plus {_ANN_ANNEAL} annealing-phase
    tokens ({_ANN_FRAC_PM} per mille of the budget) re-weighted by
    size x quality-pass-rate — the end-of-training high-quality upsample
    (Llama-3 annealing / MiniCPM decay-phase mix). Completes the mixture
    family: `mixture_epochs_plan` is single-phase temperature scaling;
    this is the two-phase schedule with a quality-gated second phase, and
    the per-source epochs column is the over-repetition audit across both
    phases combined.

    Scale shape: ONE map-side-combined groupBy(source) over the facts
    computing token totals and gate pass-rates together; all allocation
    arithmetic runs on the |sources|-bounded table against one broadcast
    totals row. Exactness: pure integer arithmetic (per-mille rates,
    floor-div allocations — weight products stay under 2^63 for corpora
    to ~10^12 tokens x per-mille quality); the only double is the final
    6dp epochs readout. Reference analogue: the class-rebalancing sample
    plan (experiments/target_eda.py) recast as a training-phase
    schedule."""
    docs = load_table(spark, sf_dir, "documents")
    sc = docs.selectExpr(
        "source",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok",
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_types",
        "CAST(lang = 'en' AS INT) AS is_en",
    ).selectExpr(
        "source",
        "n_tok",
        "CAST(least(n_tok, 50) * 40 div 50"
        " + (n_types * 100 div n_tok) * 40 div 100"
        " + is_en * 20 AS BIGINT) AS score",
    )
    s = sc.groupBy("source").agg(
        F.expr("CAST(sum(n_tok) AS BIGINT) AS n_tok"),
        F.expr(
            "CAST(sum(CAST(score >= 60 AS INT)) * 1000 div count(*)"
            " AS BIGINT) AS qual_pm"
        ),
    )
    t = s.agg(
        F.expr("CAST(sum(n_tok) AS BIGINT) AS tot_tok"),
        F.expr("CAST(sum(n_tok * qual_pm) AS BIGINT) AS wsum"),
    )
    return s.crossJoin(F.broadcast(t)).selectExpr(
        "source",
        "n_tok",
        "qual_pm",
        f"CAST({_ANN_MAIN} * n_tok div tot_tok AS BIGINT) AS main_tok",
        f"CAST({_ANN_ANNEAL} * (n_tok * qual_pm) div wsum AS BIGINT)"
        " AS anneal_tok",
        f"round(CAST({_ANN_MAIN} * n_tok div tot_tok"
        f" + {_ANN_ANNEAL} * (n_tok * qual_pm) div wsum"
        " AS DOUBLE) / CAST(n_tok AS DOUBLE), 6) AS epochs",
    )
