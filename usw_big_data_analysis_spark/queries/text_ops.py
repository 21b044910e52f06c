"""Text-analysis operators over `documents` (north-star extension; SURVEY.md
§7 Phase E): token counting, quality scoring, language-ID heuristic, document
fingerprinting.

All pure Catalyst expressions over the tokenized array — no Python UDFs.
Tokenization = single-space split (the fixture corpus is space-normalized;
the library tokenizer in operators/text.py handles regex splitting).

Scale: per-row projections + one optional agg — shuffle-free except explicit
group-bys; this is the shape that survives 100 TB (token ops stay inside
whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_STOPWORDS = ("the", "a")
_STOP_SQL = "('the', 'a')"


# --- token counting (north star: token-count pipeline op) -------------------
@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_text,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_text"),
        "n_chars",
    )


# --- quality scoring (length / stopword-ratio heuristics) -------------------
@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_chars,
             CAST(len(toks) AS DOUBLE) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE) AS n_stop
      FROM t
    )
    SELECT doc_id,
           round(n_stop / n_tokens, 6) AS stopword_ratio,
           round(n_chars / n_tokens, 6) AS avg_token_len,
           round(least(n_tokens / 50.0, 1.0) * 0.5
                 + (1.0 - n_stop / n_tokens) * 0.5, 6) AS quality
    FROM s
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length + stopword-ratio quality heuristic (the C4/Gopher-style rule
    family, reduced to the fixture's feature set)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    t = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("double")
        .alias("n_stop"),
        F.length("text").cast("double").alias("n_chars"),
    )
    return t.select(
        "doc_id",
        F.round(F.col("n_stop") / F.col("n_tokens"), 6).alias("stopword_ratio"),
        F.round(F.col("n_chars") / F.col("n_tokens"), 6).alias("avg_token_len"),
        F.round(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.5
            + (1.0 - F.col("n_stop") / F.col("n_tokens")) * 0.5,
            6,
        ).alias("quality"),
    )


# --- language-ID n-gram/stopword heuristic ----------------------------------
@query(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x IN {_STOP_SQL})) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS en_score
      FROM documents
    )
    SELECT doc_id, lang, round(en_score, 6) AS en_score,
           CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'other' END AS guess
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language scorer (the n-gram-profile method degenerates
    to function-word density on a space-tokenized corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    en_score = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_arr, x))
    ).cast("double") / F.size(toks).cast("double")
    s = docs.select("doc_id", "lang", en_score.alias("en_score"))
    return s.select(
        "doc_id",
        "lang",
        F.round("en_score", 6).alias("en_score"),
        F.when(F.col("en_score") >= 0.05, "en").otherwise("other").alias("guess"),
    )


# --- rolling-hash document fingerprint --------------------------------------
_P = 1000000007


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))),
             (a, b) -> (a * 31 + b) % {_P}) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream — a
    content-defined fingerprint (equal iff token sequences equal, mod
    collisions). Pure `aggregate` fold, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    token_codes = F.transform(
        F.split("text", " "),
        lambda t: (F.ascii(t) * 131 + F.length(t)).cast("long"),
    )
    fp = F.aggregate(
        token_codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _P,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
