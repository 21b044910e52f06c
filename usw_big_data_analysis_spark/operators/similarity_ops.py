"""Vectorized (Arrow/pandas-UDF) similarity kernels — the throughput path
behind the oracle-exact SQL forms in ``queries/similarity.py``.

The SQL forms prove semantics (decimal-fold dot products, bit-equal to
DuckDB); these kernels trade bit-stability for ~10-50x per-core throughput:
each Arrow batch of corpus vectors is one numpy matmul against the broadcast
query matrix. This is the shape that survives 100 TB — corpus streamed
through executors once, O(|Q|) driver memory, no per-element shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import numeric as N
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_RESULT_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("cid", LongType()),
        StructField("cosine", DoubleType()),
        StructField("rn", IntegerType()),
    ]
)


def _round_half_up_e12(p: np.ndarray) -> np.ndarray:
    """Mirror Spark's F.round(x * 1e12, 0) (HALF_UP, away from zero) — the
    elementwise product quantization of queries/similarity._dec_dot — so
    the numpy kernel can be bit-identical to the decimal-fold oracle.
    numpy's own round() is half-even and would differ on .5-ulp products."""
    s = p * 1e12
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)


def cosine_topk_vectorized(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_int: bool = False,
) -> DataFrame:
    """Brute-force cosine top-k with a numpy matmul per Arrow batch.

    The query matrix (n_queries × dim) is collected once and closed over —
    Spark serializes it into the UDF (an implicit broadcast; use an explicit
    ``sparkContext.broadcast`` for query sets beyond ~10 MB). Per-partition
    top-k heaps keep executor memory O(k·|Q|); the final exact top-k merge
    shuffles only |partitions|·k·|Q| candidate rows.

    ``exact_int=True`` swaps the float matmul for the house integer fold
    (per-product round(x·y·1e12) as int64, sums < 2^53 ⇒ exact) — the SAME
    arithmetic as the decimal oracle, so results hash-match DuckDB
    bit-for-bit at ~2-3x the float path's batch cost (the throughput
    variant stays on the matmul).
    """
    q_rows = (
        emb.filter(F.col(id_col) < n_queries)
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    if exact_int:
        q_norm = np.sqrt(
            _round_half_up_e12(q_mat * q_mat).sum(axis=1) / 1e12
        )
    else:
        q_norm = np.linalg.norm(q_mat, axis=1)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            if exact_int:
                c_norm = np.sqrt(
                    _round_half_up_e12(c_mat * c_mat).sum(axis=1) / 1e12
                )
                # |Q| x batch x dim elementwise products, quantized per
                # product exactly like the decimal fold, then integer-summed
                prods = _round_half_up_e12(
                    q_mat[:, None, :] * c_mat[None, :, :]
                )
                dots = prods.sum(axis=2) / 1e12
                sims = dots / np.outer(q_norm, c_norm)
            else:
                c_norm = np.linalg.norm(c_mat, axis=1)
                sims = (q_mat @ c_mat.T) / np.outer(q_norm, c_norm)  # |Q| x batch
            out_q, out_c, out_s = [], [], []
            for qi in range(len(q_ids)):
                row = sims[qi]
                mask = c_ids != q_ids[qi]
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                # per-batch partial top-k: cheap, exact after the global merge
                top = idx[np.argsort(-row[idx], kind="stable")[: k * 2]]
                out_q.extend([q_ids[qi]] * len(top))
                out_c.extend(c_ids[top].tolist())
                out_s.extend(row[top].tolist())
            yield pd.DataFrame(
                {
                    "qid": np.array(out_q, dtype=np.int64),
                    "cid": np.array(out_c, dtype=np.int64),
                    "cosine": np.array(out_s, dtype=np.float64),
                    "rn": np.zeros(len(out_q), dtype=np.int32),
                }
            )

    from pyspark.sql import Window

    partial = emb.select(id_col, vec_col).mapInPandas(score_batches, _RESULT_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", N.fround(F.col("cosine"), 6).alias("cosine"), "rn")
    )
