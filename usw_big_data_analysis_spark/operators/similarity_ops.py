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


def _fround_int_np(y: np.ndarray) -> np.ndarray:
    """Exact numpy twin of functions.numeric.fround_int: half away from
    zero via sign·(floor(|y|) + [|y|−floor(|y|) ≥ 0.5]) — the fractional
    part is IEEE-exact (Sterbenz), so this matches BigDecimal HALF_UP /
    DuckDB's std::round bit-for-bit for |y| < 2^53, including the
    near-half doubles where the naive floor(y+0.5) form rounds early."""
    a = np.abs(y)
    f = np.floor(a)
    return (np.sign(y) * (f + (a - f >= 0.5))).astype(np.int64)


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


_IVFPQ_CAND_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("cid", LongType()),
        StructField("adc_d2", DoubleType()),
    ]
)


def _fround_np(x: np.ndarray, scale: int) -> np.ndarray:
    """numpy twin of functions.numeric.fround (half away from zero at
    ``scale`` decimals) — np.round is half-even and would differ."""
    s = float(10**scale)
    y = x * s
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) / s


def ivfpq_vectorized(
    emb: DataFrame,
    ncells: int,
    nprobe: int,
    nq: int,
    pq_codes: int,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC (coarse cells + PQ asymmetric-distance lookup) with the whole
    per-vector arithmetic as numpy batch kernels — the throughput twin of
    ``queries.similarity.embed_ann_ivfpq(exact=True)``.

    The exact path builds the cell assignment and the per-(vec, subspace,
    code) distance table as a 64-dims x ``pq_codes`` row explosion through a
    broadcast join and a fact-scale groupBy; at sf0.1 that one aggregation
    is ~2/3 of the query's wall time. Here the bounded head of the corpus
    (centroids ∪ codebook ∪ queries — ``max(ncells, pq_codes, nq)`` rows by
    construction) is collected once and closed over, and one mapInPandas
    pass computes per batch: the cell argmax, the PQ code argmin per
    subspace, and each probed query's ADC sum — guide §4.2 (hand whole
    batches to native kernels) + §8 (decide with small rows, move big rows
    once). Per partition only the ≤ topk best candidates per query leave
    the executor; the final exact window ranks those few rows.

    Bit-compatibility is the same contract as ``cosine_topk_vectorized``'s
    ``exact_int`` mode: every product/square is quantized with
    ``_round_half_up_e12`` — exactly the DECIMAL(2x,12) cast the exact plan
    applies per element — and summed as int64 (fixture bound: |v| < 1 ⇒
    the 8-subspace ADC sum < 9e13 « 2^53, so every int is double-exact).
    Cell choice (ccos desc, cell asc) maps onto np.argmax's first-max rule
    after the same 6-dp half-away rounding; code choice (d2 asc, code asc)
    onto np.argmin. The emitted adc_d2 doubles are bit-identical to the
    decimal plan's, so the final (adc_d2, cid) ranking is too."""
    head_n = max(ncells, pq_codes, nq)
    head = {
        int(r[id_col]): np.array(r[vec_col], dtype=np.float64)
        for r in emb.filter(F.col(id_col) < head_n)
        .select(id_col, vec_col)
        .collect()
    }
    cent = np.stack([head[i] for i in range(ncells)])
    cb = np.stack([head[i] for i in range(pq_codes)])
    qm = np.stack([head[i] for i in range(nq)])
    dims = cent.shape[1]
    nsub = dims // 8

    def _nrm(m: np.ndarray) -> np.ndarray:
        return np.sqrt(_round_half_up_e12(m * m).sum(axis=1) / 1e12)

    cnrm = _nrm(cent)
    qnrm = _nrm(qm)
    qdots = _round_half_up_e12(qm[:, None, :] * cent[None, :, :]).sum(axis=2) / 1e12
    qcos = _fround_np(qdots / np.outer(qnrm, cnrm), 6)
    probe_cells = [
        np.lexsort((np.arange(ncells), -qcos[qi]))[:nprobe] for qi in range(nq)
    ]
    # query LUT: int64 subspace distances, (nq, nsub, pq_codes)
    qd2 = (
        _round_half_up_e12((qm[:, None, :] - cb[None, :, :]) ** 2)
        .reshape(nq, pq_codes, nsub, 8)
        .sum(axis=3)
        .transpose(0, 2, 1)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(nsub)
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            dots = (
                _round_half_up_e12(c_mat[:, None, :] * cent[None, :, :]).sum(axis=2)
                / 1e12
            )
            ccos = _fround_np(dots / np.outer(_nrm(c_mat), cnrm), 6)
            cell = np.argmax(ccos, axis=1)  # first max = (ccos desc, cell asc)
            d2 = (
                _round_half_up_e12((c_mat[:, None, :] - cb[None, :, :]) ** 2)
                .reshape(len(c_ids), pq_codes, nsub, 8)
                .sum(axis=3)
                .transpose(0, 2, 1)
            )
            codes = np.argmin(d2, axis=2)  # first min = (d2 asc, code asc)
            out_q, out_c, out_d = [], [], []
            for qi in range(nq):
                mask = np.isin(cell, probe_cells[qi]) & (c_ids != qi)
                if not mask.any():
                    continue
                sel = np.nonzero(mask)[0]
                adc = qd2[qi][sub_idx[None, :], codes[sel]].sum(axis=1)
                order = np.lexsort((c_ids[sel], adc))[:topk]
                out_q.extend([qi] * len(order))
                out_c.extend(c_ids[sel][order].tolist())
                out_d.extend((adc[order] / 1e12).tolist())
            if out_q:
                yield pd.DataFrame(
                    {"qid": out_q, "cid": out_c, "adc_d2": out_d}
                )

    cand = emb.select(id_col, vec_col).mapInPandas(score, _IVFPQ_CAND_SCHEMA)
    from pyspark.sql import Window

    wq = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        cand.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= topk)
        .select("qid", "cid", N.fround(F.col("adc_d2"), 6).alias("adc_d2"), "rn")
    )


_PAIR_COS_SCHEMA = "id_a long, id_b long, cosine double"


def bucket_pair_cosines(
    tagged: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """(id_a, id_b, cosine) for every intra-bucket pair (id_a < id_b) of a
    bucket-tagged embedding frame — the vectorized twin of the
    explode/self-join/decimal-fold candidate plan.

    The relational form carried one row per (pair, position): at B buckets
    it shuffles and folds |corpus|²/B · dims rows through an interpreted
    64-element integer aggregate per pair (~26s at sf0.1 for 4k vectors /
    16 buckets). Here ONE shuffle groups each bucket (guide §4.2): the
    kernel stacks the bucket's vectors, computes norms and all pairwise
    dots as numpy batch ops, and emits only the (pair, cosine) rows.

    Bit-compatibility: every product is quantized with ``_fround_int_np``
    — the exact numpy twin of the DECIMAL(20,12) per-element cast both
    the Spark expression form and the DuckDB oracle apply — then summed
    as int64 (64 products of |v|<1 vectors stay < 2^53, so the sum is
    double-exact); dot = intsum/1e12, cosine = fround(dot/(na·nb), 6),
    the identical operation order. Oracle parity is therefore exact, not
    approximate.

    Scale shape: one shuffle of (id, vector, bucket); per-task memory is
    O(bucket_size · dims). Pathologically hot buckets need the salted
    sub-bucket treatment (dedup_minhash_salted's trick) before this
    kernel — same caveat as any bucketed all-pairs scheme."""

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"id_a": np.array([], np.int64),
                 "id_b": np.array([], np.int64),
                 "cosine": np.array([], np.float64)}
            )
        ids = pdf[id_col].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        nrm = np.sqrt(_fround_int_np(m * m * 1e12).sum(axis=1) / 1e12)
        out_a, out_b, out_c = [], [], []
        for i in range(n - 1):
            tail = m[i + 1:]
            dots = _fround_int_np(m[i][None, :] * tail * 1e12).sum(axis=1) / 1e12
            cos = _fround_np(dots / (nrm[i] * nrm[i + 1:]), 6)
            out_a.append(np.full(n - 1 - i, ids[i], dtype=np.int64))
            out_b.append(ids[i + 1:])
            out_c.append(cos)
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a),
             "id_b": np.concatenate(out_b),
             "cosine": np.concatenate(out_c)}
        )

    return tagged.select(id_col, vec_col, bucket_col).groupBy(
        bucket_col
    ).applyInPandas(gen, _PAIR_COS_SCHEMA)


def cell_dup_ids(
    assigned: DataFrame,
    scale: float,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """SemDeDup's within-cell duplicate flags as a per-cell numpy kernel:
    (dup_id) = every id_b that has some same-cell partner id_a < id_b with
    round6(cos) ≥ tau — the vectorized twin of the exploded
    pair-join/groupBy plan (which pushed |cell|²·dims/2 rows through a
    join + decimal aggregate; ~15s at sf0.1).

    Bit-compatibility with queries/clustering.embed_semdedup's integer
    recipe: components quantize per element as fround_int(v·scale) (int64),
    dots/norms are exact int64 sums (|xi| ≤ scale=1e6 ⇒ 64 products ≤
    6.4e13 « 2^63, double-exact), cosine = fround(dot/(na·nb), 6) — the
    same operation order, so the ≥ tau verdicts are identical, not
    approximate. Per-task memory O(cell_size · dims); size K so cells stay
    bounded (SemDeDup's own regime) — same caveat as bucket_pair_cosines."""

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"dup_id": np.array([], np.int64)})
        ids = pdf[id_col].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        xi = _fround_int_np(m * scale)
        nx = np.sqrt((xi * xi).sum(axis=1).astype(np.float64))
        dup = np.zeros(n, dtype=bool)
        for i in range(n - 1):
            dots = (xi[i][None, :] * xi[i + 1:]).sum(axis=1).astype(np.float64)
            cos = _fround_np(dots / (nx[i] * nx[i + 1:]), 6)
            dup[i + 1:] |= cos >= tau
        return pd.DataFrame({"dup_id": ids[dup]})

    return assigned.select(id_col, vec_col, cell_col).groupBy(
        cell_col
    ).applyInPandas(gen, "dup_id long")
