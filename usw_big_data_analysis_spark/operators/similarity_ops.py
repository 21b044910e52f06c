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
    DecimalType,
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
    ids, mat = _collect_head(emb, max(ncells, pq_codes, nq), id_col, vec_col)
    cellids, cent = ids[ids < ncells], mat[ids < ncells]
    cbids, cb = ids[ids < pq_codes], mat[ids < pq_codes]
    qids, qm = ids[ids < nq], mat[ids < nq]
    if not len(cellids) or not len(cbids) or not len(qids):
        # degenerate fixture: no centroids / codebook / queries -> no rows
        return emb.sparkSession.createDataFrame(
            [], "qid bigint, cid bigint, adc_d2 double, rn int"
        )
    ncells_eff = len(cellids)
    nq_eff = len(qids)
    dims = cent.shape[1]
    nsub = dims // 8

    def _nrm(m: np.ndarray) -> np.ndarray:
        return np.sqrt(_round_half_up_e12(m * m).sum(axis=1) / 1e12)

    cnrm = _nrm(cent)
    qnrm = _nrm(qm)
    qdots = _round_half_up_e12(qm[:, None, :] * cent[None, :, :]).sum(axis=2) / 1e12
    qcos = _fround_np(qdots / np.outer(qnrm, cnrm), 6)
    probe_cells = [
        np.lexsort((np.arange(ncells_eff), -qcos[t]))[:nprobe]
        for t in range(nq_eff)
    ]
    # query LUT: int64 subspace distances, (|q|, nsub, |codes|)
    qd2 = _pq_d2_int(qm, cb)

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
            codes = np.argmin(_pq_d2_int(c_mat, cb), axis=2)
            out_q, out_c, out_d = [], [], []
            for t, qid in enumerate(qids):
                mask = np.isin(cell, probe_cells[t]) & (c_ids != qid)
                if not mask.any():
                    continue
                sel = np.nonzero(mask)[0]
                adc = qd2[t][sub_idx[None, :], codes[sel]].sum(axis=1)
                order = np.lexsort((c_ids[sel], adc))[:topk]
                out_q.extend([int(qid)] * len(order))
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


def _pq_d2_int(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Per-(vector, subspace, code) squared-L2 subvector distances as int64
    e12 units — the numpy twin of the relational PQ distance table
    ``sum(CAST((v-cv)*(v-cv) AS DECIMAL(25,12)))`` grouped by (vec_id,
    pos div 8, code): each elementwise squared difference is quantized with
    ``_round_half_up_e12`` (exactly the DECIMAL(25,12) cast) and the 8
    per-subspace terms are integer-summed (each ≤ 4e12, so the sum ≤ 3.2e13
    « 2^63 and « 2^53 — exact as int64 AND as double). Shape
    (n, nsub, pq_codes)."""
    n, dims = mat.shape
    pq = len(cb)
    nsub = dims // 8
    return (
        _round_half_up_e12((mat[:, None, :] - cb[None, :, :]) ** 2)
        .reshape(n, pq, nsub, 8)
        .sum(axis=3)
        .transpose(0, 2, 1)
    )


def _collect_head(
    emb: DataFrame, n: int, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Corpus vectors with id < ``n`` as (ids, matrix), id-ascending — the
    bounded head (codebook / centroids / query set) every PQ kernel closes
    over. The id filter pushes down to the parquet scan. Returns the ids
    actually present (degenerate fixtures may hold fewer than ``n``
    vectors), so callers must index cells/codes through ``ids`` rather than
    assume 0..n-1; with the contiguous production head the two coincide."""
    rows = emb.filter(F.col(id_col) < n).select(id_col, vec_col).collect()
    rows.sort(key=lambda r: int(r[id_col]))
    ids = np.array([int(r[id_col]) for r in rows], dtype=np.int64)
    mat = (
        np.stack([np.array(r[vec_col], dtype=np.float64) for r in rows])
        if rows
        else np.zeros((0, 0), dtype=np.float64)
    )
    return ids, mat


def pq_assign_vectorized(
    emb: DataFrame,
    pq_codes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ assignment histogram (subspace, code, n_assigned, distortion) with
    the whole distance table as a numpy kernel — the throughput twin of
    ``queries.similarity.embed_pq_assign``'s explode + decimal groupBy plan
    (which pushed corpus × 64 × pq_codes rows through a fact-scale
    aggregation; guide §4.2).

    The kernel partial-aggregates per task (guide §2.3): each Arrow batch
    contributes its argmin assignments to a per-task {(subspace, code):
    [n, Σd2]} accumulator held as Python ints (unbounded, so no overflow at
    any partition size; per-batch numpy sums stay < 10k rows · 3.2e13 «
    2^63), and ONE row per touched cell leaves the task, with the partial
    Σd2 emitted as DECIMAL(25,12). Spark's final sum of those partials is
    decimal addition — exact and associative — so the total equals the
    relational plan's sum of per-(vec, subspace) DECIMAL(25,12) terms
    bit-for-bit, and the final double cast + round6 is the identical single
    IEEE rounding. Argmin ties break to the lowest code via np.argmin's
    first-min rule, matching row_number() ORDER BY d2, code."""
    import decimal

    cbids, cb = _collect_head(emb, pq_codes, id_col, vec_col)
    if not len(cbids):  # degenerate: no codebook -> no assignments
        return emb.sparkSession.createDataFrame(
            [], "subspace int, code bigint, n_assigned bigint, distortion double"
        )
    nsub = cb.shape[1] // 8
    schema = StructType(
        [
            StructField("subspace", IntegerType()),
            StructField("code", LongType()),
            StructField("n", LongType()),
            StructField("d2sum", DecimalType(25, 12)),
        ]
    )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subspace": pd.Series([], dtype="int32"),
                "code": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "d2sum": pd.Series([], dtype="object"),
            }
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple[int, int], list[int]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = _pq_d2_int(m, cb)
            codes = np.argmin(d2, axis=2)
            dmin = np.take_along_axis(d2, codes[:, :, None], axis=2)[:, :, 0]
            for s in range(nsub):
                for c, cnt in zip(*np.unique(codes[:, s], return_counts=True)):
                    cell = acc.setdefault((s, int(cbids[c])), [0, 0])
                    cell[0] += int(cnt)
                    cell[1] += int(dmin[codes[:, s] == c, s].sum())
        if not acc:
            yield _empty()
            return
        rows = [
            (s, c, n, decimal.Decimal(d).scaleb(-12))
            for (s, c), (n, d) in acc.items()
        ]
        yield pd.DataFrame(rows, columns=["subspace", "code", "n", "d2sum"])

    part = emb.select(id_col, vec_col).mapInPandas(gen, schema)
    return part.groupBy("subspace", "code").agg(
        F.sum("n").alias("n_assigned"),
        N.fround(F.sum("d2sum").cast("double"), 6).alias("distortion"),
    )


def pq_search_vectorized(
    emb: DataFrame,
    pq_codes: int,
    nq: int,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance search (ADC) as one mapInPandas pass — the
    throughput twin of ``queries.similarity.embed_pq_search`` and exactly
    ``ivfpq_vectorized`` minus the coarse IVF stage: the query LUT
    (nq × nsub × pq_codes int64 subspace distances, same arithmetic as the
    relational DECIMAL(25,12) fold) is computed once from the collected
    head and closed over; each corpus batch computes its own PQ codes
    (np.argmin first-min = ORDER BY d2, code) and every query's ADC sum is
    8 LUT lookups, integer-exact (≤ 8·3.2e13 « 2^53, so the /1e12 double is
    the same single rounding as the decimal sum's double cast). Only ≤ topk
    candidates per (query, batch) leave the executor; the final window
    ranks those few rows by the bit-identical (adc_d2, cid) order."""
    ids, mat = _collect_head(emb, max(pq_codes, nq), id_col, vec_col)
    cbids, cb = ids[ids < pq_codes], mat[ids < pq_codes]
    qids, qm = ids[ids < nq], mat[ids < nq]
    if not len(cbids) or not len(qids):  # degenerate: no codebook/queries
        return emb.sparkSession.createDataFrame(
            [], "qid bigint, cid bigint, adc_d2 double, rn int"
        )
    nsub = cb.shape[1] // 8
    qd2 = _pq_d2_int(qm, cb)  # (|q|, nsub, |codes|)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(nsub)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.argmin(_pq_d2_int(m, cb), axis=2)
            out_q, out_c, out_d = [], [], []
            for t, qid in enumerate(qids):
                sel = np.nonzero(c_ids != qid)[0]
                if not len(sel):
                    continue
                adc = qd2[t][sub_idx[None, :], codes[sel]].sum(axis=1)
                order = np.lexsort((c_ids[sel], adc))[:topk]
                out_q.extend([int(qid)] * len(order))
                out_c.extend(c_ids[sel][order].tolist())
                out_d.extend((adc[order] / 1e12).tolist())
            if out_q:
                yield pd.DataFrame({"qid": out_q, "cid": out_c, "adc_d2": out_d})

    cand = emb.select(id_col, vec_col).mapInPandas(score, _IVFPQ_CAND_SCHEMA)
    from pyspark.sql import Window

    wq = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        cand.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= topk)
        .select("qid", "cid", N.fround(F.col("adc_d2"), 6).alias("adc_d2"), "rn")
    )


def pq_train_partials_vectorized(
    emb: DataFrame,
    pq_codes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-task partial sufficient statistics for one Lloyd refinement of
    the PQ codebook — the fact-scale 2/3 of ``embed_pq_train`` as a numpy
    kernel. For every (code, pos) this emits (n, vsum) per task, where n is
    the member count of the (pos div 8, code) cell and vsum the member sum
    of CAST(v AS DECIMAL(25,12)) — per element ``_round_half_up_e12(v)``
    (the decimal cast's unscaled value), per-batch int64 sums (≤ 10k rows ·
    1e12 « 2^63) accumulated as Python ints, emitted as DECIMAL(25,12)
    partials whose Spark-side decimal sum is exact and associative, hence
    bit-equal to the relational member aggregation. The caller finishes:
    nv = CAST(sum(vsum) AS DOUBLE) / CAST(sum(n) AS DOUBLE) and the tiny
    (pq_codes × dims)-row movement stage stay relational."""
    import decimal

    cbids, cb = _collect_head(emb, pq_codes, id_col, vec_col)
    ncb = len(cbids)
    if not ncb:  # degenerate: no codebook -> no members
        return emb.sparkSession.createDataFrame(
            [], "code bigint, pos int, n bigint, vsum decimal(25,12)"
        )
    dims = cb.shape[1]
    nsub = dims // 8
    schema = StructType(
        [
            StructField("code", LongType()),
            StructField("pos", IntegerType()),
            StructField("n", LongType()),
            StructField("vsum", DecimalType(25, 12)),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt = np.zeros((nsub, ncb), dtype=np.int64)
        vsum = [[0] * dims for _ in range(ncb)]  # python ints
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.argmin(_pq_d2_int(m, cb), axis=2)
            r = _round_half_up_e12(m)
            for s in range(nsub):
                lo = s * 8
                for c in np.unique(codes[:, s]):
                    sel = codes[:, s] == c
                    cnt[s, c] += int(sel.sum())
                    part = r[sel, lo:lo + 8].sum(axis=0)
                    row = vsum[int(c)]
                    for j in range(8):
                        row[lo + j] += int(part[j])
        rows = []
        for s in range(nsub):
            for c in range(ncb):
                if not cnt[s, c]:
                    continue
                for j in range(8):
                    pos = s * 8 + j
                    rows.append(
                        (
                            int(cbids[c]),
                            pos,
                            int(cnt[s, c]),
                            decimal.Decimal(vsum[c][pos]).scaleb(-12),
                        )
                    )
        if not rows:
            yield pd.DataFrame(
                {
                    "code": pd.Series([], dtype="int64"),
                    "pos": pd.Series([], dtype="int32"),
                    "n": pd.Series([], dtype="int64"),
                    "vsum": pd.Series([], dtype="object"),
                }
            )
            return
        yield pd.DataFrame(rows, columns=["code", "pos", "n", "vsum"])

    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def incremental_ann_vectorized(
    emb: DataFrame,
    ncells: int,
    nprobe: int,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental ANN ingest (``embed_ann_incremental``) as two kernels —
    the vectorized twin of the crossJoin-fold + cell-join relational plan
    (which evaluated an interpreted 64-element integer fold per (vector,
    centroid) and per candidate pair; guide §4.2).

    Pass 1 (mapInPandas over the corpus): centroids are collected and
    closed over; per batch the cell cosines are one quantized matmul
    (``_round_half_up_e12`` per product = the _dec_dot contract, int sums
    ≤ 6.4e13 « 2^53 so every double is exact), rounded at 6dp with
    ``_fround_np`` and ranked per row by (ccos desc, cell asc). Standing
    rows emit their crn=1 cell; batch rows (vec_id % 10 == 7, ≥ ncells)
    emit one row per probed cell (crn ≤ nprobe) tagged with their
    insertion cell, so no second corpus pass is needed for the append
    action. Embeddings and norms ride along — the ONE shuffle (by cell)
    this plan performs, same bytes the relational cell join moved.

    Pass 2 (applyInPandas per cell): each probed cell scores its batch
    rows against its standing members with the same quantized matmul and
    keeps only the per-(bid, cell) top-k by (cosine desc, cid) — a
    superset of every bid's global top-k, so the final window over the
    ≤ |batch|·nprobe·topk survivors is exact. Per-task memory is
    O(|batch ∩ cell| · |standing ∩ cell| / chunks) — the q-side is chunked
    to ≤ 128 rows so the elementwise product tensor stays ≤ 128 · |cell| ·
    dims doubles regardless of cell skew."""
    cellids, cent = _collect_head(emb, ncells, id_col, vec_col)
    if not len(cellids):  # degenerate: no centroids -> no assignments
        return emb.sparkSession.createDataFrame(
            [], "bid bigint, ins_cell bigint, cid bigint, cosine double, rn int"
        )
    ncells_eff = len(cellids)
    cnrm = np.sqrt(_round_half_up_e12(cent * cent).sum(axis=1) / 1e12)

    assign_schema = StructType(
        [
            StructField("cell", LongType()),
            StructField("vid", LongType()),
            StructField("is_batch", IntegerType()),
            StructField("ins_cell", LongType()),
            StructField("nrm", DoubleType()),
            StructField("emb", pq_emb_type()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            nrm = np.sqrt(_round_half_up_e12(m * m).sum(axis=1) / 1e12)
            dots = (
                _round_half_up_e12(m[:, None, :] * cent[None, :, :]).sum(axis=2)
                / 1e12
            )
            ccos = _fround_np(dots / np.outer(nrm, cnrm), 6)
            # (ccos desc, cell asc) as one integer key: ccos is a 6dp value
            # so rint(ccos·1e6) recovers its integer numerator exactly
            key = (-np.rint(ccos * 1e6).astype(np.int64)) * (
                2 * ncells_eff
            ) + np.arange(ncells_eff)
            order = np.argsort(key, axis=1)  # per-row cell ranking
            is_batch = (ids % 10 == 7) & (ids >= ncells)
            rows_cell, rows_vid, rows_b, rows_ins, rows_nrm, rows_emb = (
                [], [], [], [], [], [],
            )
            for i in range(len(ids)):
                if is_batch[i]:
                    ins = int(cellids[order[i, 0]])
                    for p in range(min(nprobe, ncells_eff)):
                        rows_cell.append(int(cellids[order[i, p]]))
                        rows_vid.append(int(ids[i]))
                        rows_b.append(1)
                        rows_ins.append(ins)
                        rows_nrm.append(float(nrm[i]))
                        rows_emb.append(m[i])
                else:
                    rows_cell.append(int(cellids[order[i, 0]]))
                    rows_vid.append(int(ids[i]))
                    rows_b.append(0)
                    rows_ins.append(-1)
                    rows_nrm.append(float(nrm[i]))
                    rows_emb.append(m[i])
            yield pd.DataFrame(
                {
                    "cell": rows_cell,
                    "vid": rows_vid,
                    "is_batch": rows_b,
                    "ins_cell": rows_ins,
                    "nrm": rows_nrm,
                    "emb": rows_emb,
                }
            )

    pair_schema = StructType(
        [
            StructField("bid", LongType()),
            StructField("ins_cell", LongType()),
            StructField("cid", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        bt = pdf[pdf["is_batch"] == 1]
        st = pdf[pdf["is_batch"] == 0]
        if not len(bt) or not len(st):
            return pd.DataFrame(
                {
                    "bid": np.array([], np.int64),
                    "ins_cell": np.array([], np.int64),
                    "cid": np.array([], np.int64),
                    "cosine": np.array([], np.float64),
                }
            )
        cm = np.stack(st["emb"].to_numpy()).astype(np.float64)
        c_ids = st["vid"].to_numpy(np.int64)
        c_nrm = st["nrm"].to_numpy(np.float64)
        out = {"bid": [], "ins_cell": [], "cid": [], "cosine": []}
        for lo in range(0, len(bt), 128):  # bound the product tensor
            chunk = bt.iloc[lo:lo + 128]
            qm = np.stack(chunk["emb"].to_numpy()).astype(np.float64)
            q_nrm = chunk["nrm"].to_numpy(np.float64)
            dots = (
                _round_half_up_e12(qm[:, None, :] * cm[None, :, :]).sum(axis=2)
                / 1e12
            )
            cos = _fround_np(dots / np.outer(q_nrm, c_nrm), 6)
            for i in range(len(chunk)):
                row = cos[i]
                order = np.lexsort((c_ids, -np.rint(row * 1e6).astype(np.int64)))
                order = order[:topk]
                out["bid"].extend([int(chunk["vid"].iloc[i])] * len(order))
                out["ins_cell"].extend(
                    [int(chunk["ins_cell"].iloc[i])] * len(order)
                )
                out["cid"].extend(c_ids[order].tolist())
                out["cosine"].extend(row[order].tolist())
        return pd.DataFrame(out)

    tagged = emb.select(id_col, vec_col).mapInPandas(assign, assign_schema)
    cand = tagged.groupBy("cell").applyInPandas(score_cell, pair_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("bid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("bid", "ins_cell", "cid", "cosine", "rn")
    )


def pq_emb_type():
    """array<double> element type for kernel pass-through embeddings."""
    from pyspark.sql.types import ArrayType

    return ArrayType(DoubleType())


def _lsh_bucket_np(m: np.ndarray, nplanes: int) -> np.ndarray:
    """Sign-bit LSH bucket per row — the numpy twin of _BUCKET_SQL /
    queries.similarity's bucket aggregates: bit j is set when
    Σ_pos round_half_away(v·r_j(pos)·1e12) > 0 with
    r_j(pos) = ((j·64+pos)·2654435761 % 1000)/1000 − 0.5. The int64 fold
    carries the exact DECIMAL(20,12) sum (64 products « 2^63), so the sign
    — the only thing a bucket bit reads — is bit-equal to the SQL form."""
    dims = m.shape[1]
    j = np.arange(nplanes, dtype=np.int64)[:, None]
    p = np.arange(dims, dtype=np.int64)[None, :]
    r = ((j * 64 + p) * 2654435761 % 1000).astype(np.float64) / 1000.0 - 0.5
    bucket = np.zeros(len(m), dtype=np.int64)
    for t in range(nplanes):
        s = _round_half_up_e12(m * r[t]).sum(axis=1)
        bucket |= (s > 0).astype(np.int64) << t
    return bucket


def knn_hard_negatives_vectorized(
    emb: DataFrame,
    n_anchor: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-anchor hardest label-mismatched negative (``knn_hard_negatives``)
    as one mapInPandas corpus pass — the vectorized twin of the
    crossJoin + interpreted _dec_dot fold (guide §4.2). Anchors (id <
    n_anchor, with labels) are collected and closed over; each batch is one
    quantized matmul (per-product e12 half-away rounding = the DECIMAL
    (20,12) cast, int sums « 2^53 so every double is exact); per (anchor,
    batch) only the best label-mismatch row survives, and the final window
    picks the global rn=1 per anchor under the identical (cosine desc,
    cid) order."""
    rows = (
        emb.filter(F.col(id_col) < n_anchor)
        .select(id_col, label_col, vec_col)
        .collect()
    )
    rows.sort(key=lambda r: int(r[id_col]))
    schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("q_label", IntegerType()),
            StructField("cid", LongType()),
            StructField("neg_label", IntegerType()),
            StructField("cosine", DoubleType()),
        ]
    )
    if not rows:
        return emb.sparkSession.createDataFrame([], schema)
    a_ids = np.array([int(r[id_col]) for r in rows], dtype=np.int64)
    a_lab = np.array([int(r[label_col]) for r in rows], dtype=np.int64)
    a_m = np.stack([np.array(r[vec_col], dtype=np.float64) for r in rows])
    a_nrm = np.sqrt(_round_half_up_e12(a_m * a_m).sum(axis=1) / 1e12)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(np.int64)
            labs = pdf[label_col].to_numpy(np.int64)
            nrm = np.sqrt(_round_half_up_e12(m * m).sum(axis=1) / 1e12)
            dots = (
                _round_half_up_e12(a_m[:, None, :] * m[None, :, :]).sum(axis=2)
                / 1e12
            )
            cos = _fround_np(dots / np.outer(a_nrm, nrm), 6)
            out = {"qid": [], "q_label": [], "cid": [], "neg_label": [],
                   "cosine": []}
            for t in range(len(a_ids)):
                sel = np.nonzero(labs != a_lab[t])[0]
                if not len(sel):
                    continue
                row = cos[t][sel]
                best = sel[
                    np.lexsort((ids[sel], -np.rint(row * 1e6).astype(np.int64)))[0]
                ]
                out["qid"].append(int(a_ids[t]))
                out["q_label"].append(int(a_lab[t]))
                out["cid"].append(int(ids[best]))
                out["neg_label"].append(int(labs[best]))
                out["cosine"].append(float(cos[t][best]))
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out["qid"], dtype="int64"),
                    "q_label": pd.Series(out["q_label"], dtype="int32"),
                    "cid": pd.Series(out["cid"], dtype="int64"),
                    "neg_label": pd.Series(out["neg_label"], dtype="int32"),
                    "cosine": pd.Series(out["cosine"], dtype="float64"),
                }
            )

    cand = emb.select(id_col, label_col, vec_col).mapInPandas(score, schema)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def hard_negatives_vectorized(
    emb: DataFrame,
    nplanes: int,
    n_batch: int,
    k: int,
    lo: float,
    hi: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed hard-negative mining (``embed_hard_negatives``) as two
    kernels — the vectorized twin of the exploded bucket/candidate joins
    and the fact-scale decimal dot aggregate (guide §4.2).

    Pass 1 (mapInPandas): per batch, bucket = sign-bit fold
    (``_lsh_bucket_np``, bit-equal to _BUCKET_SQL) and norm; embeddings
    ride along into the ONE shuffle (by bucket) — the same bytes the
    relational bucket equi-join moved. Pass 2 (applyInPandas per bucket):
    anchors (id < n_batch) score against their own bucket's members with
    the quantized matmul, the [lo, hi) band filters the ROUNDED cosine
    (identical double comparisons), and only each anchor's top-k survive —
    exact, because an anchor's candidates all live in its own bucket. The
    final window re-ranks the ≤ |anchors|·k survivors."""
    cent_schema = StructType(
        [
            StructField("bucket", LongType()),
            StructField("vid", LongType()),
            StructField("nrm", DoubleType()),
            StructField("emb", pq_emb_type()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(np.int64)
            nrm = np.sqrt(_round_half_up_e12(m * m).sum(axis=1) / 1e12)
            yield pd.DataFrame(
                {
                    "bucket": _lsh_bucket_np(m, nplanes),
                    "vid": ids,
                    "nrm": nrm,
                    "emb": list(m),
                }
            )

    pair_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("cid", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vid"].to_numpy(np.int64)
        amask = ids < n_batch
        if not amask.any() or len(pdf) < 2:
            return pd.DataFrame(
                {
                    "qid": np.array([], np.int64),
                    "cid": np.array([], np.int64),
                    "cosine": np.array([], np.float64),
                }
            )
        m = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy(np.float64)
        a_idx = np.nonzero(amask)[0]
        out = {"qid": [], "cid": [], "cosine": []}
        for lo_i in range(0, len(a_idx), 128):  # bound the product tensor
            chunk = a_idx[lo_i:lo_i + 128]
            dots = (
                _round_half_up_e12(m[chunk][:, None, :] * m[None, :, :]).sum(
                    axis=2
                )
                / 1e12
            )
            cos = _fround_np(dots / np.outer(nrm[chunk], nrm), 6)
            for t, ai in enumerate(chunk):
                row = cos[t]
                sel = np.nonzero(
                    (ids != ids[ai]) & (row >= lo) & (row < hi)
                )[0]
                if not len(sel):
                    continue
                order = sel[
                    np.lexsort(
                        (ids[sel], -np.rint(row[sel] * 1e6).astype(np.int64))
                    )[:k]
                ]
                out["qid"].extend([int(ids[ai])] * len(order))
                out["cid"].extend(ids[order].tolist())
                out["cosine"].extend(row[order].tolist())
        return pd.DataFrame(
            {
                "qid": pd.Series(out["qid"], dtype="int64"),
                "cid": pd.Series(out["cid"], dtype="int64"),
                "cosine": pd.Series(out["cosine"], dtype="float64"),
            }
        )

    tagged = emb.select(id_col, vec_col).mapInPandas(assign, cent_schema)
    cand = tagged.groupBy("bucket").applyInPandas(score_bucket, pair_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def jl_projections_vectorized(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-vector JL projections p0..p{k-1} and squared norm vv as one
    integer matmul per Arrow batch — the fact-scale half of
    ``embed_jl_projection_audit`` (whose relational form ran k+1
    DECIMAL(20,12) aggregates over the exploded vectors; guide §4.2).

    Exactness: the deterministic ±1 sign matrix means
    CAST(v·s AS DECIMAL(20,12)) = s · round_half_away(v·1e12) — half-away
    rounding is odd-symmetric — so each projection is one int64 matmul
    row r(v) @ S_j with |sum| ≤ 64e12 « 2^53: the /1e12 double is the same
    single rounding as the decimal sum's double cast. The per-vector ratio
    and per-label rollup stay relational in the caller (their decimal
    division semantics are engine-matched there)."""
    sign = (
        (
            np.add.outer(np.arange(k, dtype=np.int64) * 64, np.arange(64))
            * 2654435761
        )
        % 2
    ) * 2 - 1  # (k, 64) of ±1

    fields = [StructField(id_col, LongType()), StructField(label_col, IntegerType())]
    fields += [StructField(f"p{j}", DoubleType()) for j in range(k)]
    fields.append(StructField("vv", DoubleType()))
    schema = StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            r = _round_half_up_e12(m)  # (n, 64) int64
            proj = (r @ sign.T) / 1e12  # (n, k)
            vv = _round_half_up_e12(m * m).sum(axis=1) / 1e12
            out = {
                id_col: pdf[id_col].to_numpy(np.int64),
                label_col: pdf[label_col].to_numpy(np.int32),
            }
            for j in range(k):
                out[f"p{j}"] = proj[:, j]
            out["vv"] = vv
            yield pd.DataFrame(out)

    return emb.select(id_col, label_col, vec_col).mapInPandas(gen, schema)


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
