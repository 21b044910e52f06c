"""Multimodal queries (north-star extension): binary columns built from the
`documents` fixture (utf-8 payload as the opaque blob), metadata + decode +
frame-sample over operators/multimodal.py.

Oracle strategy: DuckDB has no blob slicing, so the oracle checks the
metadata arithmetic (byte lengths, frame counts — both closed-form) while
Spark actually materializes the binary and slices it in mapInPandas. The
feature-extraction values themselves (byte moments, checksums) are covered
by pytest golden assertions (tests/test_multimodal.py), mirroring the
metric-golden strategy of SURVEY.md §5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..registry import query
from ..sources import load_table


def binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, content binary, lang) — text bytes standing in for an
    image/audio payload column; at ingest this is `binaryFile` format or a
    parquet binary column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("content"), "lang"
    )


# --- typed metadata over the binary column ----------------------------------
@query(
    "multimodal_meta",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           max(octet_length(encode(text))) AS max_bytes,
           round(avg(octet_length(encode(text))), 6) AS avg_bytes
    FROM documents GROUP BY lang
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_docs(spark, sf_dir)
    n = F.length("content")  # byte length of binary
    return b.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n).alias("total_bytes"),
        F.max(n).alias("max_bytes"),
        F.round(F.avg(n), 6).alias("avg_bytes"),
    )


# --- decode / feature-extract (pandas-UDF batch plumbing) --------------------
@query(
    "multimodal_decode",
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(sum(CAST(octet_length(encode(text)) >= 4 AS BIGINT)) AS BIGINT) AS n_with_header
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL mapInPandas feature extraction (byte moments + header
    parse per document), then reduces to the closed-form-checkable totals.
    The per-document feature values are pytest-golden-checked."""
    feats = MM.fake_decode_features(binary_docs(spark, sf_dir))
    return feats.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum((F.col("n_bytes") >= 4).cast("bigint")).alias("n_with_header"),
    )


# --- frame sampling -----------------------------------------------------------
_FRAME_BYTES, _STRIDE = 16, 32


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             greatest(0, (octet_length(encode(text)) - {_FRAME_BYTES}) // {_STRIDE} + 1) AS n_frames
      FROM documents
    )
    SELECT count(*) AS n_docs, CAST(sum(n_frames) AS BIGINT) AS total_frames,
           min(n_frames) AS min_frames, max(n_frames) AS max_frames
    FROM per_doc
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slices real frames in mapInPandas; the oracle validates the frame
    count arithmetic per document (DuckDB cannot slice blobs — the sliced
    bytes are checked by the checksum goldens in pytest)."""
    frames = MM.frame_sample(
        binary_docs(spark, sf_dir), frame_bytes=_FRAME_BYTES, stride=_STRIDE
    )
    per_doc = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    # documents shorter than one frame yield zero rows from the sampler —
    # re-join to count them with n_frames = 0 like the oracle
    all_docs = binary_docs(spark, sf_dir).select("doc_id")
    joined = all_docs.join(per_doc, "doc_id", "left").select(
        F.coalesce("n_frames", F.lit(0)).alias("n_frames")
    )
    return joined.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_frames").alias("total_frames"),
        F.min("n_frames").alias("min_frames"),
        F.max("n_frames").alias("max_frames"),
    )


# --- REAL audio decode (vendored WAV codec) ----------------------------------
# Per-doc deterministic clip: n = 96 + doc_id%32 mono int16 samples,
# sample i = ((doc_id*37 + 11*i) mod 4096) - 2048, rate 16 kHz. Spec-correct
# RIFF bytes generated per batch, then decoded by the chunk-walking codec
# (operators/audio_codec.py); integer sufficient stats keep the oracle
# closed-form.
@query(
    "multimodal_decode_audio",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 96 + doc_id % 32 AS n FROM documents
    ),
    sm AS (
      SELECT d.doc_id, d.n,
             (d.doc_id * 37 + 11 * i.i) % 4096 - 2048 AS s
      FROM dims d
      JOIN (SELECT unnest(generate_series(0, 200)) AS i) i ON i.i < d.n
    )
    SELECT n AS n_samples, count(DISTINCT doc_id) AS n_docs,
           CAST(sum(s) AS BIGINT) AS sum_s,
           CAST(sum(s * s) AS BIGINT) AS sum_sq
    FROM sm GROUP BY n
    """,
)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generates a spec-correct PCM WAV per document, decodes it with the
    REAL chunk-walking codec (RIFF parse + fmt validation + sample array),
    and aggregates integer sample statistics per clip length. Same
    generator/decoder separation as multimodal_decode_image: a header or
    layout bug in either side breaks parity."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from ..operators.audio_codec import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 96 + doc_id % 32
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 37 + 11 * i) % 4096 - 2048).astype(np.int16)
                ids.append(doc_id)
                blobs.append(encode_wav(s))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    payloads = docs.mapInPandas(
        gen,
        StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )

    def feats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", "n_samples", "sum_s", "sum_sq")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                samples, rate = decode_wav(bytes(payload))
                assert rate == 16000
                s = samples[:, 0].astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(int(len(s)))
                out["sum_s"].append(int(s.sum()))
                out["sum_sq"].append(int((s * s).sum()))
            yield pd.DataFrame(out)

    stats = payloads.mapInPandas(
        feats,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("n_samples", LongType()),
                StructField("sum_s", LongType()),
                StructField("sum_sq", LongType()),
            ]
        ),
    )
    return stats.groupBy("n_samples").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("sum_s").alias("sum_s"),
        F.sum("sum_sq").alias("sum_sq"),
    )


# --- REAL image decode (vendored PPM codec; PIL-compatible payloads) ---------
# Per-doc deterministic image: width 8 + doc_id%5, height 4 + doc_id%3,
# pixel sample i = (doc_id*31 + i*7) mod 256. The payload is a spec-correct
# binary PPM built per batch, then decoded by the real header-parsing codec
# (operators/image_codec.py) — not a byte-level fake. Integer sufficient
# stats (sum, sum of squares) make the oracle closed-form in SQL.
@query(
    "multimodal_decode_image",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8 + doc_id % 5 AS w,
             4 + doc_id % 3 AS h
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w,
             (d.doc_id * 31 + 7 * i.i) % 256 AS v
      FROM dims d
      JOIN (SELECT unnest(generate_series(0, 1000)) AS i) i
        ON i.i < d.w * d.h * 3
    )
    SELECT w AS width, count(DISTINCT doc_id) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_pix,
           CAST(sum(v) AS BIGINT) AS sum_px,
           CAST(sum(v * v) AS BIGINT) AS sum_sq
    FROM px GROUP BY w
    """,
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generates a spec-correct PPM per document, decodes it with the REAL
    vendored codec (header parse + pixel array), and aggregates integer
    pixel statistics per image width. The generator and decoder live in
    separate code paths, so a header/layout bug in either breaks parity."""
    import numpy as np
    import pandas as pd

    from ..operators.image_codec import encode_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 5, 4 + doc_id % 3
                i = np.arange(w * h * 3, dtype=np.int64)
                arr = ((doc_id * 31 + 7 * i) % 256).astype(np.uint8).reshape(h, w, 3)
                ids.append(doc_id)
                blobs.append(encode_ppm(arr))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    payloads = docs.mapInPandas(
        gen,
        StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )
    feats = MM.decode_pixel_features(payloads)
    return feats.groupBy("width").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_pix").alias("n_pix"),
        F.sum("sum_px").alias("sum_px"),
        F.sum("sum_sq").alias("sum_sq"),
    )


# --- resize (nearest-neighbor) over the decoded pixel array ------------------
_RS = 4  # target side: every image resizes to _RS x _RS


@query(
    "multimodal_resize_image",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w,
             (d.doc_id * 31 + 7 * (
               (((t.t // {_RS * 3}) * d.h // {_RS}) * d.w
                + ((t.t // 3) % {_RS}) * d.w // {_RS}) * 3 + t.t % 3
             )) % 256 AS v
      FROM dims d
      CROSS JOIN (SELECT unnest(generate_series(0, {_RS * _RS * 3 - 1})) AS t) t
    )
    SELECT w AS width, count(DISTINCT doc_id) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_pix,
           CAST(sum(v) AS BIGINT) AS sum_px,
           CAST(sum(v * v) AS BIGINT) AS sum_sq
    FROM px GROUP BY w
    """,
)
def multimodal_resize_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize to {RS}x{RS} → integer pixel stats,
    per original width. The Spark side runs the REAL pipeline (spec-correct
    PPM per doc, vendored decoder, numpy gather resize) inside one
    mapInPandas pass — the batch shape a production thumbnailer uses; the
    oracle computes the same resized pixels closed-form from the
    deterministic generator (target (ty,tx,c) samples source
    (ty*h//{RS}, tx*w//{RS}, c)), so a stride/layout bug in decode OR
    resize breaks parity. Per-doc work is constant; no shuffle until the
    final per-width rollup."""
    import numpy as np
    import pandas as pd

    from ..operators.image_codec import decode_ppm, encode_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen_resize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "width": [], "sum_px": [], "sum_sq": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 5, 4 + doc_id % 3
                i = np.arange(w * h * 3, dtype=np.int64)
                arr = ((doc_id * 31 + 7 * i) % 256).astype(np.uint8).reshape(h, w, 3)
                dec = decode_ppm(encode_ppm(arr))
                ys = np.arange(_RS) * dec.shape[0] // _RS
                xs = np.arange(_RS) * dec.shape[1] // _RS
                rs = dec[ys][:, xs].astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["sum_px"].append(int(rs.sum()))
                out["sum_sq"].append(int((rs * rs).sum()))
            yield pd.DataFrame(out)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    per_doc = docs.mapInPandas(
        gen_resize,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("width", IntegerType()),
                StructField("sum_px", LongType()),
                StructField("sum_sq", LongType()),
            ]
        ),
    )
    return per_doc.groupBy("width").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.lit(_RS * _RS * 3).cast("bigint").alias("n_pix_per_doc"),
        F.sum("sum_px").alias("sum_px"),
        F.sum("sum_sq").alias("sum_sq"),
    ).select(
        "width",
        "n_docs",
        (F.col("n_docs") * _RS * _RS * 3).cast("bigint").alias("n_pix"),
        "sum_px",
        "sum_sq",
    )


# --- audio downsample (every k-th sample) ------------------------------------
_DS_K = 4  # decimation factor


@query(
    "multimodal_audio_downsample",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 96 + doc_id % 32 AS n FROM documents
    ),
    sm AS (
      SELECT d.doc_id, d.n,
             (d.doc_id * 37 + 11 * (i.i * {_DS_K})) % 4096 - 2048 AS s
      FROM dims d
      JOIN (SELECT unnest(generate_series(0, 200)) AS i) i
        ON i.i * {_DS_K} < d.n
    )
    SELECT count(DISTINCT doc_id) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_samples_out,
           CAST(sum(s) AS BIGINT) AS sum_s,
           CAST(sum(s * s) AS BIGINT) AS sum_sq
    FROM sm
    """,
)
def multimodal_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → decimate-by-{K} (keep every {K}-th sample, the 16 kHz →
    4 kHz stride resample) → integer sample stats, in one mapInPandas
    pass over spec-correct WAV payloads decoded by the real RIFF codec.
    The oracle regenerates the kept samples closed-form (sample index
    i·{K}), so an off-by-one in the stride or the chunk walk breaks
    parity. Same plumbing contract as multimodal_resize_image."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from ..operators.audio_codec import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen_ds(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", "n_samples_out", "sum_s", "sum_sq")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 96 + doc_id % 32
                i = np.arange(n, dtype=np.int64)
                s16 = ((doc_id * 37 + 11 * i) % 4096 - 2048).astype(np.int16)
                samples, rate = decode_wav(encode_wav(s16))
                ds = samples[::_DS_K, 0].astype(np.int64)
                out["doc_id"].append(doc_id)
                out["n_samples_out"].append(int(len(ds)))
                out["sum_s"].append(int(ds.sum()))
                out["sum_sq"].append(int((ds * ds).sum()))
            yield pd.DataFrame(out)

    stats = docs.mapInPandas(
        gen_ds,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("n_samples_out", LongType()),
                StructField("sum_s", LongType()),
                StructField("sum_sq", LongType()),
            ]
        ),
    )
    return stats.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_samples_out").cast("bigint").alias("n_samples_out"),
        F.sum("sum_s").alias("sum_s"),
        F.sum("sum_sq").alias("sum_sq"),
    )


# --- perceptual average-hash near-dup groups ---------------------------------
# closed-form pHash oracle CTE chain, shared by the exact-group and the
# banded-Hamming queries
_PHASH_CTES = """
    dims AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 4 + doc_id % 3 AS h FROM documents
    ),
    cells AS (
      SELECT d.doc_id, k.k,
             ((((k.k // 4) * d.h) // 4) * d.w + ((k.k % 4) * d.w) // 4) * 3
               AS base
      FROM dims d CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) k
    ),
    gr AS (
      SELECT doc_id, k,
             ((doc_id * 31 + 7 * base) % 256
              + (doc_id * 31 + 7 * (base + 1)) % 256
              + (doc_id * 31 + 7 * (base + 2)) % 256) // 3 AS gray
      FROM cells
    ),
    tot AS (SELECT doc_id, sum(gray) AS tg FROM gr GROUP BY doc_id),
    ph AS (
      SELECT g.doc_id,
             CAST(sum(CASE WHEN g.gray * 16 > t.tg
                           THEN 1 << g.k ELSE 0 END) AS BIGINT) AS phash
      FROM gr g JOIN tot t ON g.doc_id = t.doc_id
      GROUP BY g.doc_id
    )
"""


@query(
    "multimodal_phash_groups",
    oracle=f"""
    WITH {_PHASH_CTES}
    SELECT phash, count(*) AS n_docs FROM ph GROUP BY phash
    """,
)
def multimodal_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash image dedup: decode each image with the REAL
    vendored PPM codec, grayscale it (integer (r+g+b)//3), nearest-neighbor
    sample a 4x4 grid, set bit k where the cell outshines the grid mean
    (g*16 > sum — integer compare, no division), and group documents by
    the 16-bit hash — the image-side analogue of dedup_exact (visually-
    near-identical images collide; aHash is the classic cheap pHash).

    The generator (closed-form pixels from doc_id) and the decode+hash
    path are separate code routes, so a codec, layout, resize-index, or
    bit-order bug breaks oracle parity. Scale shape: one mapInPandas
    decode pass (Arrow-batched), one hash groupBy — exactly how an image
    near-dup pass runs over a binary parquet column at 100 TB."""
    hashes = _phash_frame(spark, sf_dir)
    return hashes.groupBy("phash").agg(F.expr("count(*) AS n_docs"))


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash) — generate PPM payloads (closed-form pixels from
    doc_id), decode with the vendored codec, 4x4 average-hash. Shared head
    of multimodal_phash_groups and multimodal_phash_near."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from ..operators.image_codec import decode_image, encode_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 5, 4 + doc_id % 3
                i = np.arange(w * h * 3, dtype=np.int64)
                arr = ((doc_id * 31 + 7 * i) % 256).astype(np.uint8).reshape(h, w, 3)
                ids.append(doc_id)
                blobs.append(encode_ppm(arr))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    payloads = docs.mapInPandas(
        gen,
        StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )

    def hash_batches(batches):
        shifts = np.arange(16, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "phash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                arr = decode_image(bytes(payload)).astype(np.int64)
                h, w = arr.shape[0], arr.shape[1]
                gray = arr.sum(axis=2) // 3
                sy = (np.arange(4) * h) // 4
                sx = (np.arange(4) * w) // 4
                g = gray[np.ix_(sy, sx)].reshape(-1)  # row-major: k = gy*4+gx
                bits = (g * 16 > int(g.sum())).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["phash"].append(int((bits << shifts).sum()))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        hash_batches,
        StructType(
            [StructField("doc_id", LongType()), StructField("phash", LongType())]
        ),
    )


# --- energy-threshold activity segments over decoded audio -------------------
_VAD_T = 1024  # |sample| >= T counts as active


@query(
    "multimodal_audio_segments",
    oracle=f"""
    WITH clips AS (
      SELECT doc_id, 96 + doc_id % 32 AS n FROM documents
    ),
    s AS (
      SELECT c.doc_id, i.i,
             abs((c.doc_id * 37 + 11 * i.i) % 4096 - 2048) >= {_VAD_T}
               AS active
      FROM clips c
      JOIN (SELECT unnest(generate_series(0, 130)) AS i) i ON i.i < c.n
    ),
    act AS (SELECT doc_id, i FROM s WHERE active),
    isl AS (
      SELECT doc_id,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island
      FROM act
    ),
    runs AS (
      SELECT doc_id, island, count(*) AS run_len FROM isl
      GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT c.doc_id, c.n,
             CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_segments,
             CAST(coalesce(r.longest, 0) AS BIGINT) AS longest_run
      FROM clips c LEFT JOIN (
        SELECT doc_id, count(*) AS n_runs, max(run_len) AS longest
        FROM runs GROUP BY doc_id
      ) r ON c.doc_id = r.doc_id
    )
    SELECT n_segments, count(*) AS n_docs,
           CAST(sum(longest_run) AS BIGINT) AS sum_longest
    FROM per_doc GROUP BY n_segments
    """,
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation of decoded audio: decode each
    clip with the REAL vendored WAV codec, mark samples with |s| >=
    {_VAD_T} as active, and run-length-encode maximal active segments
    per clip (numpy diff on the active mask — the gaps-and-islands
    pattern applied inside the Arrow batch) — the silence-trim /
    utterance-split primitive of an audio pipeline.

    The generator is closed-form from doc_id, so the oracle reproduces
    the whole pipeline (decode → threshold → islands) in SQL without
    touching the codec — a layout, decode, or segmentation bug on either
    side breaks parity. Per-clip work is bounded by clip length; the
    rollup groups by segment count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from ..operators.audio_codec import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 96 + doc_id % 32
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 37 + 11 * i) % 4096 - 2048).astype(np.int16)
                ids.append(doc_id)
                blobs.append(encode_wav(s))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    payloads = docs.mapInPandas(
        gen,
        StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )

    def segs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "n_segments": [], "longest_run": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                samples, rate = decode_wav(bytes(payload))
                assert rate == 16000
                active = np.abs(samples[:, 0].astype(np.int64)) >= _VAD_T
                # run-length encode the active mask
                edges = np.diff(active.astype(np.int8), prepend=0, append=0)
                starts = np.flatnonzero(edges == 1)
                ends = np.flatnonzero(edges == -1)
                runs = ends - starts
                out["doc_id"].append(int(doc_id))
                out["n_segments"].append(int(len(runs)))
                out["longest_run"].append(int(runs.max()) if len(runs) else 0)
            yield pd.DataFrame(out)

    stats = payloads.mapInPandas(
        segs,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("n_segments", LongType()),
                StructField("longest_run", LongType()),
            ]
        ),
    )
    return stats.groupBy("n_segments").agg(
        F.expr("count(*) AS n_docs"),
        F.expr("CAST(sum(longest_run) AS BIGINT) AS sum_longest"),
    )


# --- banded-Hamming pHash near-dup pairs --------------------------------------
_PH_RADIUS = 2


@query(
    "multimodal_phash_near",
    oracle=f"""
    WITH {_PHASH_CTES},
    bands AS (
      SELECT doc_id, phash, b.b AS band,
             CASE b.b WHEN 0 THEN phash % 64
                      WHEN 1 THEN (phash // 64) % 32
                      ELSE (phash // 2048) % 32 END AS band_val
      FROM ph CROSS JOIN (SELECT unnest([0, 1, 2]) AS b) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.phash AS ph_a,
                      c.doc_id AS id_b, c.phash AS ph_b
      FROM bands a JOIN bands c
        ON a.band = c.band AND a.band_val = c.band_val
       AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ph_a, ph_b)) <= {_PH_RADIUS}
    """,
)
def multimodal_phash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visually-NEAR-duplicate image pairs: pHash Hamming distance <=
    {2} via pigeonhole banding — the 16-bit hash splits into three bands
    (6+5+5 bits); any pair within radius 2 leaves at least one band intact,
    so the candidate join is an equi-join on (band, band_val), never an
    all-pairs XOR scan (the image-side sibling of dedup_simhash_hamming).
    Exact bit_count(xor) verifies candidates. Decode runs ONCE (the
    bounded (doc_id, phash) frame is checkpointed, then self-joined); at
    100 TB the phash table is the only thing shuffled — 16 bytes per
    image, regardless of image size."""
    hashes = _phash_frame(spark, sf_dir).localCheckpoint()
    bands = hashes.selectExpr(
        "doc_id",
        "phash",
        "stack(3, 0, phash % 64,"
        " 1, CAST(phash div 64 AS BIGINT) % 32,"
        " 2, CAST(phash div 2048 AS BIGINT) % 32) AS (band, band_val)",
    )
    a = bands.selectExpr(
        "doc_id AS id_a", "phash AS ph_a", "band", "band_val"
    )
    c = bands.selectExpr(
        "doc_id AS id_b", "phash AS ph_b", "band AS band2", "band_val AS band_val2"
    )
    cand = (
        a.join(
            c,
            (F.col("band") == F.col("band2"))
            & (F.col("band_val") == F.col("band_val2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "ph_a", "id_b", "ph_b")
        .distinct()
    )
    return cand.selectExpr(
        "id_a",
        "id_b",
        "CAST(bit_count(ph_a ^ ph_b) AS INT) AS hamming",
    ).filter(F.expr(f"bit_count(ph_a ^ ph_b) <= {_PH_RADIUS}"))


# --- cross-modal pair alignment filter (LAION-style plumbing) ----------------
# A deterministic stand-in for a CLIP score (the container has no vision
# model — brief: stub the model, make the Spark plumbing real): the image
# signature is the mean gray of the REAL decoded pixels mod 97, the text
# signature is the token count mod 97, and a pair "aligns" when the two
# signatures sit within _ALIGN_T of each other. The generator (closed-form
# pixels from doc_id) and the decode+reduce path are separate code routes,
# so codec/layout/stride bugs break oracle parity exactly as in the phash
# keys.
_ALIGN_T = 10
_ALIGN_MOD = 97


@query(
    "multimodal_pair_alignment",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, source, 8 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
             len(string_split(text, ' ')) % {_ALIGN_MOD} AS txt_sig
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, p.p * 3 AS base, d.w * d.h AS n_pix
      FROM dims d
      JOIN (SELECT unnest(generate_series(0, 71)) AS p) p
        ON p.p < d.w * d.h
    ),
    gr AS (
      SELECT doc_id, n_pix,
             ((doc_id * 31 + 7 * base) % 256
              + (doc_id * 31 + 7 * (base + 1)) % 256
              + (doc_id * 31 + 7 * (base + 2)) % 256) // 3 AS gray
      FROM px
    ),
    img AS (
      SELECT doc_id, (sum(gray) // any_value(n_pix)) % {_ALIGN_MOD} AS img_sig
      FROM gr GROUP BY doc_id
    )
    SELECT d.source,
           count(*) AS n_pairs,
           CAST(sum(CAST(abs(i.img_sig - d.txt_sig) <= {_ALIGN_T} AS INT))
                AS BIGINT) AS n_aligned,
           CAST(sum(CAST(abs(i.img_sig - d.txt_sig) <= {_ALIGN_T} AS INT))
                * 1000000 // count(*) AS BIGINT) AS aligned_ppm,
           CAST(sum(abs(i.img_sig - d.txt_sig)) AS BIGINT) AS sum_absdiff
    FROM dims d JOIN img i ON d.doc_id = i.doc_id
    GROUP BY d.source
    """,
)
def multimodal_pair_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair alignment filter — the multimodal selection step a
    LAION-style corpus build runs over billions of (image, caption) pairs:
    decode every image (REAL vendored PPM codec), reduce it to a
    signature, score it against the caption's signature, and report the
    per-source aligned fraction. The model is a deterministic stub (mean
    decoded gray mod {_ALIGN_MOD} vs token count mod {_ALIGN_MOD}); the
    plumbing — binary payload column, Arrow-batched mapInPandas decode,
    pair join, per-source rates — is the real 100 TB shape.

    Scale shape: one mapInPandas decode pass over the payloads (vectorized
    per Arrow batch, no Python row loop), one equi-join back to the text
    side on doc_id, one map-side-combined per-source aggregate. All-integer
    output (ppm by integer division) — bit-stable by construction."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from ..operators.image_codec import decode_image, encode_ppm

    docs = load_table(spark, sf_dir, "documents")
    txt = docs.select(
        "doc_id",
        "source",
        (F.size(F.split("text", " ")) % _ALIGN_MOD).alias("txt_sig"),
    )

    def gen_and_reduce(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "img_sig": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 5, 4 + doc_id % 3
                i = np.arange(w * h * 3, dtype=np.int64)
                arr = (
                    ((doc_id * 31 + 7 * i) % 256).astype(np.uint8).reshape(h, w, 3)
                )
                payload = encode_ppm(arr)
                dec = decode_image(bytes(payload)).astype(np.int64)
                gray = dec.sum(axis=2) // 3
                out["doc_id"].append(doc_id)
                out["img_sig"].append(
                    int((int(gray.sum()) // (w * h)) % _ALIGN_MOD)
                )
            yield pd.DataFrame(out)

    img = docs.select("doc_id").mapInPandas(
        gen_and_reduce,
        StructType(
            [StructField("doc_id", LongType()), StructField("img_sig", LongType())]
        ),
    )
    j = txt.join(img, "doc_id")
    diff = F.abs(F.col("img_sig") - F.col("txt_sig"))
    return j.groupBy("source").agg(
        F.count("*").alias("n_pairs"),
        F.sum((diff <= _ALIGN_T).cast("int")).cast("bigint").alias("n_aligned"),
        F.expr(
            f"CAST(sum(CAST(abs(img_sig - txt_sig) <= {_ALIGN_T} AS INT))"
            " * 1000000 div count(*) AS BIGINT) AS aligned_ppm"
        ),
        F.sum(diff).cast("bigint").alias("sum_absdiff"),
    )
