"""dedup_minhash_salted — the skew-bounded LSH variant (VERDICT r2 #7).

A 90%-duplicate corpus puts most documents into one (band, band_key)
bucket: the worst case for the bucket-collect plan, and exactly what a
boilerplate-heavy 100 TB crawl produces. Pins:

1. pair-set equality: the salted form emits the SAME (id_a, id_b,
   n_shared_bands) rows as the plain form (intra + bridged inter pairs
   cover every in-bucket pair exactly once per band),
2. buffer bound: no sub-bucket collect_list holds more than
   ceil(bucket_max / _NSALT) + slack ids — the per-task memory bound that
   motivates the variant.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.dedup import (
    _NSALT,
    _band_frame,
    dedup_minhash_lsh,
    dedup_minhash_salted,
)

N_DOCS = 200
N_DUP = 180  # 90% near-identical


@pytest.fixture(scope="module")
def skewed_dir():
    d = tempfile.mkdtemp(prefix="usw_skew_docs_")
    dup_text = "the same boilerplate sentence repeated across the corpus " * 4
    texts = []
    for i in range(N_DOCS):
        if i < N_DUP:
            texts.append(dup_text)
        else:
            texts.append(f"unique document {i} " + " ".join(f"w{i}_{j}" for j in range(30)))
    docs = pd.DataFrame(
        {
            "doc_id": list(range(N_DOCS)),
            "source": ["web"] * N_DOCS,
            "lang": ["en"] * N_DOCS,
            "text": texts,
        }
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_salted_pair_set_unchanged(spark, skewed_dir):
    plain = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in dedup_minhash_lsh(spark, skewed_dir).collect()
    }
    salted = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in dedup_minhash_salted(spark, skewed_dir).collect()
    }
    # the duplicate block collides in every band: the pair set is huge and
    # must survive the salting bit-for-bit
    assert len(plain) >= N_DUP * (N_DUP - 1) // 2
    assert salted == plain


def test_salted_buckets_bounded(spark, skewed_dir):
    bands = _band_frame(spark, skewed_dir)
    bucket_max = (
        bands.groupBy("band", "band_key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    sub_max = (
        bands.withColumn("salt", (F.col("doc_id") % _NSALT).cast("int"))
        .groupBy("band", "band_key", "salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert bucket_max >= N_DUP  # the skew is real
    # doc_ids are dense integers here so the modulo split is near-perfect;
    # allow 2x slack for general-id corpora
    assert sub_max <= 2 * math.ceil(bucket_max / _NSALT)


def test_auto_routes_salted_on_skew(spark, skewed_dir, sf_dir):
    """dedup_minhash_auto (VERDICT r4 #6): the pre-flight routes the
    boilerplate corpus (180-doc bucket > _AUTO_SKEW_MAX_BUCKET=128) to the
    salted plan and the benign fixture corpus to the plain one, and the
    routed result equals the plain pair set either way."""
    from usw_big_data_analysis_spark.queries.dedup import (
        _AUTO_SKEW_MAX_BUCKET,
        _minhash_auto_choice,
        dedup_minhash_auto,
    )

    assert _AUTO_SKEW_MAX_BUCKET == 128  # pinned routing threshold
    assert _minhash_auto_choice(spark, skewed_dir) == "salted"
    assert _minhash_auto_choice(spark, sf_dir) == "plain"

    plain = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in dedup_minhash_lsh(spark, skewed_dir).collect()
    }
    auto = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in dedup_minhash_auto(spark, skewed_dir).collect()
    }
    assert auto == plain
