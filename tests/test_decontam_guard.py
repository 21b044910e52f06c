"""Regression: decontam_ngram must survive documents shorter than the
n-gram width (ADVICE r2). F.sequence(1, 0) defaults its step to -1, so an
unguarded gram enumeration turns a 7-word doc into slice(w, 0, 8) →
INVALID_PARAMETER_VALUE.START at runtime. Real corpora are full of short
and empty docs, so the guard is load-bearing, not cosmetic.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

from usw_big_data_analysis_spark.queries.decontam import decontam_ngram


@pytest.fixture(scope="module")
def short_doc_dir():
    d = tempfile.mkdtemp(prefix="usw_short_docs_")
    docs = pd.DataFrame(
        {
            # doc_id 0 (% 97 == 0) is the eval doc; the rest are train docs
            # spanning empty, 1-word, 7-word (= _NGRAM - 1), and 8-word.
            "doc_id": [0, 1, 2, 3, 4],
            "source": ["web", "web", "web", "books", "books"],
            "lang": ["en"] * 5,
            "text": [
                "a b c d e f g h i j",
                "",
                "one",
                "w1 w2 w3 w4 w5 w6 w7",
                "a b c d e f g h",  # shares the eval doc's leading 8-gram
            ],
        }
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_shingles_short_docs(spark, short_doc_dir):
    # same bug class in the dedup shingle generator: a <3-word doc must
    # produce zero shingles, not a descending-sequence slice error
    from usw_big_data_analysis_spark.queries.dedup import _shingles

    rows = _shingles(spark, short_doc_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += 1
    assert 1 not in by_doc and 2 not in by_doc  # "" and "one" yield none
    assert by_doc[0] == 8  # 10-word doc -> 8 distinct 3-shingles


def test_decontam_ngram_short_docs(spark, short_doc_dir):
    rows = {
        r["source"]: r.asDict()
        for r in decontam_ngram(spark, short_doc_dir).collect()
    }
    # All four train docs survive to the tally; only doc 4 is contaminated.
    assert rows["web"]["n_train"] == 2
    assert rows["web"]["n_contaminated"] == 0
    assert rows["books"]["n_train"] == 2
    assert rows["books"]["n_contaminated"] == 1
    assert rows["books"]["n_clean"] == 1
