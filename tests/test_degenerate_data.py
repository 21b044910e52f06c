"""Degenerate-data robustness sweep — every registered query must survive
a pathological micro-corpus.

At 100 TB some partition, source, or day WILL be degenerate: 1-row tables,
null numerics, empty documents, single-event users, unexpected source
labels. A query that hard-crashes there (deep JVM cast errors,
ZeroDivisionError out of an Arrow kernel, 'Nothing has been added to this
summarizer' from an empty train split) takes the whole pipeline down. The
contract pinned here: every registered query either RUNS (possibly
returning zero rows) or raises the documented degenerate-training
ValueError from operators/ml_ops.require_trainable — never an unclassified
exception.

Bugs this sweep caught when introduced (round 4): quality_nb_classifier
died on a source label that doesn't parse as srcN (now TRY_CAST),
pandas_group_ols raised ZeroDivisionError on constant-x groups (now NULL,
mirroring DuckDB's double division), and six ML queries surfaced empty
train splits as raw py4j errors (now a clear ValueError).
"""

from __future__ import annotations

import datetime

import pytest

import __spark_entry__ as entrymod

# Queries whose semantics genuinely require trainable data; on the
# micro-corpus they must raise ml_ops.require_trainable's ValueError —
# anything else is a failure.
_DEGENERATE_TRAINERS = {
    "early_stopping",
    "feature_importance_rf",
    "fit_predict_zoo",
    "hpo_optuna",
    "model_save_load",
    "pipeline_fit",
    # Gaussian discriminants (r6): need >= 2 rows per class for a ddof=1
    # covariance — the micro-corpus can't provide that
    "lda_sampled",
    "qda_sampled",
}


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    """1-3 row tables with the production schemas and the nasty cases:
    null numerics, empty/one-char documents, non-srcN source labels,
    duplicate join keys, a single-user event stream."""
    root = str(tmp_path_factory.mktemp("sf_edge"))
    T = datetime.datetime

    def write(name: str, rows: list, schema: str) -> None:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}.parquet")

    write("region", [(0, "ALPHA"), (1, "BETA")], "r_regionkey int, r_name string")
    write(
        "nation",
        [(0, "AAA", 0), (1, "BBB", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write(
        "customer",
        [
            (1, "Customer#1", 0, -10.50, "BUILDING"),
            (2, "Customer#2", 1, None, "MACHINERY"),
            (3, "c", 1, 0.0, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    write(
        "supplier",
        [(1, "Supplier#1", 0, 5.25)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    write(
        "part",
        [
            (1, "green part", "Brand#1", "SMALL BRUSHED", 1, 100.00),
            (2, "", "Brand#1", "LARGE POLISHED", 50, 0.01),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    write(
        "orders",
        [
            (1, 1, "O", 150000.01, T(1995, 1, 1), "1-URGENT"),
            (2, 2, "F", 0.01, T(1998, 12, 31), "5-LOW"),
            (3, 1, "O", 150000.01, T(1995, 1, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    write(
        "lineitem",
        [
            (1, 1, 1, 1, 1.0, 1.01, 0.0, 0.0, "A", "F", T(1995, 2, 1)),
            (1, 2, 1, 2, 50.0, 99999.99, 0.10, 0.08, "N", "O", T(1998, 1, 1)),
            (2, 1, 1, 1, 25.0, 500.00, 0.05, 0.02, "R", "F", T(1996, 6, 15)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    write(
        "events",
        [
            (1, T(2024, 1, 1, 0, 0, 0), 7, "click", 1.0, '{"k": 1}'),
            (2, T(2024, 1, 1, 0, 0, 1), 7, "view", 0.01, '{"k": 2}'),
            (3, T(2024, 1, 2, 12, 0, 0), 8, "purchase", 490.0, '{"k": 3}'),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    write(
        "documents",
        [
            (1, "the cat", "en", "web", 7),
            (2, "", "en", "web", 0),
            (3, "a", "ko", "books", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = [
        (i, [float((i * 64 + x) % 97) / 97.0 for x in range(64)], i % 3)
        for i in range(20)
    ]
    write("embeddings", emb, "vec_id long, embedding array<float>, label int")
    return root


def test_every_query_survives_degenerate_data(spark, edge_dir):
    qs = entrymod.queries()
    crashes: dict[str, str] = {}
    degenerate_ok: set[str] = set()
    for name in sorted(qs):
        try:
            qs[name](spark, edge_dir).count()
        except ValueError as exc:
            if "degenerate" in str(exc) and name in _DEGENERATE_TRAINERS:
                degenerate_ok.add(name)
            else:
                crashes[name] = f"ValueError: {exc}"
        except Exception as exc:  # noqa: BLE001 — the sweep's whole point
            crashes[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:160]}"
    assert crashes == {}, crashes
    # the trainers must fail loudly-and-clearly, not silently succeed on
    # a split with nothing to learn from
    assert degenerate_ok == _DEGENERATE_TRAINERS
