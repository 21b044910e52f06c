"""Unit checks for the bounded-memory scale operators (queries/scale_ops.py):
the Misra-Gries partial pass must (a) never exceed its capacity and
(b) retain every key whose partition frequency exceeds n_p/CAP — the
guarantee that makes the candidates+exact-verify composition exact."""

from __future__ import annotations

import pandas as pd

from usw_big_data_analysis_spark.queries.scale_ops import _MG_CAP, _mg_partials


def _run_mg(values):
    out = list(_mg_partials(iter([pd.DataFrame({"pk": values})])))
    assert len(out) == 1
    return set(out[0]["pk"].tolist())


def test_mg_retains_heavy_hitters_under_adversarial_tail():
    # 5 hot keys at 4% each, a 10x-CAP cold tail of singletons+doubles:
    # every hot key must survive the decrement churn.
    n_tail = _MG_CAP * 10
    hot = [k for k in range(5) for _ in range(4 * n_tail // 100 + _MG_CAP)]
    tail = [1000 + i // 2 for i in range(2 * n_tail)]
    values = []
    # interleave so hot keys arrive while the counter set is saturated
    for i, v in enumerate(tail):
        values.append(v)
        if i % (len(tail) // len(hot) + 1) == 0 and hot:
            values.append(hot.pop())
    values.extend(hot)
    n = len(values)
    counts = pd.Series(values).value_counts()
    true_hh = set(counts[counts * _MG_CAP > n].index)
    cands = _run_mg(values)
    assert true_hh <= cands, f"lost heavy hitters: {true_hh - cands}"
    assert len(cands) <= _MG_CAP + 1


def test_mg_capacity_bound_and_multibatch_merge():
    # feed as many batches; summary never exceeds capacity and stays a
    # superset of the per-partition heavy keys
    batches = [
        pd.DataFrame({"pk": [i % 1500 for i in range(b * 997, (b + 3) * 997)]})
        for b in range(4)
    ]
    batches.append(pd.DataFrame({"pk": [7] * 2000}))  # one dominant key
    out = list(_mg_partials(iter(batches)))
    cands = set(out[0]["pk"].tolist())
    assert len(cands) <= _MG_CAP + 1
    assert 7 in cands
