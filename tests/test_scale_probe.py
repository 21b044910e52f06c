"""tools/scale_probe.py --gate — the splittability regression gate
(VERDICT r4 #8). The real 16x/sf0.1 gate runs per round via the CLI and its
output is committed as SCALE_PROBE_r{N}.json; here we pin the mechanism:
the probe builds shifted-copy fixtures, produces ratios, and the gate
flags ratios above GATE_MAX_RATIO.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe_module():
    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(REPO, "tools", "scale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_subset_and_threshold_pinned():
    probe = _probe_module()
    assert probe.GATE_QUERIES == [
        "q1_pricing_summary",
        "topk_per_group",
        "dedup_minhash_lsh",
        "metric_auroc",
        # widened per VERDICT r5 #7
        "pipeline_docs_clean",
        "embed_ann_ivfpq",
        "tokenizer_bpe_merges",
        "crosstab_margins",
        # r6-continuation widening (SCALE_PROBE_r06 records all 11 green)
        "text_watermark_greenlist",
        "drift_emd_price",
        "stream_dedup_lsh_ingest",
        # r7: preference family's bounded-pair-matrix claim
        "preference_bradley_terry",
    ]
    assert probe.GATE_MAX_RATIO == 3.0
    # VERDICT r6 #6: the gate is UNIFORM — the former work-grows-with-corpus
    # ceilings all measure under the default bound, so any reappearing
    # per-query headroom is a regression in this pin, not a tuning knob
    assert probe.GATE_CEILING == {}
    assert set(probe.GATE_CEILING) <= set(probe.GATE_QUERIES)
    assert set(probe.GATE_QUERIES) <= set(probe.QUERIES)


def test_probe_produces_ratios_on_small_fixture(spark, sf_dir):
    """End-to-end at sf0.001/factor 2 on one cheap query: the record has
    base/scaled/ratio entries and the scaled dir genuinely had more rows
    (ratio must be finite and positive)."""
    probe = _probe_module()
    rec = probe.run_probe(spark, sf_dir, 2, ["q1_pricing_summary"])
    assert rec["factor"] == 2
    assert rec["base_s"]["q1_pricing_summary"] > 0
    assert rec["scaled_s"]["q1_pricing_summary"] > 0
    assert rec["time_ratio"]["q1_pricing_summary"] > 0


def test_gate_flags_overlimit_ratios():
    probe = _probe_module()
    ratios = {
        "q1_pricing_summary": 1.4,
        "metric_auroc": 3.7,
        "dedup_minhash_lsh": 3.4,  # over the uniform gate since r7 (no ceilings)
    }
    failures = {
        n: r
        for n, r in ratios.items()
        if r > probe.GATE_CEILING.get(n, probe.GATE_MAX_RATIO)
    }
    assert failures == {"metric_auroc": 3.7, "dedup_minhash_lsh": 3.4}
