"""Capture .explain("formatted") for every bench headliner into plans/r07/.

    python tools/explain_headliners.py before   # -> plans/r07/<q>_before.txt
    python tools/explain_headliners.py after    # -> plans/r07/<q>_after.txt

The optimization-round evidence trail: the judge checks plan-shape claims
(Exchange counts, join strategies, PushedFilters) against these files.
Self-materializing trainers (describe/BPE/GBM/pipeline) run their driver
loops at build time; their captured plan is the returned frame's plan plus
a header noting the driver-loop structure.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE, _bench_variants

    import __spark_entry__ as entrymod
    from usw_big_data_analysis_spark.plans import explain_formatted, audit
    from usw_big_data_analysis_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain_headliners")
    qs = entrymod.queries()
    qs.update(_bench_variants())

    for name in HEADLINE:
        if only and name not in only:
            continue
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"explain:{name}")
        df = qs[name](spark, sf_dir)
        plan = explain_formatted(df)
        a = audit(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"== {name} ({tag}) sf_dir={sf_dir} ==\n"
                f"== audit: {a} ==\n\n"
            )
            fh.write(plan)
        print(f"{name}: {a} ({time.time() - t0:.1f}s) -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
