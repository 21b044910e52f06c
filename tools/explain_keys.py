"""Capture .explain("formatted") for arbitrary registry keys into plans/r08/.

    python tools/explain_keys.py before key1,key2,...
    python tools/explain_keys.py after  key1,key2,...

Generalizes tools/explain_headliners.py (which is pinned to the bench
HEADLINE list and plans/r07) so optimization rounds can dump evidence for
any registered query they touch.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    out_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)

    from usw_big_data_analysis_spark.plans import explain_formatted
    from usw_big_data_analysis_spark.registry import all_queries
    from usw_big_data_analysis_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain_keys")
    qs = all_queries()

    for name in names:
        if name not in qs:
            print(f"skip (unknown): {name}")
            continue
        df = qs[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
