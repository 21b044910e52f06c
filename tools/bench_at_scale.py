"""One-decade-up bench point (VERDICT r6 #9): rebuild the fixture at N× the
sf0.1 facts with the same referentially-consistent key shifts as
tools/parity_at_scale.py, then run bench.py against the built dir.

Why this exists: the 2× ratio contract is measured at sf0.1, where Spark's
fixed per-stage overhead (scheduling, codegen, py4j) dominates sub-second
queries and DuckDB's in-process execution is nearly free — the seven
per-query prepared ratios >2× flagged in VERDICT r6 are all sub-second
absolute. One decade up, the fixed overhead amortizes and the ratio shows
the engine's actual throughput slope. The output is the same one-line JSON
contract as bench.py (sf records 1.0 for the default factor 10).

Usage:
    python tools/bench_at_scale.py [--factor 10] [--sf-dir .../sf0.1]
                                   [--json BENCH_SF10_r07.json] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)
sys.path.insert(0, TOOLS)

from parity_at_scale import build_consistent_dir  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--json", default=None)
    ap.add_argument("--keep", action="store_true", help="keep the built dir")
    args = ap.parse_args()

    from usw_big_data_analysis_spark.session import get_spark

    base_sf = float(args.sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench_at_scale_build")
    built = build_consistent_dir(spark, args.sf_dir, args.factor)
    spark.stop()  # bench.py runs its own session against the built dir

    # bench.py derives its "sf" record from the trailing sf<value> of the
    # dir name — give the built fixture one so the artifact self-describes
    sf_tag = f"{base_sf * args.factor:g}"
    tagged = os.path.join(os.path.dirname(built), f"usw_bench_sf{sf_tag}")
    shutil.rmtree(tagged, ignore_errors=True)
    os.rename(built, tagged)
    try:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=tagged)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            stdout=subprocess.PIPE,
            text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        print(line)
        if args.json and line:
            with open(args.json, "w") as fh:
                json.dump(
                    {"factor": args.factor, "base_sf_dir": args.sf_dir,
                     "parsed": json.loads(line)},
                    fh,
                    indent=1,
                )
        return out.returncode
    finally:
        if not args.keep:
            shutil.rmtree(tagged, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
