"""Registry-wide wall-clock sweep — the breadth companion to bench.py.

bench.py times 16 headliners carefully; this times EVERY registered query
(noop sink, best-of-N after one warmup) so optimization rounds can rank the
long tail by measured cost instead of guessing. One JSONL line per key is
appended as it completes (crash-safe; tail -f friendly):

    {"name": ..., "build_s": ..., "runs_s": [...], "best_s": ...}

Build time (Python plan construction + first noop execution, which for the
driver-loop trainers IS the training) is recorded separately from the
steady-state runs, mirroring bench.py's plan_build_s / prepared_s split.

    python tools/time_registry.py [--sf-dir DIR] [--out FILE] [--only a,b]
                                  [--runs 3] [--skip-done]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/registry_times.jsonl")
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-done", action="store_true",
                    help="skip keys already present in --out")
    args = ap.parse_args()

    from usw_big_data_analysis_spark.registry import all_queries
    from usw_big_data_analysis_spark.session import get_spark

    done: set[str] = set()
    if args.skip_done and os.path.exists(args.out):
        with open(args.out) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["name"])
                except (ValueError, KeyError):
                    pass

    spark = get_spark("time_registry")
    qs = all_queries()
    names = sorted(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    with open(args.out, "a") as out:
        for i, name in enumerate(names):
            if name in done:
                continue
            spark.sparkContext.setJobDescription(f"time:{name}")
            rec: dict = {"name": name}
            try:
                t0 = time.time()
                df = qs[name](spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                rec["build_s"] = round(time.time() - t0, 3)
                runs = []
                for _ in range(args.runs):
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    runs.append(round(time.time() - t0, 3))
                rec["runs_s"] = runs
                rec["best_s"] = min(runs)
            except Exception as exc:  # noqa: BLE001 — record and continue
                rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(f"[{i + 1}/{len(names)}] {name}: "
                  f"{rec.get('best_s', rec.get('error'))}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
