"""Repo-wide physical-plan audit — the 100 TB plan-shape report.

Builds every registered query's DataFrame (plans only — nothing executes
except driver-side parameter estimation some queries do) and prints one
line per query:

    <name>  shuffles=N bhj=N smj=N bnlj=N pushdown=T/F partial_aggs=N
            python=N  [RAW-SP!]

RAW-SP flags a SinglePartition exchange whose subtree reaches a parquet
scan with no cardinality-compressing node (HashAggregate / top-k / limit)
in between — raw rows on one partition, the canonical scale killer.

    python tools/plan_audit.py [--only a,b] [--sf-dir DIR] [--sort-by shuffles]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def raw_singlepartition(plan: str) -> bool:
    """True if any SinglePartition exchange sees raw scan rows (no
    compressing node on the path) — mirrors tests/test_rank_ops.py."""
    sp_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", plan
        )
    }
    if not sp_ids:
        return False
    agg_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) (?:HashAggregate|ObjectHashAggregate|SortAggregate|"
            r"TakeOrderedAndProject|GlobalLimit|CollectLimit)",
            plan,
        )
    }
    lines = plan.splitlines()
    tree = [
        l for l in lines[: lines.index("")] if re.search(r"\((\d+)\)\s*$", l)
    ]
    stack: list[tuple[int, int]] = []
    for line in tree:
        node_id = int(re.search(r"\((\d+)\)\s*$", line).group(1))
        indent = len(line) - len(line.lstrip(" *+-"))
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if "Scan parquet" in line or "Scan ExistingRDD" in line:
            path = [nid for _, nid in stack]
            for i, nid in enumerate(path):
                if nid in sp_ids and not any(a in agg_ids for a in path[i + 1 :]):
                    return True
        stack.append((indent, node_id))
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--sort-by", default="name", choices=["name", "shuffles", "python"])
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from usw_big_data_analysis_spark.plans import audit, explain_formatted
    from usw_big_data_analysis_spark.plans.inspect import (
        perrow_round_count,
        unpartitioned_window_count,
    )
    from usw_big_data_analysis_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    names = args.only.split(",") if args.only else sorted(qs)

    rows = []
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            a = audit(df)
            plan = explain_formatted(df)
            raw_sp = raw_singlepartition(plan)
            uw = unpartitioned_window_count(df)
            prr = perrow_round_count(plan)
        except Exception as exc:  # plan construction failed — report, keep going
            print(f"{name:36s} ERROR {type(exc).__name__}: {exc}")
            continue
        rows.append((name, a, raw_sp, uw, prr))

    key = {
        "name": lambda r: r[0],
        "shuffles": lambda r: -r[1].shuffles,
        "python": lambda r: -r[1].python_evals,
    }[args.sort_by]
    flagged = 0
    uw_flagged = 0
    prr_flagged = 0
    for name, a, raw_sp, uw, prr in sorted(rows, key=key):
        flag = (
            ("  RAW-SP!" if raw_sp else "")
            + (f"  UNPART-WINDOW({uw})!" if uw else "")
            + (f"  ROUND@ROW({prr})" if prr else "")
        )
        flagged += bool(raw_sp)
        uw_flagged += bool(uw)
        prr_flagged += bool(prr)
        print(f"{name:36s} {a}{flag}")
    print(
        f"== {len(rows)} plans, {flagged} with raw-row SinglePartition, "
        f"{uw_flagged} with unpartitioned WindowExec, "
        f"{prr_flagged} with per-row BigDecimal round =="
    )


if __name__ == "__main__":
    main()
