"""Physical-plan audits.

Correctness says the numbers match; these helpers pin the plan *shape* —
the thing that decides whether a query survives a 100x scale-up. Used by
tests/test_plan_quality.py and available interactively:

    from usw_big_data_analysis_spark.plans import audit
    print(audit(df))
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def shuffle_count(plan: str | DataFrame) -> int:
    """Number of exchanges in the plan tree (each is a full shuffle or a
    broadcast build — the dominant cost terms at scale)."""
    text = plan if isinstance(plan, str) else explain_formatted(plan)
    return len(re.findall(r"^\s*(?:\+-|:-)? ?Exchange", text, re.M))


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of ``WindowExec`` nodes with an empty partition spec — the
    ones that log ``No Partition Defined`` and move the input to a single
    partition. The suite invariant (bounded_seq convention) is zero,
    everywhere: bounded tables use triangular joins instead.

    Detection: in ``treeString`` a Window node prints its expression,
    partition and order groups as ``Window [...], [...], [...]`` — an
    unpartitioned one omits the middle group, leaving one ``], [``
    separator instead of two.
    """
    tree = df._jdf.queryExecution().executedPlan().treeString()
    n = 0
    for line in tree.splitlines():
        m = re.search(r"(?:^|[\s\-:])Window \[", line)
        if m and line.count("], [") < 2:
            n += 1
    return n


@dataclass
class PlanAudit:
    shuffles: int
    broadcast_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    has_filter_pushdown: bool
    partial_aggregates: int
    python_evals: int
    read_schemas: list[str]

    def __str__(self) -> str:  # compact one-line summary
        return (
            f"shuffles={self.shuffles} bhj={self.broadcast_joins} "
            f"smj={self.sort_merge_joins} bnlj={self.nested_loop_joins} "
            f"pushdown={self.has_filter_pushdown} "
            f"partial_aggs={self.partial_aggregates} python={self.python_evals}"
        )


def audit(df: DataFrame) -> PlanAudit:
    plan = explain_formatted(df)
    return PlanAudit(
        shuffles=shuffle_count(plan),
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        has_filter_pushdown="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        partial_aggregates=len(re.findall(r"HashAggregate", plan)) // 2,
        python_evals=plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        + plan.count("BatchEvalPython"),
        read_schemas=re.findall(r"ReadSchema: (.+)", plan),
    )
