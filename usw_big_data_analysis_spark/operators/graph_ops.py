"""Connected components — duplicate-cluster assembly over candidate pairs.

MinHash-LSH (queries/dedup.py) emits near-duplicate PAIRS; an actual dedup
pipeline needs GROUPS ("keep one doc per cluster"), and pair→group is
connected components — inherently iterative, so it cannot be a single SQL
expression, but it maps cleanly onto DataFrame joins:

  labels ← node id
  repeat: every node takes min(own label, neighbors' labels)  (one
          hash-join + hash-agg per round — ordinary shuffles, fully
          parallel) until a fixpoint.

Plain min-label propagation converges in O(component diameter) rounds;
near-dup clusters are shallow (pairs share a bucket, diameters 2-4), so a
handful of rounds in practice. Each iteration here chains a PROPAGATE
round (neighbor min) with a POINTER-JUMP round (label := label(label) —
the compression half of large-star/small-star, Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14, public): the distance a
minimum label has travelled roughly doubles per iteration, so adversarial
long-chain graphs converge in O(log diameter) iterations instead of
O(diameter) — a 10^6-node path needs ~20 iterations, not 10^6 (r7 upgrade;
previously documented as the escape hatch, now the default).

Each iteration ends in ``localCheckpoint`` — without it the lineage
doubles per iteration and the planner re-executes the whole history (on a
cluster, use reliable ``checkpoint`` so a lost executor can't drop the
truncated lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_rounds: int = 25,
    edges_unique: bool = False,
) -> DataFrame:
    """(``node``, ``component``) for every node appearing in ``edges``
    (undirected; pass each pair once in either direction). ``component``
    is the smallest node id reachable from ``node``. Raises RuntimeError
    if the labels have not reached a fixpoint within ``max_rounds``
    iterations (2^max_rounds-diameter components — never in practice)
    rather than silently returning partial clusters.

    ``edges_unique=True`` asserts the caller passes each undirected pair
    exactly once (e.g. deduped ``a < b`` pairs): the symmetrized edge list
    is then duplicate-free by construction and the dedup shuffle is
    skipped (optimization r07, guide §2.4 — every current caller feeds
    groupBy/distinct output)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    if not edges_unique:
        sym = sym.distinct()
    sym = sym.localCheckpoint()
    # seed label = min(self, min neighbor): the same one-groupBy shuffle the
    # old node-distinct init cost, but it IS the first propagate round —
    # shallow near-dup clusters (star around the min id) start AT the
    # fixpoint and converge one full iteration (3 joins + checkpoint +
    # count) earlier. The fixpoint itself is unchanged: labels only ever
    # decrease toward the component minimum (optimization r07, guide §1.2).
    labels = sym.groupBy("a").agg(F.min("b").alias("nb")).select(
        F.col("a").alias("node"),
        F.least(F.col("a"), F.col("nb")).alias("label"),
    )

    for _ in range(max_rounds):
        updated = _pj_round(_cc_round(sym, labels)).localCheckpoint()
        # fixpoint test only needs EXISTENCE of a shrunk label: isEmpty is
        # a limit-1 probe over the checkpointed blocks, not a full count
        # (optimization r07, guide §1.4 — count forces the whole scan)
        converged = updated.filter("__shrunk").isEmpty()
        labels = updated.drop("__shrunk")
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_rounds} iterations"
        )
    return labels.select("node", F.col("label").alias("component"))


def _cc_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label-propagation round (un-checkpointed; plan shape pinned
    by tests/test_plan_quality.py). shuffle_hash hint on both iterate
    joins: edge list and label table are BOTH node-cardinality — they grow
    together, so no side is ever legitimately broadcastable at scale, and
    a runtime broadcast (AQE re-plans from actual sizes) would rebuild +
    pin the label table on the driver EVERY round: O(rounds) driver copies
    of a fact-scale table, the exact failure the 16x probe caught
    (broadcast build OOM under accumulated checkpoint blocks). Shuffle-hash
    keeps every round a pure executor-side exchange at any graph size."""
    nbr_min = (
        sym.join(labels.hint("shuffle_hash"), sym["b"] == labels["node"])
        .groupBy("a")
        .agg(F.min("label").alias("nbr_min"))
    )
    return labels.join(
        nbr_min.hint("shuffle_hash"),
        labels["node"] == nbr_min["a"],
        "left",
    ).select(
        "node",
        F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        (F.coalesce("nbr_min", "label") < F.col("label")).alias("__shrunk"),
    )


def _pj_round(labels: DataFrame) -> DataFrame:
    """Pointer-jump half of the iteration: label := label(label), ORing the
    change flag into ``__shrunk``. Every label value is itself a node in
    ``labels`` (labels only ever take existing node ids, monotonically
    non-increasing), so the lookup is a plain self equi-join — shuffle_hash
    for the same no-driver-broadcast reason as ``_cc_round``. Invariants
    preserved: label(node) stays a reachable node id (label(label) is
    reachable via label) and never increases (label(L) <= L for all L)."""
    parent = labels.select(
        F.col("node").alias("p_node"), F.col("label").alias("p_label")
    )
    return labels.join(
        parent.hint("shuffle_hash"), labels["label"] == parent["p_node"], "left"
    ).select(
        "node",
        F.coalesce("p_label", "label").alias("label"),
        (
            F.col("__shrunk") | (F.coalesce("p_label", "label") < F.col("label"))
        ).alias("__shrunk"),
    )
