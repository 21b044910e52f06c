"""Graph analytics beyond connected components (extension family, sibling
of operators/graph_ops.py): integer-arithmetic PageRank and exact triangle
counting over the part co-purchase graph (parts are linked when co-ordered;
the A-priori support-≥2 prune bounds the edge blowup).

Determinism: PageRank is the INTEGER-MASS variant — every node starts with
10^12 mass units; each iteration routes `mass div out_degree` units along
each edge and damps with integer `div 100` arithmetic (remainders are
deliberately discarded — the variant is exactly reproducible on any engine,
unlike float PageRank whose sums are order-dependent). Fixed 4 iterations,
unrolled in the oracle as chained CTEs (no recursive aggregation needed).

Scale notes (100 TB):
- Edges build from per-order distinct item lists with the support prune
  BEFORE the quadratic self-join; both directions materialize once.
- Each PageRank iteration is one shuffle: groupBy(dst) of per-edge
  contributions joined to the current mass by src. The DataFrame loop
  localCheckpoints per round (same pattern as graph_ops.connected_
  components) so the plan doesn't grow with iterations.
- Triangle counting orients edges (a<b) so each triangle counts once; the
  heavy join is edge⋈edge on the shared vertex, then one hash probe for
  the closing edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_MASS = 10**12  # initial integer mass units per node
_ITERS = 4

# shared SQL: undirected co-order edge list with support->=2 prune
_EDGE_CTES = """
    items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    freq AS (
      SELECT pk FROM items GROUP BY pk HAVING count(*) >= 2
    ),
    fitems AS (
      SELECT i.ok, i.pk FROM items i JOIN freq ON i.pk = freq.pk
    ),
    pairs AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM fitems a JOIN fitems b ON a.ok = b.ok AND a.pk < b.pk
    ),
    edges AS (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL SELECT v, u FROM pairs
    ),
    deg AS (
      SELECT src, count(*) AS d FROM edges GROUP BY src
    )"""


def _edges_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    freq = items.groupBy("pk").agg(F.count("*").alias("c")).filter("c >= 2")
    fitems = items.join(freq.select("pk"), "pk")
    a, b = fitems.alias("a"), fitems.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    return pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


def _pagerank_sql() -> str:
    base = 15 * _MASS // 100  # damping: 0.15 * MASS as exact integer
    ctes = [
        _EDGE_CTES,
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        f"pr0 AS (SELECT node, CAST({_MASS} AS BIGINT) AS mass FROM nodes)",
    ]
    for k in range(_ITERS):
        ctes.append(
            f"""pr{k + 1} AS (
      SELECT n.node,
             {base} + (85 * coalesce(s.incoming, 0)) // 100 AS mass
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.mass // deg.d) AS BIGINT) AS incoming
        FROM pr{k} p
        JOIN edges e ON p.node = e.src
        JOIN deg ON deg.src = p.node
        GROUP BY e.dst
      ) s ON n.node = s.node
    )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, mass FROM pr{_ITERS}"
    )


@query("pagerank_int", oracle=_pagerank_sql())
def pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-mass PageRank ({iters} damped iterations, d=0.85) on the
    part co-purchase graph. All arithmetic is bigint floor division —
    bit-identical across engines and cluster layouts, where float PageRank
    never is. The DataFrame loop localCheckpoints per iteration so plan
    depth stays constant; each round is exactly one groupBy(dst) shuffle
    plus a broadcast-or-shuffle join to the (node, degree) table.""".format(
        iters=_ITERS
    )
    edges = _edges_spark(spark, sf_dir)
    # rename deg's key so the edges⋈deg lineage can't collide (both descend
    # from the same edge DataFrame — Spark flags the self-join as ambiguous)
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("d"))
        .select(F.col("src").alias("dnode"), "d")
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    base = 15 * _MASS // 100
    pr = nodes.select("node", F.lit(_MASS).cast("bigint").alias("mass"))
    edges = edges.localCheckpoint()
    deg = deg.localCheckpoint()
    for _ in range(_ITERS):
        contrib = (
            pr.join(edges, pr["node"] == edges["src"])
            .join(deg, pr["node"] == deg["dnode"])
            .select(
                F.col("dst").alias("node"),
                F.expr("mass div d").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("incoming"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(incoming, 0) div 100")
                ).alias("mass"),
            )
            .localCheckpoint()
        )
    return pr


_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_sql() -> str:
    """Fixed-round k-core peel unrolled as chained CTEs (same pattern as the
    PageRank oracle — deterministic iteration count instead of recursion)."""
    ctes = [
        _EDGE_CTES,
        "e0 AS (SELECT src, dst FROM edges)",
    ]
    for r in range(_KCORE_ROUNDS):
        ctes.append(
            f"""alive{r + 1} AS (
      SELECT src AS node FROM e{r} GROUP BY src HAVING count(*) >= {_KCORE_K}
    ),
    e{r + 1} AS (
      SELECT e.src, e.dst FROM e{r} e
      JOIN alive{r + 1} a ON e.src = a.node
      JOIN alive{r + 1} b ON e.dst = b.node
    )"""
        )
    rounds = " UNION ALL ".join(
        f"SELECT {r + 1} AS round, CAST(count(DISTINCT src) AS BIGINT) AS n_alive,"
        f" CAST(count(*) AS BIGINT) AS n_edges FROM e{r + 1}"
        for r in range(_KCORE_ROUNDS)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rounds


@query("graph_kcore", oracle=_kcore_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k={k}, {rounds} fixed rounds): repeatedly drop nodes
    with degree < k and the edges touching them — the standard subgraph
    densification step before community detection. Each round is one
    degree aggregation + two semi-joins; the DataFrame loop
    localCheckpoints per round so plan depth stays constant (the
    graph_ops.connected_components pattern). A production run iterates to
    fixpoint; the fixed round count keeps the oracle expressible as chained
    CTEs, and the per-round (n_alive, n_edges) trajectory is the checked
    output.""".format(k=_KCORE_K, rounds=_KCORE_ROUNDS)
    e = _edges_spark(spark, sf_dir).localCheckpoint()
    out = []
    for r in range(_KCORE_ROUNDS):
        alive = (
            e.groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        e = (
            e.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        out.append(
            e.agg(
                F.countDistinct("src").alias("n_alive"),
                F.count("*").alias("n_edges"),
            ).select(F.lit(r + 1).alias("round"), "n_alive", "n_edges")
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


@query(
    "graph_triangles",
    oracle=f"""
    WITH {_EDGE_CTES},
    o AS (SELECT u, v FROM pairs)
    SELECT count(*) AS n_triangles FROM o e1
    JOIN o e2 ON e1.v = e2.u
    JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the co-purchase graph via the oriented
    (a<b) edge list: each oriented edge (u,v) counts its closing third
    vertices as |N⁺(u) ∩ N⁺(v)| over per-node ORIENTED ADJACENCY ARRAYS
    (``array_intersect`` on distinct neighbor sets — a triangle a<b<c is
    counted exactly once, at edge (a,b) with witness c).

    The wedge-join form this replaces (e1(u<v)⋈e2(v<w) closed by an
    e3(u,w) join) materialized and SHUFFLED 49M wedge rows into the
    closure join at sf0.1 while the edge list is only 1.2M rows; the
    adjacency form does the same Σdeg² element comparisons inside a
    per-row JVM set intersection, so the only shuffles are the 1.2M-row
    edge list and the node-keyed adjacency build — ~50x fewer shuffle
    bytes, same count (optimization r07, guide §2.3/§2.4; 6.0s → ~1s).
    The oriented edge list is localCheckpointed: both plan uses (edge
    stream + adjacency build) reuse one co-order join + distinct pass.
    Support prune keeps the edge set near-linear in orders."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    freq = items.groupBy("pk").agg(F.count("*").alias("c")).filter("c >= 2")
    fitems = items.join(freq.select("pk"), "pk")
    a, b = fitems.alias("a"), fitems.alias("b")
    o = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    adj = o.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    au = adj.selectExpr("u", "nbrs AS nbrs_u")
    av = adj.selectExpr("u AS v", "nbrs AS nbrs_v")
    closed = (
        o.join(au, "u")
        .join(av, "v")
        .select(
            F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("n_closing")
        )
    )
    return closed.agg(
        F.coalesce(F.sum("n_closing"), F.lit(0))
        .cast("long")
        .alias("n_triangles")
    )


# --- bounded BFS layers from a source node -----------------------------------
_BFS_HOPS = 4


def _bfs_sql() -> str:
    ctes = [
        _EDGE_CTES,
        "d0 AS (SELECT min(src) AS node FROM edges)",
    ]
    for k in range(_BFS_HOPS):
        ctes.append(
            f"""d{k + 1} AS (
      SELECT DISTINCT e.dst AS node
      FROM d{k} f JOIN edges e ON f.node = e.src
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT node, {k} AS dist FROM d{k}" for k in range(_BFS_HOPS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    lv AS ({union}),
    firsts AS (SELECT node, CAST(min(dist) AS INT) AS dist FROM lv GROUP BY node)
    SELECT dist, count(*) AS n_nodes FROM firsts GROUP BY dist"""
    )


@query("graph_bfs_layers", oracle=_bfs_sql())
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability layers from the smallest part node over the
    co-purchase graph: how many nodes first become reachable at each hop
    count ≤ {_BFS_HOPS} (the neighborhood-growth profile — the diameter /
    connectivity diagnostic run before any iterative graph algorithm).

    Scale shape: classic frontier BFS — each hop is ONE equi-join of the
    current frontier against the edge list plus an anti-join against the
    visited set, so per-round shuffle is bounded by frontier x degree and
    the plan depth is fixed ({_BFS_HOPS} unrolled rounds, the pagerank_int
    pattern). The oracle unions per-hop reach sets and takes min(dist) —
    same result, quadratic re-reach work the frontier form avoids."""
    # localCheckpoint per round (pagerank_int / graph_ops pattern): without
    # it every BFS round re-derives the quadratic co-order edge join and
    # the visited chain doubles the plan per hop
    edges = _edges_spark(spark, sf_dir).localCheckpoint()
    src0 = edges.agg(F.min("src").alias("node")).localCheckpoint()
    frontier = src0
    visited = src0
    layers = [src0.select("node", F.lit(0).alias("dist"))]
    for k in range(_BFS_HOPS):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        layers.append(nxt.select("node", F.lit(k + 1).alias("dist")))
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    from functools import reduce

    firsts = reduce(DataFrame.unionAll, layers)
    return firsts.groupBy(F.col("dist").cast("int").alias("dist")).agg(
        F.count("*").alias("n_nodes")
    )


# --- link prediction: neighbor-set Jaccard over wedges -----------------------
_LP_MIN_COMMON = 2


@query(
    "graph_link_jaccard",
    oracle=f"""
    WITH {_EDGE_CTES},
    wedges AS (
      SELECT a.src AS u, b.src AS v, count(*) AS n_common
      FROM edges a JOIN edges b
        ON a.dst = b.dst AND a.src < b.src
      GROUP BY a.src, b.src
      HAVING count(*) >= {_LP_MIN_COMMON}
    ),
    notlinked AS (
      SELECT w.u, w.v, w.n_common
      FROM wedges w
      LEFT JOIN edges e ON w.u = e.src AND w.v = e.dst
      WHERE e.src IS NULL
    )
    SELECT n.u, n.v, n.n_common,
           round(CAST(n.n_common AS DOUBLE)
                 / (du.d + dv.d - n.n_common), 6) AS jaccard
    FROM notlinked n
    JOIN deg du ON n.u = du.src
    JOIN deg dv ON n.v = dv.src
    ORDER BY jaccard DESC, n.u, n.v LIMIT 100
    """,
)
def graph_link_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction scores: for UNLINKED node pairs sharing >=
    {_LP_MIN_COMMON} neighbors, the Jaccard similarity of their neighbor
    sets (|N(u)∩N(v)| / |N(u)∪N(v)|), shortlisted to the top-100 by
    score — the classic recommend-an-edge feature (parts that should
    co-sell but don't yet); the final top-k compiles to
    TakeOrderedAndProject, so the dense candidate set never leaves the
    executors.

    Scale shape: candidate pairs come from the WEDGE join (edges meeting
    at a shared neighbor — work ∝ Σ deg², the triangle-counting cost,
    never |V|²); existing edges drop via an anti-join; degrees broadcast
    back. The common-neighbor count from the wedge groupBy IS the
    intersection size, so no second set operation runs."""
    from ..operators.graph_ops import wedge_pair_counts

    edges = _edges_spark(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.expr("count(*) AS d"))
    # wedge self-join + 101M-group pair aggregate + 33M-row anti-join
    # replaced by the blob-kernel plan (see wedge_pair_counts' contract:
    # same wedge set, exact counts, >= min_common / linked-pair / local
    # top-100 prunes all run inside the bucket kernel, so only ≤100 rows
    # per bucket cross back to the JVM) — optimization r07, guide
    # §2.2/§4.2; parity re-verified vs the join-form oracle at sf0.01 +
    # sf0.1. The jaccard VALUE below is still computed in SQL; the kernel
    # key is selection-only and replicates round(x, 6) exactly.
    notlinked = wedge_pair_counts(
        edges, min_common=_LP_MIN_COMMON, top_k_jaccard=100
    )
    du = deg.selectExpr("src AS u", "d AS du")
    dv = deg.selectExpr("src AS v", "d AS dv")
    return (
        notlinked.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .selectExpr(
            "u",
            "v",
            "n_common",
            N.spark_fround("CAST(n_common AS DOUBLE) / (du + dv - n_common)", 6)
            + " AS jaccard",
        )
        .orderBy(F.desc("jaccard"), F.asc("u"), F.asc("v"))
        .limit(100)
    )


# --- degree distribution of the co-purchase graph ----------------------------
@query(
    "graph_degree_dist",
    oracle=f"""
    WITH {_EDGE_CTES}
    SELECT CAST(least(floor(ln(CAST(d.d AS DOUBLE)) / ln(2.0)), 15) AS INT)
             AS log2_degree_bin,
           count(*) AS n_nodes,
           CAST(min(d.d) AS BIGINT) AS min_degree,
           CAST(max(d.d) AS BIGINT) AS max_degree
    FROM deg d GROUP BY log2_degree_bin
    """,
)
def graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-binned degree distribution of the co-purchase graph — the
    heavy-tail check run before any iterative graph algorithm (a fat
    tail predicts pagerank/k-core hotspot partitions and motivates the
    salting operators). Degree aggregation + a 16-bin rollup; the bin is
    floor(log2 degree) — integer-exact in both engines because degrees
    are whole numbers and ln ratios hit no representable boundary below
    2^53."""
    edges = _edges_spark(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.expr("count(*) AS d"))
    return deg.groupBy(
        F.expr(
            "CAST(least(floor(ln(CAST(d AS DOUBLE)) / ln(2.0D)), 15) AS INT)"
        ).alias("log2_degree_bin")
    ).agg(
        F.expr("count(*) AS n_nodes"),
        F.expr("CAST(min(d) AS BIGINT) AS min_degree"),
        F.expr("CAST(max(d) AS BIGINT) AS max_degree"),
    )


# --- degree assortativity coefficient -----------------------------------------
@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_EDGE_CTES},
    de AS (
      SELECT da.d AS dx, db.d AS dy
      FROM edges e
      JOIN deg da ON e.src = da.src
      JOIN deg db ON e.dst = db.src
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(CAST(dx * dy AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(dx * dx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(dy * dy AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      FROM de
    )
    SELECT m AS n_directed_edges,
           round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                          0.0), 6) AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (Newman 2002):
    the Pearson correlation of endpoint degrees over the directed edge
    list — positive means hubs attach to hubs (social-network shape),
    negative means hub-and-spoke (technological shape). Tells a graph
    pipeline whether degree-based partitioning will skew.

    Exactness: endpoint degrees are integers joined onto the edge list;
    all five sufficient statistics are integer/DECIMAL sums; one double
    formula at the end. The degree join broadcasts (the degree table is
    vertex-sized); the edge list is never shuffled wider than itself."""
    edges = _edges_spark(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    de = (
        edges.join(
            F.broadcast(deg.select(F.col("src").alias("u"), F.col("d").alias("dx"))),
            F.col("src") == F.col("u"),
        )
        .join(
            F.broadcast(deg.select(F.col("src").alias("v"), F.col("d").alias("dy"))),
            F.col("dst") == F.col("v"),
        )
        .select("dx", "dy")
    )
    s = de.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(dx * dy AS DECIMAL(38,0))")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("CAST(dx * dx AS DECIMAL(38,0))")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("CAST(dy * dy AS DECIMAL(38,0))")).cast("decimal(38,0)").alias("syy"),
    )
    return s.selectExpr(
        "m AS n_directed_edges",
        """round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                    0.0), 6) AS assortativity""",
    )
