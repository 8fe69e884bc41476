"""SURVEY.md §2.2 continued — iterative graph analytics on DataFrames:
PageRank over the customer↔supplier trade graph. Together with k-means
(centroid iteration) and dedup_components (star contraction) this
completes the iterative-algorithm triad: fixed-round dataflow loops
where each round is one join + one aggregation, no driver-side state
beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_DAMP = 0.85
_ROUNDS = 3

# shared edge definition: undirected trade edges cust<->supp realized
# as two directed edges, from orders x lineitem (custkey < 60 bounds
# the subgraph at test scale; at 100 TB the same query runs unbounded)
_DUCK_EDGES = """
    pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey < 60),
    edges AS (
      SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
      UNION ALL
      SELECT 's' || s AS src, 'c' || c AS dst FROM pairs),
    outd AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS n FROM edges)
"""


def _duck_round(k: int) -> str:
    return f"""
    r{k} AS (
      SELECT e.dst AS n,
             {1 - _DAMP} + {_DAMP} * sum(r{k - 1}.rank / outd.d) AS rank
      FROM edges e
      JOIN r{k - 1} ON e.src = r{k - 1}.n
      JOIN outd ON e.src = outd.src
      GROUP BY e.dst)
    """


_PAGERANK_ORACLE = (
    "WITH "
    + _DUCK_EDGES
    + ", r0 AS (SELECT n, 1.0 AS rank FROM nodes), "
    + ", ".join(_duck_round(k).strip() for k in range(1, _ROUNDS + 1))
    + f"""
    SELECT n AS node, round(rank, 6) AS rank
    FROM r{_ROUNDS} ORDER BY node
    """
)


@query("pagerank_trade_graph", oracle=_PAGERANK_ORACLE)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 rounds) over the undirected
    customer↔supplier trade graph. Each round is ONE edge-join + ONE
    destination aggregation — the canonical bulk-synchronous dataflow
    loop: no driver-side state, rank updates shuffle on the
    destination key, out-degrees computed once and reused every round
    (at cluster scale: broadcast if the node set is small, co-partition
    with edges if not). The oracle replays all three rounds as
    unrolled DuckDB CTEs, so every intermediate matters, not just the
    fixpoint shape. Undirected-as-two-directed edges keep every node's
    out-degree positive (no dangling-mass redistribution term)."""
    cat = Catalog(spark, sf_dir)
    # r12 scan-count fix: every iteration (and the out-degree and
    # rank-init branches) re-executed the orders x lineitem join from
    # parquet — 14 fact scans measured at runtime with zero exchange
    # reuse. The distinct pair list is eagerly localCheckpoint-ed
    # (the components.py discipline): one fact scan total, all loop
    # bodies re-derive edges from the edge-sized checkpoint.
    pairs = (
        cat.orders.where(F.col("o_custkey") < 60)
        .join(
            cat.lineitem,
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cn"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("sn"),
        )
        .distinct()
        .localCheckpoint()
    )
    edges = pairs.select(
        F.col("cn").alias("src"), F.col("sn").alias("dst")
    ).unionByName(
        pairs.select(F.col("sn").alias("src"), F.col("cn").alias("dst"))
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # contribution edges (src, dst, 1/outdeg) stay fixed all rounds.
    # r13 subtree-sweep fix: every round consumed `contrib` lazily, so
    # the degree join re-executed per round (3x in the final plan);
    # one edge-sized checkpoint computes it once — which is what
    # "computed once and reused every round" must mean physically.
    # r17 audit (r16 verdict item 4, guide §2.4): the per-round plan
    # re-exchanges + re-sorts this checkpoint on src in EVERY round
    # (3 src-exchanges, zero ReusedExchange — a LogicalRDD leaf drops
    # outputPartitioning, verified on this build). The co-partitioned
    # alternative — repartition(src) + sortWithinPartitions + eager
    # PERSIST, whose InMemoryTableScan keeps partitioning/ordering
    # and lets all three rounds ride one exchange (or broadcast the
    # statically-sized cache) — was implemented and measured: plans
    # confirmed the exchanges/sorts gone
    # (plans/r17/pagerank_trade_graph_after.txt), but 8 interleaved
    # fresh-process A/B rounds at the 10× replica read FLAT to ~5%
    # WORSE (old bests mean 1.51 s vs 1.61 s): the query is
    # scan-bound (the pairs build alone is 0.98 s of ~1.5 s) and the
    # graph tiny (2,381 pairs), so the per-round exchange savings are
    # smaller than the added broadcast builds + eager-materialization
    # job. Kept in the r16 checkpoint shape as the measured best at
    # this scale; the persist form is the documented re-plan for the
    # large-edge-list regime where the rounds dominate the scan.
    contrib = (
        edges.join(outd, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("d")).alias("w"))
        .localCheckpoint()
    )
    ranks = edges.select(F.col("src").alias("n")).distinct().select(
        "n", F.lit(1.0).alias("rank")
    )
    for _ in range(_ROUNDS):
        ranks = (
            contrib.join(ranks, contrib.src == ranks.n)
            .groupBy("dst")
            .agg(
                (
                    F.lit(1 - _DAMP)
                    + F.lit(_DAMP) * F.sum(F.col("rank") * F.col("w"))
                ).alias("rank")
            )
            .select(F.col("dst").alias("n"), "rank")
        )
    return ranks.select(
        F.col("n").alias("node"), F.round("rank", 6).alias("rank")
    ).orderBy("node")


_BFS_ROUNDS = 4


def _bfs_oracle() -> str:
    ctes = [
        _DUCK_EDGES.strip(),
        "src AS (SELECT 'c' || min(c) AS s FROM pairs)",
        """d0 AS (
      SELECT n, CASE WHEN n = (SELECT s FROM src) THEN 0 END AS d
      FROM nodes)""",
    ]
    for k in range(1, _BFS_ROUNDS + 1):
        ctes.append(f"""d{k} AS (
      SELECT n, min(d) AS d FROM (
        SELECT n, d FROM d{k - 1}
        UNION ALL
        SELECT e.dst AS n, p.d + 1 AS d
        FROM edges e JOIN d{k - 1} p ON e.src = p.n
        WHERE p.d IS NOT NULL)
      GROUP BY n)""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT n AS node, CAST(d AS BIGINT) AS dist
    FROM d{_BFS_ROUNDS} WHERE d IS NOT NULL ORDER BY node"""
    )


@query("shortest_path_bfs", oracle=_bfs_oracle())
def shortest_path_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted shortest-path BFS over the trade graph from the
    lowest-keyed customer node — the fourth member of the iterative
    triad (pagerank, k-means, star components): each of the 4 fixed
    rounds is one frontier join + one min-aggregation, all relational
    (no driver-side frontier set — the frontier IS a DataFrame, so it
    scales with the cluster, not the driver). Distances alternate
    customer/supplier layers in this bipartite graph; unreached nodes
    after 4 hops are excluded by both engines. The oracle unrolls the
    identical rounds as CTEs."""
    cat = Catalog(spark, sf_dir)
    # r12 scan-count fix: each BFS round's frontier join re-executed
    # the fact join (78 scans measured); one eager checkpoint of the
    # pair list makes the whole walk one fact scan.
    pairs = (
        cat.orders.where(F.col("o_custkey") < 60)
        .join(
            cat.lineitem,
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        .localCheckpoint()
    )
    fwd = pairs.select(
        F.concat(F.lit("c"), "c").alias("src"),
        F.concat(F.lit("s"), "s").alias("dst"),
    )
    edges = fwd.unionByName(
        pairs.select(
            F.concat(F.lit("s"), "s").alias("src"),
            F.concat(F.lit("c"), "c").alias("dst"),
        )
    )
    nodes = edges.select(F.col("src").alias("n")).distinct()
    src = pairs.agg(
        F.concat(F.lit("c"), F.min("c")).alias("s")
    )
    dist = nodes.join(B(src)).select(
        "n", F.when(F.col("n") == F.col("s"), 0).alias("d")
    )
    # r13 subtree-sweep fix: `dist` is consumed TWICE per round (the
    # frontier join and the min-union), so a lazy loop DOUBLES the plan
    # each round — the round-1 subtree appeared 2^(rounds-1) = 8x in
    # the final physical plan (invisible to the parquet scan audit:
    # the repeats hang off the pairs checkpoint). One node-sized
    # localCheckpoint per round keeps every round's work executed once.
    dist = dist.localCheckpoint()
    for _ in range(_BFS_ROUNDS):
        frontier = (
            edges.join(
                dist.where(F.col("d").isNotNull()),
                edges.src == F.col("n"),
            )
            .select(F.col("dst").alias("n"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.select("n", "d")
            .unionByName(frontier)
            .groupBy("n")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    return (
        dist.where(F.col("d").isNotNull())
        .select(F.col("n").alias("node"), F.col("d").cast("long").alias("dist"))
        .orderBy("node")
    )


# --- round-7: triangle counting + clustering coefficient -------------

#: co-purchase projection bounds: customers considered, minimum shared
#: customers for a supplier-supplier edge. Chosen so the projection is
#: genuinely sparse at gate scale (~763 edges / 4205 triangles at
#: sf0.01) instead of the near-complete graph a raw projection gives.
_TRI_CUST_BOUND = 10
_TRI_MIN_SHARED = 3

_TRI_ORACLE = f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey < {_TRI_CUST_BOUND}),
    proj AS (
      SELECT a.s AS s1, b.s AS s2
      FROM pairs a JOIN pairs b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SHARED}),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM proj e1 JOIN proj e2 ON e1.s2 = e2.s1
      JOIN proj e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
    tn AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri),
    tcount AS (SELECT node, count(*) AS n_triangles
               FROM tn GROUP BY node),
    deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT s1 AS node FROM proj
        UNION ALL SELECT s2 FROM proj) GROUP BY node)
    SELECT deg.node, CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(tcount.n_triangles, 0) AS BIGINT)
               AS n_triangles,
           CAST(COALESCE(tcount.n_triangles, 0) * 2000
                // (deg.degree * (deg.degree - 1)) AS BIGINT)
               AS clustering_permille
    FROM deg LEFT JOIN tcount ON deg.node = tcount.node
    WHERE deg.degree > 1
    ORDER BY deg.node
"""


@query("triangle_clustering_coeff", oracle=_TRI_ORACLE)
def triangle_clustering_coeff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    supplier co-purchase projection (suppliers joined by >=
    {_TRI_MIN_SHARED} shared customers). Spark runs the DEGREE-ORDERED
    ORIENTATION algorithm — every undirected edge is directed from its
    lower-(degree, id) endpoint, wedges are enumerated from each
    node's out-edges only, and each wedge is closed against the
    oriented edge set — so every triangle is found exactly once and
    the join fan-out per node is bounded by its ORIENTED out-degree
    (O(m^1.5) total work instead of Σdeg² — the difference between
    finishing and not on a power-law graph at 100 TB; the oracle
    counts the same triangles the naive a<b<c way). The clustering
    coefficient is exact integer permille: 2·1000·triangles /
    (deg·(deg-1))."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.orders.where(F.col("o_custkey") < _TRI_CUST_BOUND)
        .join(
            cat.lineitem,
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    a, b = pairs.alias("a"), pairs.alias("b")
    proj = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(
            F.col("a.s").alias("s1"), F.col("b.s").alias("s2")
        )
        .agg(F.count(F.lit(1)).alias("nshare"))
        .where(F.col("nshare") >= _TRI_MIN_SHARED)
        .select("s1", "s2")
        # r12 scan-count fix: the degree, orientation, two wedge
        # sides and the closing join each re-executed the projection
        # self-join from parquet — 94 fact scans measured. Checkpoint
        # the (sparse) projected edge list once; everything downstream
        # derives from it.
        .localCheckpoint()
    )
    deg = (
        proj.select(F.col("s1").alias("node"))
        .unionAll(proj.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient each edge from its lower-(degree, id) endpoint
    d1 = deg.select(
        F.col("node").alias("s1"), F.col("degree").alias("deg1")
    )
    d2 = deg.select(
        F.col("node").alias("s2"), F.col("degree").alias("deg2")
    )
    ed = proj.join(F.broadcast(d1), "s1").join(F.broadcast(d2), "s2")
    lower_first = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col("s1") < F.col("s2"))
    )
    # oriented feeds both wedge sides and the closing join — one more
    # edge-sized checkpoint keeps those three consumers off the
    # orientation join's lineage
    oriented = ed.select(
        F.when(lower_first, F.col("s1")).otherwise(F.col("s2")).alias("u"),
        F.when(lower_first, F.col("s2")).otherwise(F.col("s1")).alias("v"),
    ).localCheckpoint()
    # wedges from shared pivot u: (u→v), (u→w) with v < w is one
    # candidate per unordered pair; close against either orientation
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.u") == F.col("w2.u"))
        & (F.col("w1.v") < F.col("w2.v")),
    ).select(
        F.col("w1.u").alias("p"),
        F.col("w1.v").alias("x"),
        F.col("w2.v").alias("y"),
    )
    # close with an EQUI semi-join: each oriented edge appears once, so
    # the union of both directions holds every edge exactly once per
    # direction and (x = cu AND y = cv) hash-matches the wedge iff the
    # undirected edge {x, y} exists. The previous OR-of-equality-pairs
    # predicate forced a BroadcastNestedLoopJoin — O(wedges × edges)
    # probe work and the full edge list resident in memory, worse than
    # the naive triple join at 100× graph scale.
    closer = oriented.select(
        F.col("u").alias("cu"), F.col("v").alias("cv")
    ).unionAll(
        oriented.select(F.col("v").alias("cu"), F.col("u").alias("cv"))
    )
    tri = wedges.join(
        closer,
        (F.col("x") == F.col("cu")) & (F.col("y") == F.col("cv")),
        "leftsemi",
    )
    # one pass over the triangle set: explode the three corners instead
    # of unioning three selects of `tri`, which inlined the whole
    # O(m^1.5) wedge-enumeration + close subtree 3× in the physical plan
    tnodes = (
        tri.select(
            F.explode(F.array("p", "x", "y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(tnodes, "node", "left")
        .where(F.col("degree") > 1)
        .select(
            "node",
            F.col("degree").cast("long"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.expr(
                "coalesce(n_triangles, 0) * 2000"
                " div (degree * (degree - 1))"
            )
            .cast("long")
            .alias("clustering_permille"),
        )
        .orderBy("node")
    )
