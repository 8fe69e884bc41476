"""SURVEY.md §2.2 continued — iterative graph analytics on DataFrames:
PageRank over the customer↔supplier trade graph. Together with k-means
(centroid iteration) and dedup_components (label propagation) this
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
    )
    edges = pairs.select(
        F.col("cn").alias("src"), F.col("sn").alias("dst")
    ).unionByName(
        pairs.select(F.col("sn").alias("src"), F.col("cn").alias("dst"))
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # contribution edges (src, dst, 1/outdeg) stay fixed all rounds
    contrib = edges.join(outd, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("d")).alias("w")
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
    triad (pagerank, k-means, label propagation): each of the 4 fixed
    rounds is one frontier join + one min-aggregation, all relational
    (no driver-side frontier set — the frontier IS a DataFrame, so it
    scales with the cluster, not the driver). Distances alternate
    customer/supplier layers in this bipartite graph; unreached nodes
    after 4 hops are excluded by both engines. The oracle unrolls the
    identical rounds as CTEs."""
    cat = Catalog(spark, sf_dir)
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
        )
    return (
        dist.where(F.col("d").isNotNull())
        .select(F.col("n").alias("node"), F.col("d").cast("long").alias("dist"))
        .orderBy("node")
    )
