"""SURVEY.md §2 round-9 fifth wave (queued for the r10 window):

- ``stream_chained_windows`` — hourly→daily chained time-window
  aggregation in ONE streaming query (multiple stateful operators,
  append mode), full oracle encoding the exact emit rule.
- ``mann_kendall_trend`` — nonparametric monotonic-trend test over
  the daily revenue series: S statistic and the tie-corrected
  variance numerator in exact integers over the DAILY rollup (the
  pair join is days², independent of corpus size), Z closed-form.
- ``hits_hub_authority`` — two exact HITS iterations over the trade
  graph (the eigenvector twin of pagerank_trade_graph): hub/authority
  mat-vecs in exact integers, permille output.
- ``lorenz_curve_deciles`` — cumulative spend share by customer
  decile (the curve behind gini_concentration_index), exact permille.
- ``source_centroid_cosine`` — pairwise cosine similarity between
  per-source embedding centroids: counts cancel in cosine, so the
  integer component SUMS are the centroids; every accumulator exact,
  cosine one closed-form double per pair.
- ``orc_bloom_filter_write`` — ORC writer bloom-filter options (the
  columnar sibling of parquet_bloom_filter_write).

Standing rules as round9b: DECIMAL(38,0)/HUGEINT for sums past
int64, float only in final closed forms over identical exact
integers, no ``--`` comments in oracle strings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.ranking import with_global_rank
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import scratch_path

B = F.broadcast

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# chained streaming windows
# --------------------------------------------------------------------


@query(
    "stream_chained_windows",
    oracle="""
    WITH b AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    mx AS (SELECT max(ts) AS m FROM b),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             event_type, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2, 3),
    daily AS (
      SELECT d, event_type,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(max(c) AS BIGINT) AS max_hour
      FROM hourly GROUP BY d, event_type)
    SELECT d AS day, event_type, n_events, n_hours, max_hour
    FROM daily, mx
    WHERE d + INTERVAL 1 DAY <= mx.m - INTERVAL 1 HOUR
    ORDER BY day, event_type
    """,
)
def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained hourly→daily windows in one streaming query (multiple
    stateful operators, append mode) — see
    streaming/jobs.py::chained_windows for the state-bound analysis.
    The oracle replays the batch rollup and keeps exactly the days
    the append watermark finalizes (day end ≤ max ts − 1 h)."""
    from hdsp_hive_release_src_spark.streaming import jobs

    return jobs.chained_windows(spark, sf_dir).orderBy(
        "day", "event_type"
    )


# --------------------------------------------------------------------
# Mann-Kendall trend test
# --------------------------------------------------------------------

_MK_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum({_CENTS}) AS BIGINT) AS x
  FROM orders GROUP BY 1),
pairs AS (
  SELECT CASE WHEN b.x > a.x THEN 1
              WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON b.d > a.d),
s AS (SELECT CAST(sum(sgn) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs),
n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
ties AS (
  SELECT coalesce(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
             AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY x HAVING count(*) > 1)),
v AS (
  SELECT nd, s_stat, n_pairs,
         nd * (nd - 1) * (2 * nd + 5) - tie_term AS var18
  FROM s, n, ties)
SELECT nd AS n_days, s_stat, n_pairs, var18,
       (s_stat - CASE WHEN s_stat > 0 THEN 1
                      WHEN s_stat < 0 THEN -1 ELSE 0 END)
         / sqrt(var18 / 18.0) AS z_stat
FROM v
"""


@query("mann_kendall_trend", oracle=_MK_ORACLE)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily revenue: S = sum
    over day pairs i<j of sign(x_j − x_i) with tie-corrected variance, the
    standard monotone-drift alarm for a metric series. S, the pair
    count, and 18·Var are exact integers; the continuity-corrected Z
    is one closed-form double. The pair join runs on the DAILY
    rollup — days², not rows², so a 100 TB corpus still joins ~2.4k
    × 2.4k rows."""
    o = Catalog(spark, sf_dir).orders
    # r12 scan-count fix: both pair-join sides, the day count and the
    # tie term each re-ran the daily rollup from parquet (4 scans
    # measured); the days-sized rollup is checkpointed once
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.expr(_CENTS)).cast("long").alias("x"))
        .localCheckpoint()
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(b, F.col("b.d") > F.col("a.d")).select(
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = pairs.agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        s.crossJoin(B(n))
        .crossJoin(B(ties))
        .withColumn(
            "var18",
            F.expr("nd * (nd - 1) * (2 * nd + 5) - tie_term"),
        )
    )
    return v.select(
        F.col("nd").alias("n_days"),
        "s_stat",
        "n_pairs",
        "var18",
        F.expr(
            "(s_stat - CASE WHEN s_stat > 0 THEN 1"
            "               WHEN s_stat < 0 THEN -1 ELSE 0 END)"
            " / sqrt(var18 / 18.0)"
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------
# HITS hub/authority (2 exact iterations)
# --------------------------------------------------------------------

_HITS_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey < 60),
a1 AS (
  SELECT dst AS node, CAST(count(*) AS BIGINT) AS a
  FROM pairs GROUP BY dst),
h1 AS (
  SELECT src AS node, CAST(sum(a1.a) AS BIGINT) AS h
  FROM pairs JOIN a1 ON pairs.dst = a1.node GROUP BY src),
a2 AS (
  SELECT dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
  FROM pairs JOIN h1 ON pairs.src = h1.node GROUP BY dst),
h2 AS (
  SELECT src AS node, CAST(sum(a2.a) AS BIGINT) AS h
  FROM pairs JOIN a2 ON pairs.dst = a2.node GROUP BY src),
mh AS (SELECT max(h) AS m FROM h2),
ma AS (SELECT max(a) AS m FROM a2)
SELECT node, 'hub' AS role,
       CAST(h * 1000 // mh.m AS BIGINT) AS score_permille
FROM h2, mh
UNION ALL
SELECT node, 'authority' AS role,
       CAST(a * 1000 // ma.m AS BIGINT) AS score_permille
FROM a2, ma
ORDER BY role, node
"""


@query("hits_hub_authority", oracle=_HITS_ORACLE)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact HITS iterations over the customer→supplier trade
    graph (hubs = customers spreading orders widely, authorities =
    suppliers drawing from well-spread customers): a₁ = Aᵀ1 (in-
    degree), h₁ = A·a₁, a₂ = Aᵀ·h₁, h₂ = A·a₂ — each iteration ONE
    edge join + ONE destination aggregation (the pagerank BSP shape),
    all accumulators exact int64, output normalized to permille of
    the max by integer division. Unlike float HITS there is no
    per-iteration normalization to drift: scaling is deferred to the
    single exact division at the end."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.orders.where(F.col("o_custkey") < 60)
        .join(cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        # r12 scan-count fix: all four HITS iterations plus the two
        # max probes re-executed the fact join (14 scans measured);
        # one edge-sized checkpoint makes the whole query one scan
        .localCheckpoint()
    )
    a1 = pairs.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    h1 = (
        pairs.join(B(a1), "dst")
        .groupBy("src")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    # r13 subtree-sweep fix: a2 has three consumers (h2, its max, the
    # authority rows) and h2 two (its max, the hub rows) — lazily each
    # consumer re-ran the whole iteration chain from the edge
    # checkpoint. Node-sized checkpoints make each iteration execute
    # exactly once.
    a2 = (
        pairs.join(B(h1), "src")
        .groupBy("dst")
        .agg(F.sum("h").cast("long").alias("a"))
        .localCheckpoint()
    )
    h2 = (
        pairs.join(B(a2), "dst")
        .groupBy("src")
        .agg(F.sum("a").cast("long").alias("h"))
        .localCheckpoint()
    )
    mh = h2.agg(F.max("h").alias("m"))
    ma = a2.agg(F.max("a").alias("m"))
    hubs = h2.crossJoin(B(mh)).select(
        F.col("src").alias("node"),
        F.lit("hub").alias("role"),
        F.expr("CAST(h * 1000 div m AS BIGINT)").alias(
            "score_permille"
        ),
    )
    auths = a2.crossJoin(B(ma)).select(
        F.col("dst").alias("node"),
        F.lit("authority").alias("role"),
        F.expr("CAST(a * 1000 div m AS BIGINT)").alias(
            "score_permille"
        ),
    )
    return auths.unionByName(hubs).orderBy("role", "node")


# --------------------------------------------------------------------
# Lorenz curve deciles
# --------------------------------------------------------------------

_LORENZ_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey, CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS rn
  FROM spend),
n AS (SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(sum(cents) AS BIGINT) AS tot
      FROM ranked),
dec AS (
  SELECT CAST(((rn - 1) * 10) // nc AS BIGINT) AS decile,
         cents
  FROM ranked, n),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS decile_cents
  FROM dec GROUP BY decile)
SELECT decile, n_customers, decile_cents,
       CAST(sum(decile_cents) OVER (ORDER BY decile) * 1000
            // n.tot AS BIGINT) AS cum_share_permille
FROM agg, n ORDER BY decile
"""


@query("lorenz_curve_deciles", oracle=_LORENZ_ORACLE)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend by decile — the curve whose
    enclosed area gini_concentration_index summarizes: customers
    ranked ascending by spend (total order via the custkey tiebreak),
    cut into ten equal-count bins, cumulative revenue share in exact
    permille. Same scale shape as the Gini query: per-customer agg
    first, then the rank runs through operators/ranking.
    with_global_rank — range-partitioned exact global row_number, no
    single-partition window over the per-customer dimension (it grows
    with the fact table). The only remaining window orders the ten
    decile rows."""
    o = Catalog(spark, sf_dir).orders
    # r13 subtree-sweep fix: spend feeds the rank operator (which
    # probes it twice at build time) plus the totals and decile
    # branches — the per-customer aggregate re-executed from parquet
    # for each. One dimension-bounded checkpoint; the total also
    # reads it directly instead of the ranked output. r15: built via
    # checkpoint_reduced (not raw localCheckpoint) so the ranking
    # operator's verified classifier recognizes the leaf as a proven
    # reduced materialization and keeps the cheap checkpoint tier.
    from hdsp_hive_release_src_spark.operators.materialize import (
        checkpoint_reduced,
    )

    spend = checkpoint_reduced(
        o.groupBy("o_custkey")
        .agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    )
    ranked, nc = with_global_rank(
        spend, "cents", ["o_custkey"], rank_col="rn"
    )
    n = spend.agg(F.sum("cents").cast("long").alias("tot"))
    dec = ranked.crossJoin(B(n)).select(
        F.expr(f"CAST(((rn - 1) * 10) div {nc} AS BIGINT)").alias(
            "decile"
        ),
        "cents",
        "tot",
    )
    agg = dec.groupBy("decile", "tot").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("decile_cents"),
    )
    return agg.select(
        "decile",
        "n_customers",
        "decile_cents",
        F.expr(
            "CAST(sum(decile_cents) OVER (ORDER BY decile) * 1000"
            " div tot AS BIGINT)"
        ).alias("cum_share_permille"),
    ).orderBy("decile")


# --------------------------------------------------------------------
# source-centroid cosine matrix
# --------------------------------------------------------------------

_CC_Q = 1000000

_CC_ORACLE = f"""
WITH comp AS (
  SELECT d.source, g.i - 1 AS j,
         CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * {_CC_Q}) AS BIGINT) AS v
  FROM embeddings e
  JOIN documents d ON e.vec_id = d.doc_id,
       unnest(generate_series(1, len(e.embedding))) AS g(i)),
cent AS (
  SELECT source, j, CAST(sum(v) AS BIGINT) AS sv
  FROM comp GROUP BY source, j),
pairs AS (
  SELECT a.source AS s1, b.source AS s2,
         sum(CAST(a.sv AS HUGEINT) * b.sv) AS dot,
         sum(CAST(a.sv AS HUGEINT) * a.sv) AS n1,
         sum(CAST(b.sv AS HUGEINT) * b.sv) AS n2
  FROM cent a JOIN cent b ON a.j = b.j AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT s1, s2,
       round(CAST(dot AS DOUBLE)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
           AS cosine
FROM pairs ORDER BY s1, s2
"""


@query("source_centroid_cosine", oracle=_CC_ORACLE)
def source_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-source embedding
    centroids — the corpus-similarity matrix a mixture designer reads
    before setting sampling weights. Cosine is scale-invariant, so
    the INTEGER COMPONENT SUMS stand in for the mean vectors (counts
    cancel) and every accumulator is exact (DECIMAL(38,0)/HUGEINT
    for the quadratic sums); each pair's cosine is one closed-form
    double over identical exact integers. Scale shape: one pass to
    source×64 centroid cells, then a sources²×64 join — both bounded
    by the SOURCE count, not the corpus."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    d = cat.documents.select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    comp = (
        e.join(d, "vec_id")
        .select("source", F.posexplode("embedding").alias("j", "x"))
        .select(
            "source",
            "j",
            F.expr(f"CAST(round(CAST(x AS DOUBLE) * {_CC_Q}) AS BIGINT)").alias("v"),
        )
    )
    # r13 subtree-sweep fix: both sides of the centroid self-join
    # re-ran the corpus pass (embeddings join + posexplode + agg).
    # The centroid table is sources x 64 cells — checkpoint it once.
    cent = (
        comp.groupBy("source", "j")
        .agg(F.sum("v").cast("long").alias("sv"))
        .localCheckpoint()
    )
    a = cent.alias("a")
    # the checkpoint RDD has no stats, so Catalyst would SMJ the tiny
    # self-join — broadcast one side explicitly (sources x 64 rows)
    b = F.broadcast(cent.alias("b"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pairs = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"),
            F.col("b.source").alias("s2"),
        )
        .agg(
            F.sum(dec("a.sv") * dec("b.sv")).alias("dot"),
            F.sum(dec("a.sv") * dec("a.sv")).alias("n1"),
            F.sum(dec("b.sv") * dec("b.sv")).alias("n2"),
        )
    )
    return pairs.select(
        "s1",
        "s2",
        F.round(
            F.expr(
                "CAST(dot AS DOUBLE)"
                " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
            ),
            6,
        ).alias("cosine"),
    ).orderBy("s1", "s2")


# --------------------------------------------------------------------
# ORC bloom filter write
# --------------------------------------------------------------------


@query(
    "orc_bloom_filter_write",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS cents,
           true AS bloom_overhead_positive
    FROM orders
    """,
)
def orc_bloom_filter_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC bloom-filter writer options (orc.bloom.filter.columns /
    fpp) — the columnar sibling of parquet_bloom_filter_write, same
    presence proof: the bloom-enabled file set must be strictly
    larger byte-wise than an otherwise-identical write, and the
    read-back must match the source exactly (data stripes
    untouched). ORC blooms serve the same 100 TB role: point-lookup
    predicates skip whole stripes without reading them."""
    o = Catalog(spark, sf_dir).orders.repartition(2, "o_orderkey")
    p_on = scratch_path("orc_bloom_on_r9", sf_dir)
    p_off = scratch_path("orc_bloom_off_r9", sf_dir)
    (
        o.write.mode("overwrite")
        .option("orc.bloom.filter.columns", "o_custkey")
        .option("orc.bloom.filter.fpp", "0.05")
        .orc(p_on)
    )
    o.write.mode("overwrite").orc(p_off)

    def _bytes(root: str) -> int:
        tot = 0
        for dd, _, fs in os.walk(root):
            tot += sum(
                os.path.getsize(os.path.join(dd, f))
                for f in fs
                if f.endswith(".orc")
            )
        return tot

    overhead = _bytes(p_on) - _bytes(p_off)
    back = spark.read.orc(p_on)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_CENTS)).alias("cents"),
        F.lit(overhead > 0).alias("bloom_overhead_positive"),
    )
