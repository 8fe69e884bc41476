"""SURVEY.md §2 round-9 tenth wave (queued for the r10 window) —
eval-calibration / cohort-value / graph-core / sketch-algebra depth:

- ``calibration_curve_bins`` — classifier reliability diagram data
  plus the Brier score, all in exact integer micro/permille units
  (a float reliability bin can flip a boundary prediction between
  engines; integer centi-probabilities cannot).
- ``cohort_ltv_matrix`` — signup-cohort × month-offset cumulative
  revenue per user (the LTV curve behind every retention deck);
  month offsets by integer year·12+month arithmetic (no float
  months_between), cumulative window PARTITIONED by cohort.
- ``kcore_peeling_profile`` — iterative k-core peeling on the trade
  graph with a FIXED unrolled round count in both engines: per-round
  surviving node/edge counts plus a convergence flag, so the
  fixpoint claim is visible in the gated output instead of assumed.
- ``kmv_set_operations`` — KMV sketch algebra: union estimate from
  the merged k-minimum synopsis and intersection/Jaccard from
  synopsis membership — the mergeable-sketch way to estimate overlap
  of two id sets without ever joining them at full width; every
  register exactly replayed by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.materialize import (
    checkpoint_reduced_and_release,
    persist_fact_rows,
)
from hdsp_hive_release_src_spark.queries.llm10 import CMS_P
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


# --------------------------------------------------------------------
# calibration curve + Brier score
# --------------------------------------------------------------------

_CAL_ORACLE = """
WITH s AS (
  SELECT o_orderkey % 101 AS pc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum((pc - 100 * y) * (pc - 100 * y)) AS BIGINT) AS sq
  FROM s),
b AS (
  SELECT least(9, pc // 10) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pc) AS BIGINT) AS sp,
         CAST(sum(y) AS BIGINT) AS sy
  FROM s GROUP BY 1)
SELECT CAST(bin AS BIGINT) AS bin, b.n,
       CAST(sp * 10 // b.n AS BIGINT) AS pred_permille,
       CAST(sy * 1000 // b.n AS BIGINT) AS obs_permille,
       CAST(tot.sq * 100 // tot.n AS BIGINT) AS brier_micro
FROM b CROSS JOIN tot ORDER BY bin
"""


@query("calibration_curve_bins", oracle=_CAL_ORACLE)
def calibration_curve_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability-diagram bins for a deterministic centi-probability
    score (orderkey % 101 — a replayable stand-in for a model score)
    against the finished-order label, plus the Brier score: per
    decile bin, mean predicted probability (permille) vs observed
    positive rate (permille), and the global mean squared error in
    micro units. The whole pipeline is integer — (pc − 100y)² stays
    int64, and every mean is numerator-first integer division — so
    both engines land on identical bins and identical Brier to the
    last digit. One scan, one 10-row aggregation, one scalar
    aggregate broadcast onto the bins."""
    o = Catalog(spark, sf_dir).orders
    s = o.select(
        (F.col("o_orderkey") % 101).alias("pc"),
        F.when(F.col("o_orderstatus") == "F", 1)
        .otherwise(0)
        .alias("y"),
    )
    tot = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum(
            (F.col("pc") - 100 * F.col("y"))
            * (F.col("pc") - 100 * F.col("y"))
        )
        .cast("long")
        .alias("sq"),
    )
    b = s.groupBy(
        F.least(F.lit(9), F.expr("pc div 10")).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pc").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
    )
    return (
        b.crossJoin(B(tot))
        .select(
            F.col("bin").cast("long"),
            "n",
            F.expr("sp * 10 div n").cast("long").alias("pred_permille"),
            F.expr("sy * 1000 div n").cast("long").alias("obs_permille"),
            F.expr("sq * 100 div n_tot")
            .cast("long")
            .alias("brier_micro"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------
# cohort LTV matrix
# --------------------------------------------------------------------

_LTV_ORACLE = """
WITH ue AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01',
                   CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7 AS ew,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
first AS (
  SELECT user_id, min(ew) AS cw FROM ue GROUP BY user_id),
rev AS (
  SELECT first.cw, ue.ew - first.cw AS off, ue.cents, ue.user_id
  FROM ue JOIN first ON ue.user_id = first.user_id),
cs AS (SELECT cw, CAST(count(DISTINCT user_id) AS BIGINT) AS users
       FROM rev WHERE off = 0 GROUP BY cw),
m AS (
  SELECT cw, off, CAST(sum(cents) AS BIGINT) AS rev_cents
  FROM rev GROUP BY cw, off),
c AS (
  SELECT cw, off, rev_cents,
         CAST(sum(rev_cents) OVER (PARTITION BY cw ORDER BY off
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM m)
SELECT CAST(DATE '1970-01-01' + INTERVAL (c.cw * 7) DAY AS DATE)
           AS cohort_week_start,
       CAST(off AS BIGINT) AS week_offset,
       cs.users, c.cum_cents,
       CAST(c.cum_cents // cs.users AS BIGINT) AS ltv_cents_per_user
FROM c JOIN cs ON c.cw = cs.cw
ORDER BY cohort_week_start, week_offset
"""


@query("cohort_ltv_matrix", oracle=_LTV_ORACLE)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-activity
    WEEK (the corpus spans one month, so weekly cohorts are the
    granularity with signal; at production span swap the epoch-week
    for an epoch-month — the arithmetic pattern is identical),
    revenue accumulated per week offset, reported as exact cumulative
    cents and integer cents-per-user. Week ids are pure integer
    epoch-day arithmetic (days-since-1970 div 7) — no float
    months_between, no locale weekofyear. The cumulative window is
    PARTITIONED by cohort (bounded offsets per cohort, each cohort
    sorts independently); cohort size counts only offset-0 users (the
    cohort's defining week)."""
    ev = Catalog(spark, sf_dir).events
    ue = ev.select(
        "user_id",
        F.expr(
            "datediff(cast(ts as date), date '1970-01-01') div 7"
        ).alias("ew"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # r12 scan-count fix: cohort sizes and the revenue matrix each
    # re-ran the events scan + first-week join (4 scans measured).
    # r13 re-plan: the first-activity week is a per-user window MIN
    # over the same rows — one scan and one user_id shuffle replace
    # the groupBy + self-join (identical integers: min over the same
    # partition). The narrow (cw, off, cents, user) table is
    # events-ROW-sized, so DISK_ONLY persist, never localCheckpoint
    # (materialize.py discipline).
    wu = Window.partitionBy("user_id")
    rev = persist_fact_rows(
        ue.select(
            F.min("ew").over(wu).alias("cw"),
            (F.col("ew") - F.min("ew").over(wu)).alias("off"),
            "cents",
            "user_id",
        )
    )
    cs = (
        rev.where(F.col("off") == 0)
        .groupBy("cw")
        .agg(F.countDistinct("user_id").cast("long").alias("users"))
    )
    m = rev.groupBy("cw", "off").agg(
        F.sum("cents").cast("long").alias("rev_cents")
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = m.select(
        "cw",
        "off",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_cents"),
    )
    # r14 hygiene: the week-grain matrix is checkpointed off the cache
    # and the events-row persist released — no session-lifetime cache
    return checkpoint_reduced_and_release(
        c.join(cs, "cw")
        .select(
            F.expr("date_add(date '1970-01-01', cast(cw * 7 as int))")
            .alias("cohort_week_start"),
            F.col("off").cast("long").alias("week_offset"),
            "users",
            "cum_cents",
            F.expr("cum_cents div users")
            .cast("long")
            .alias("ltv_cents_per_user"),
        )
        .orderBy("cohort_week_start", "week_offset"),
        rev,
    )


# --------------------------------------------------------------------
# k-core peeling profile
# --------------------------------------------------------------------

#: k-core threshold and the FIXED number of unrolled peel rounds —
#: both engines run exactly KCORE_ROUNDS rounds, so parity never
#: depends on when the fixpoint lands; the converged flag makes the
#: fixpoint claim part of the gated output. At gate scale (sf0.01)
#: the 16-core converges to 139 nodes by round 5.
KCORE_K = 16
KCORE_ROUNDS = 6


def _kcore_round_sql(i: int) -> str:
    # AS MATERIALIZED: every round is referenced by the next round
    # (twice) and by the profile union — without materialization
    # DuckDB re-inlines the whole peel chain per reference and the
    # oracle goes exponential in the round count (26 s vs 0.3 s at
    # sf0.01).
    return f"""
e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM edges e
         JOIN n{i - 1} a ON e.src = a.n
         JOIN n{i - 1} b ON e.dst = b.n),
d{i} AS (SELECT src AS n, count(*) AS d FROM e{i} GROUP BY src),
n{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE d >= {KCORE_K})"""


_KCORE_ORACLE = (
    """
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey < 60),
edges AS (
  SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
  UNION ALL
  SELECT 's' || s AS src, 'c' || c AS dst FROM pairs),
n0 AS (SELECT DISTINCT src AS n FROM edges),"""
    + ",".join(_kcore_round_sql(i) for i in range(1, KCORE_ROUNDS + 1))
    + ", profile AS ("
    + " UNION ALL ".join(
        f"SELECT {i} AS round,"
        f" (SELECT count(*) FROM n{i}) AS nodes,"
        f" (SELECT count(*) FROM e{i}) AS live_edges"
        for i in range(1, KCORE_ROUNDS + 1)
    )
    + f""")
SELECT CAST(round AS BIGINT) AS round, CAST(nodes AS BIGINT) AS nodes,
       CAST(live_edges AS BIGINT) AS live_edges,
       CAST((SELECT count(*) FROM n{KCORE_ROUNDS - 1})
            = (SELECT count(*) FROM n{KCORE_ROUNDS}) AS BOOLEAN)
           AS converged
FROM profile ORDER BY round
"""
)


@query("kcore_peeling_profile", oracle=_KCORE_ORACLE)
def kcore_peeling_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iterative k-core decomposition (repeatedly drop nodes with
    degree < k) on the undirected trade graph — the standard
    community-periphery peel. Both engines run a FIXED
    {KCORE_ROUNDS}-round unroll (cites graph.py's shared edge
    definition), emitting the surviving node/edge counts per round
    plus a converged flag comparing the last two rounds — the
    fixpoint claim is part of the gated output, so an early data
    change that breaks convergence turns the row red instead of
    silently reporting a non-core. Per round: one self-semi-join of
    the edge list against the surviving node set (shuffle keyed on
    node id) + one degree aggregation — the BSP shape; round count is
    bounded by core cascade depth, not corpus size. The driver-side
    loop carries only DataFrame lineage, never data."""
    o = Catalog(spark, sf_dir).orders
    li = Catalog(spark, sf_dir).lineitem
    pairs = (
        o.where(F.col("o_custkey") < 60)
        .join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    fwd = pairs.select(
        F.concat(F.lit("c"), F.col("c")).alias("src"),
        F.concat(F.lit("s"), F.col("s")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges = edges.persist()
    # the survivor set lives on the driver between rounds: this query
    # profiles the BOUNDED analytic subgraph (o_custkey < 60 — the
    # same bound graph.py's pagerank uses), so the node dimension is
    # a k/bounded collect (the kmeans-codebook pattern) and each
    # round is ONE job: an isin-filtered map-side scan of the cached
    # edge list + one degree aggregation. On an unbounded graph the
    # same peel runs with per-round broadcast semi-joins instead of
    # literal membership — mechanical swap, same round structure.
    alive = None  # None = round 1, all nodes alive
    profile = []
    prev_nodes = None
    for i in range(1, KCORE_ROUNDS + 1):
        live = edges
        if alive is not None:
            live = edges.where(
                F.col("src").isin(alive) & F.col("dst").isin(alive)
            )
        deg_rows = (
            live.groupBy(F.col("src").alias("n"))
            .agg(F.count(F.lit(1)).alias("d"))
            .collect()
        )
        n_edges = sum(r.d for r in deg_rows)
        nxt = [r.n for r in deg_rows if r.d >= KCORE_K]
        profile.append((i, len(nxt), n_edges))
        if i == KCORE_ROUNDS - 1:
            prev_nodes = len(nxt)
        alive = nxt
    edges.unpersist()
    converged = prev_nodes == profile[-1][1]
    return spark.createDataFrame(
        [(r, n, e, converged) for (r, n, e) in profile],
        "round long, nodes long, live_edges long, converged boolean",
    )


# --------------------------------------------------------------------
# KMV sketch set algebra
# --------------------------------------------------------------------

#: separate affine constants from kmv_distinct_estimate so the two
#: sketches don't share hash collisions; same shared prime.
KMV2_K = 8
KMV2_A, KMV2_B = 7919, 911


def _kmv_syn_sql(name: str, pred: str) -> str:
    return f"""
{name}_ids AS (SELECT DISTINCT user_id FROM events WHERE {pred}),
{name}_h AS (
  SELECT user_id, ({KMV2_A} * user_id + {KMV2_B}) % {CMS_P} AS h
  FROM {name}_ids),
{name}_syn AS (
  SELECT user_id, h FROM {name}_h ORDER BY h, user_id LIMIT {KMV2_K})"""


_KMVSET_ORACLE = (
    "WITH "
    + _kmv_syn_sql("a", "event_type = 'purchase'")
    + ","
    + _kmv_syn_sql("b", "event_type = 'click'")
    + f""",
u_ids AS (SELECT user_id FROM a_ids UNION SELECT user_id FROM b_ids),
u_h AS (
  SELECT user_id, ({KMV2_A} * user_id + {KMV2_B}) % {CMS_P} AS h
  FROM u_ids),
u_syn AS (SELECT user_id, h FROM u_h ORDER BY h, user_id
          LIMIT {KMV2_K}),
est AS (
  SELECT
    CAST((SELECT ({KMV2_K} - 1) * CAST({CMS_P} AS BIGINT) // max(h)
          FROM a_syn) AS BIGINT) AS est_a,
    CAST((SELECT ({KMV2_K} - 1) * CAST({CMS_P} AS BIGINT) // max(h)
          FROM b_syn) AS BIGINT) AS est_b,
    CAST((SELECT ({KMV2_K} - 1) * CAST({CMS_P} AS BIGINT) // max(h)
          FROM u_syn) AS BIGINT) AS est_union,
    CAST((SELECT count(*) FROM u_syn
          WHERE user_id IN (SELECT user_id FROM a_ids)
            AND user_id IN (SELECT user_id FROM b_ids))
         AS BIGINT) AS inter_sample)
SELECT CAST({KMV2_K} AS INT) AS k, est_a, est_b, est_union,
       inter_sample,
       CAST(inter_sample * 1000 // {KMV2_K} AS BIGINT)
           AS jaccard_permille,
       CAST(inter_sample * est_union // {KMV2_K} AS BIGINT)
           AS est_intersection
FROM est
"""
)


@query("kmv_set_operations", oracle=_KMVSET_ORACLE)
def kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch ALGEBRA: estimate |purchasers|, |clickers|, their
    union, Jaccard, and intersection from k-minimum-value synopses —
    the mergeable-sketch way to answer audience-overlap questions
    without joining the two id sets at full width (at 100 TB each
    synopsis is k rows; the union synopsis is the k smallest of the
    two synopses' union, and the intersection estimate is
    ρ·est_union where ρ counts union-synopsis members present in
    BOTH sets). The affine hash is int64-exact, so the oracle
    replays every synopsis row — estimate, Jaccard and intersection
    are pinned to the digit, not 'close enough'. Each synopsis is a
    distributed TakeOrdered (per-partition partial top-k, no global
    sort); membership checks are broadcast semi-joins of k rows."""
    ev = Catalog(spark, sf_dir).events

    # r12 scan-count fix: the three synopses, the union and both
    # membership joins re-executed the events scan (8 measured). One
    # scan builds the distinct (event_type, user) table; everything
    # derives from the checkpoint.
    typed = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint()
    )

    def ids(pred):
        return typed.where(pred).select("user_id").distinct()

    def syn(df):
        return (
            df.select(
                "user_id",
                ((F.lit(KMV2_A) * F.col("user_id") + KMV2_B) % CMS_P)
                .alias("h"),
            )
            .orderBy("h", "user_id")
            .limit(KMV2_K)
        )

    # r13 subtree-sweep fix: each id set has 2-3 consumers (its
    # synopsis, the union, the membership joins) that re-ran the
    # filter+distinct off the checkpoint. Dimension-sized — one
    # checkpoint each makes every consumer a read.
    a_ids = ids(F.col("event_type") == "purchase").localCheckpoint()
    b_ids = ids(F.col("event_type") == "click").localCheckpoint()
    u_ids = a_ids.unionByName(b_ids).distinct().localCheckpoint()
    est_cols = []
    for name, d in (("a", a_ids), ("b", b_ids), ("union", u_ids)):
        kth = syn(d).agg(F.max("h").alias("kth"))
        est_cols.append(
            kth.select(
                F.expr(
                    f"({KMV2_K} - 1) * cast({CMS_P} as bigint) div kth"
                )
                .cast("long")
                .alias(f"est_{name}")
            )
        )
    inter = (
        syn(u_ids)
        .join(B(a_ids), "user_id")
        .join(B(b_ids), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_sample"))
    )
    out = est_cols[0].crossJoin(est_cols[1]).crossJoin(est_cols[2])
    return out.crossJoin(B(inter)).select(
        F.lit(KMV2_K).cast("int").alias("k"),
        "est_a",
        "est_b",
        "est_union",
        "inter_sample",
        F.expr(f"inter_sample * 1000 div {KMV2_K}")
        .cast("long")
        .alias("jaccard_permille"),
        F.expr(f"inter_sample * est_union div {KMV2_K}")
        .cast("long")
        .alias("est_intersection"),
    )
