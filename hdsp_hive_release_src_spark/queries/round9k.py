"""SURVEY.md §2 round-9 eleventh wave (queued for the r10 window) —
link prediction / changepoint / Markov chaining / causal depth:

- ``ra_link_prediction`` — common-neighbours, Jaccard, and the
  resource-allocation index (Zhou et al. 2009: Σ 1/deg(z) over
  shared neighbours — the best simple link-prediction score) on the
  bounded trade graph; RA in exact integer micro units (1e6 div deg
  per neighbour), pair generation keyed on the shared supplier with
  a degree cap — the posting-cap discipline, never customer².
- ``binseg_changepoint_gain`` — exact binary-segmentation
  changepoint scan over the daily revenue series: the between-
  segment variance-reduction gain (S_k·n − k·S_n)² / (k·(n−k)·n)
  evaluated at every split in pure int64, argmax by integer
  comparison — no float variance can reorder two near-tied splits
  between engines.
- ``markov_two_step`` — the transition matrix squared: two-step
  behaviour probabilities P²(a,c) = Σ_b P(a,b)·P(b,c) in exact
  micro units (permille × permille), over the same 30-minute
  session-bounded transitions as ``event_transition_matrix``.
- ``stratified_ate_gcomputation`` — g-computation / standardization:
  per-stratum treated-vs-control mean difference (deterministic
  hash-assigned treatment) plus the stratum-size-weighted average
  treatment effect, every mean a numerator-first integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.queries.llm10 import CMS_P
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


# --------------------------------------------------------------------
# resource-allocation link prediction
# --------------------------------------------------------------------

#: customer bound for the analytic trade subgraph (the kcore/pagerank
#: bound) and the shared-neighbour degree cap: suppliers serving more
#: than RA_DEG_CAP of the bounded customers are excluded from pair
#: generation AND from the scores (the standard posting-cap trade:
#: hub neighbours carry near-zero RA weight anyway — 1/deg — and
#: would dominate the pair count quadratically). 64 keeps the smoke
#: scale non-vacuous (sf0.001's only shared suppliers are hubs with
#: degree up to 60; sf0.01's max degree is 28).
RA_CUST_BOUND = 60
RA_DEG_CAP = 64
RA_TOP = 30

_RA_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey < {RA_CUST_BOUND}),
ds AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM pairs GROUP BY s),
dc AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM pairs GROUP BY c),
elig AS (
  SELECT pairs.c, pairs.s, ds.d FROM pairs
  JOIN ds ON pairs.s = ds.s WHERE ds.d <= {RA_DEG_CAP}),
cand AS (
  SELECT a.c AS c1, b.c AS c2, a.d
  FROM elig a JOIN elig b ON a.s = b.s AND a.c < b.c),
sc AS (
  SELECT c1, c2, CAST(count(*) AS BIGINT) AS common_n,
         CAST(sum(1000000 // d) AS BIGINT) AS ra_micro
  FROM cand GROUP BY c1, c2)
SELECT c1, c2, common_n, ra_micro,
       CAST(common_n * 1000 // (d1.d + d2.d - common_n) AS BIGINT)
           AS jaccard_permille
FROM sc JOIN dc d1 ON sc.c1 = d1.c JOIN dc d2 ON sc.c2 = d2.c
ORDER BY ra_micro DESC, c1, c2 LIMIT {RA_TOP}
"""


@query("ra_link_prediction", oracle=_RA_ORACLE)
def ra_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the bounded customer–supplier trade graph:
    for customer pairs sharing at least one (degree-capped) supplier,
    the common-neighbour count, neighbourhood Jaccard (permille), and
    the resource-allocation index Σ_z 1/deg(z) in exact micro units
    (1_000_000 div deg per shared supplier — integer, so no float
    sum order can reorder two near-tied candidate pairs between
    engines). Pair generation is keyed on the shared supplier and
    degree-capped at {RA_DEG_CAP} (posting-cap discipline — work is
    Σ deg², never |C|²); neighbour degrees are broadcast-joined onto
    the bounded score table. Top {RA_TOP} with deterministic
    (ra, c1, c2) ordering."""
    o = Catalog(spark, sf_dir).orders
    li = Catalog(spark, sf_dir).lineitem
    pairs = (
        o.where(F.col("o_custkey") < RA_CUST_BOUND)
        .join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        # r12 scan-count fix: both degree tables, the eligibility
        # join and both candidate sides re-executed the fact join
        # (6 scans measured); one edge-sized checkpoint
        .localCheckpoint()
    )
    # r13 subtree-sweep fix: the eligibility join fed both candidate
    # sides and the customer-degree table both broadcast sides — each
    # re-ran off the edge checkpoint. One edge-sized and one
    # dimension-sized checkpoint make them single-pass.
    ds = pairs.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dc = (
        pairs.groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint()
    )
    elig = pairs.join(
        B(ds.where(F.col("d") <= RA_DEG_CAP)), "s"
    ).localCheckpoint()
    a = elig.select(F.col("c").alias("c1"), "s", "d")
    b = elig.select(F.col("c").alias("c2"), "s")
    sc = (
        a.join(b, "s")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_n"),
            F.sum(F.expr("1000000 div d")).cast("long").alias("ra_micro"),
        )
    )
    d1 = dc.select(F.col("c").alias("c1"), F.col("d").alias("deg1"))
    d2 = dc.select(F.col("c").alias("c2"), F.col("d").alias("deg2"))
    return (
        sc.join(B(d1), "c1")
        .join(B(d2), "c2")
        .select(
            "c1",
            "c2",
            "common_n",
            "ra_micro",
            F.expr("common_n * 1000 div (deg1 + deg2 - common_n)")
            .cast("long")
            .alias("jaccard_permille"),
        )
        .orderBy(F.desc("ra_micro"), "c1", "c2")
        .limit(RA_TOP)
    )


# --------------------------------------------------------------------
# binary-segmentation changepoint
# --------------------------------------------------------------------

#: daily revenue is folded to $100 units (cents div 10000) so the
#: squared gain numerator (S_k·n)² stays far inside int64: at sf0.1
#: S_n ≈ 3e5 units over n ≈ 31 days → (1e7)² ≈ 1e14; safe to ~sf10,
#: switch the fold to DECIMAL(38,0)/HUGEINT beyond (the PCA idiom).
BINSEG_TOP = 3

_BINSEG_ORACLE = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) // 10000
              AS BIGINT) AS v
  FROM events GROUP BY 1),
seq AS (
  SELECT d, v,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
         CAST(sum(v) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS sk
  FROM daily),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sn
  FROM daily),
gain AS (
  SELECT d, k, sk, n, sn,
         CAST((sk * n - k * sn) * (sk * n - k * sn)
              // (k * (n - k) * n) AS BIGINT) AS gain
  FROM seq CROSS JOIN tot WHERE k < n)
SELECT d AS split_date, k AS split_k, gain,
       CAST(sk // k AS BIGINT) AS left_mean_units,
       CAST((sn - sk) // (n - k) AS BIGINT) AS right_mean_units
FROM gain ORDER BY gain DESC, split_date LIMIT {BINSEG_TOP}
"""


@query("binseg_changepoint_gain", oracle=_BINSEG_ORACLE)
def binseg_changepoint_gain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact binary-segmentation changepoint scan over the daily
    revenue series: for every candidate split k the between-segment
    variance-reduction gain  (S_k·n − k·S_n)² / (k·(n−k)·n)  — the
    quantity CUSUM/binseg maximizes — is computed entirely in int64
    ($100 revenue units, see BINSEG module constant), so the argmax
    is an integer comparison that cannot reorder near-tied splits
    across engines (a float variance would). The cumulative window
    is global but runs over the DAY grain — bounded by corpus span
    (≈31 rows), not corpus size; the daily rollup before it is the
    only full-data pass. Top {BINSEG_TOP} splits with segment means,
    deterministic (gain, date) order."""
    ev = Catalog(spark, sf_dir).events
    # r13 subtree-sweep fix: the cumulative sequence and the totals
    # both re-ran the daily rollup from parquet. Date-sized —
    # checkpoint once.
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d")
    ).agg(
        F.expr(
            "cast(sum(cast(round(value * 100) as bigint)) div 10000"
            " as bigint)"
        ).alias("v")
    ).localCheckpoint()
    w = Window.orderBy("d")
    seq = daily.select(
        "d",
        "v",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("sk"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sn"),
    )
    return (
        seq.crossJoin(B(tot))
        .where(F.col("k") < F.col("n"))
        .select(
            F.col("d").alias("split_date"),
            F.col("k").alias("split_k"),
            F.expr(
                "cast((sk * n - k * sn) * (sk * n - k * sn)"
                " div (k * (n - k) * n) as bigint)"
            ).alias("gain"),
            F.expr("cast(sk div k as bigint)").alias("left_mean_units"),
            F.expr("cast((sn - sk) div (n - k) as bigint)").alias(
                "right_mean_units"
            ),
        )
        .orderBy(F.desc("gain"), "split_date")
        .limit(BINSEG_TOP)
    )


# --------------------------------------------------------------------
# two-step Markov transitions
# --------------------------------------------------------------------

_MARKOV2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type,
         lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_ts
  FROM events),
trans AS (
  SELECT event_type AS a, next_type AS b
  FROM ordered
  WHERE next_type IS NOT NULL
    AND next_ts <= CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE),
p1 AS (
  SELECT a, b,
         CAST(count(*) * 1000 // sum(count(*)) OVER (PARTITION BY a)
              AS BIGINT) AS p_permille
  FROM trans GROUP BY a, b),
p2 AS (
  SELECT x.a, y.b AS c,
         CAST(sum(x.p_permille * y.p_permille) AS BIGINT) AS p2_micro
  FROM p1 x JOIN p1 y ON x.b = y.a GROUP BY x.a, y.b)
SELECT p2.a AS from_type, p2.c AS to_type, p2.p2_micro,
       CAST(coalesce(d.p_permille, 0) * 1000 AS BIGINT)
           AS p1_micro
FROM p2 LEFT JOIN p1 d ON p2.a = d.a AND p2.c = d.b
ORDER BY from_type, to_type
"""


@query("markov_two_step", oracle=_MARKOV2_ORACLE)
def markov_two_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step Markov behaviour probabilities — the transition
    matrix squared: P²(a,c) = Σ_b P(a,b)·P(b,c), over the same
    30-minute session-bounded consecutive-event transitions as
    ``event_transition_matrix`` (governance_surface.py). One-step
    probabilities are integer permille (count·1000 div row-total),
    so each product is exact micro units and the matrix-multiply sum
    stays int64 — both engines land on identical cells. The matrix
    itself is event_type² ≈ 25 cells: the multiply is a self-join on
    the middle state over a broadcast-size table; the only full-data
    work is the one sessionization-shaped window."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("a"),
            "ts",
            F.lead("event_type").over(w).alias("b"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .where(
            F.col("b").isNotNull()
            & (
                F.col("next_ts")
                <= F.col("ts") + F.expr("INTERVAL 30 MINUTE")
            )
        )
        .select("a", "b")
    )
    wa = Window.partitionBy("a")
    # r12 scan-count fix: both matrix-multiply sides and the one-step
    # lookup re-ran the sessionization window from parquet (3 scans
    # measured); the ~25-cell one-step matrix is checkpointed once
    p1 = (
        trans.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "a",
            "b",
            F.expr("cast(n * 1000 div sum(n) over (partition by a)"
                   " as bigint)").alias("p_permille"),
        )
        .localCheckpoint()
    )
    x = p1.select(
        F.col("a"), F.col("b").alias("mid"), F.col("p_permille").alias("px")
    )
    y = p1.select(
        F.col("a").alias("mid"),
        F.col("b").alias("c"),
        F.col("p_permille").alias("py"),
    )
    p2 = (
        x.join(y, "mid")
        .groupBy("a", "c")
        .agg(F.sum(F.col("px") * F.col("py")).cast("long").alias("p2_micro"))
    )
    d = p1.select(
        "a", F.col("b").alias("c"), F.col("p_permille").alias("p1p")
    )
    return (
        p2.join(B(d), ["a", "c"], "left")
        .select(
            F.col("a").alias("from_type"),
            F.col("c").alias("to_type"),
            "p2_micro",
            (F.coalesce(F.col("p1p"), F.lit(0)) * 1000)
            .cast("long")
            .alias("p1_micro"),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------------------------
# stratified ATE by g-computation
# --------------------------------------------------------------------

#: deterministic user-level treatment assignment: affine hash mod 2
#: (the repo's exact-int64 sketch idiom) — both engines replay the
#: same arm per user, so the "experiment" is exactly reproducible.
ATE_A, ATE_B = 48271, 12345

_ATE_ORACLE = f"""
WITH base AS (
  SELECT event_type AS stratum,
         (({ATE_A} * user_id + {ATE_B}) % {CMS_P}) % 2 AS t,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
g AS (
  SELECT stratum,
         CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END) AS BIGINT)
             AS st,
         CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END) AS BIGINT)
             AS sc
  FROM base GROUP BY stratum
  HAVING sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) > 0
     AND sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) > 0),
per AS (
  SELECT stratum, nt, nc,
         CAST(st // nt AS BIGINT) AS mean_treat_cents,
         CAST(sc // nc AS BIGINT) AS mean_ctrl_cents,
         CAST(st // nt - sc // nc AS BIGINT) AS effect_cents
  FROM g),
allr AS (
  SELECT '_all' AS stratum,
         CAST(sum(nt) AS BIGINT) AS nt, CAST(sum(nc) AS BIGINT) AS nc,
         CAST(sum(st) // sum(nt) AS BIGINT) AS mean_treat_cents,
         CAST(sum(sc) // sum(nc) AS BIGINT) AS mean_ctrl_cents,
         CAST(sum((nt + nc) * (st // nt - sc // nc)) // sum(nt + nc)
              AS BIGINT) AS effect_cents
  FROM g)
SELECT stratum, nt AS n_treat, nc AS n_ctrl, mean_treat_cents,
       mean_ctrl_cents, effect_cents
FROM per
UNION ALL
SELECT stratum, nt, nc, mean_treat_cents, mean_ctrl_cents, effect_cents
FROM allr
ORDER BY stratum
"""


@query("stratified_ate_gcomputation", oracle=_ATE_ORACLE)
def stratified_ate_gcomputation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Average-treatment-effect estimation by g-computation /
    standardization: a deterministic hash assigns every user to a
    treatment arm, event value (cents) is the outcome, event_type is
    the confounding stratum; per stratum the treated-vs-control mean
    difference, and a final ``_all`` row whose effect is the
    stratum-size-weighted average of the per-stratum effects — the
    backdoor-adjusted ATE, which differs from the naive pooled
    difference whenever arm mix varies by stratum. Every mean is a
    numerator-first integer division (engines cannot drift), the
    aggregation is one groupBy over bounded strata, and the weighted
    fold runs over the bounded stratum table."""
    ev = Catalog(spark, sf_dir).events
    base = ev.select(
        F.col("event_type").alias("stratum"),
        (
            (F.lit(ATE_A) * F.col("user_id") + ATE_B) % CMS_P % 2
        ).alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = (
        base.groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
            .cast("long")
            .alias("nt"),
            F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
            .cast("long")
            .alias("nc"),
            F.sum(F.when(F.col("t") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("st"),
            F.sum(F.when(F.col("t") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("sc"),
        )
        .where((F.col("nt") > 0) & (F.col("nc") > 0))
        # r13 subtree-sweep fix: the per-stratum rows and the pooled
        # _all row both re-ran the stratum aggregate from parquet.
        # Stratum-bounded — checkpoint once.
        .localCheckpoint()
    )
    per = g.select(
        "stratum",
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        F.expr("cast(st div nt as bigint)").alias("mean_treat_cents"),
        F.expr("cast(sc div nc as bigint)").alias("mean_ctrl_cents"),
        F.expr("cast(st div nt - sc div nc as bigint)").alias(
            "effect_cents"
        ),
    )
    allr = g.agg(
        F.sum("nt").cast("long").alias("nt"),
        F.sum("nc").cast("long").alias("nc"),
        F.expr("cast(sum(st) div sum(nt) as bigint)").alias(
            "mean_treat_cents"
        ),
        F.expr("cast(sum(sc) div sum(nc) as bigint)").alias(
            "mean_ctrl_cents"
        ),
        F.expr(
            "cast(sum((nt + nc) * (st div nt - sc div nc))"
            " div sum(nt + nc) as bigint)"
        ).alias("effect_cents"),
    ).select(
        F.lit("_all").alias("stratum"),
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        "mean_treat_cents",
        "mean_ctrl_cents",
        "effect_cents",
    )
    return per.unionByName(allr).orderBy("stratum")
