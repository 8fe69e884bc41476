"""SURVEY.md §2 round-9 fifteenth wave (queued for the r10 window) —
reconciliation / sessionization / calendar / OLAP-share depth:

- ``table_diff_reconcile`` — two-table reconciliation (the migration
  sign-off report): FULL OUTER JOIN on the key, every row classified
  added / removed / changed / unchanged, with the changed rows'
  absolute value drift — the diff a dual-write cutover audits.
- ``sessionization_capped`` — 2-hour-gap activity episodes sliced
  into 30-minute sub-sessions by fixed-epoch chunking (the "no
  session longer than X" rule every analytics pipeline adds once a
  bot leaves a 14-hour session); the cap is integer arithmetic on
  the episode-start epoch, not a sequential recursion.
- ``business_days_lag`` — order→ship lag in BUSINESS days via the
  closed-form weekday counter g(e) = 5·((e+3) div 7) +
  least((e+3) mod 7, 5) − 3 (weekdays from the epoch to day e,
  exclusive; property-tested against brute force) — no calendar
  table, no per-day explode.
- ``share_of_parent_rollup`` — the two-level OLAP share report:
  every nation's revenue share of its region and every region's
  share of the grand total, exact integer permille, one rollup.
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
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# table diff / reconciliation
# --------------------------------------------------------------------

#: deterministic "v2" mutation rules (mod arithmetic on the key so
#: both engines derive the identical second version): drop every
#: 13th key, bump price on every remaining 7th key, clone every
#: 11th key with a shifted key as an insert.
DIFF_DROP_MOD = 13
DIFF_CHG_MOD = 7
DIFF_ADD_MOD = 11
DIFF_KEY_SHIFT = 1_000_000_000

_DIFF_V2 = f"""
  SELECT o_orderkey AS k,
         {_CENTS} + CASE WHEN o_orderkey % {DIFF_CHG_MOD} = 0
                         THEN 100 ELSE 0 END AS cents,
         o_orderstatus AS st
  FROM orders WHERE o_orderkey % {DIFF_DROP_MOD} <> 0
  UNION ALL
  SELECT o_orderkey + {DIFF_KEY_SHIFT}, {_CENTS}, o_orderstatus
  FROM orders WHERE o_orderkey % {DIFF_ADD_MOD} = 0
"""

_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey AS k, {_CENTS} AS cents, o_orderstatus AS st
  FROM orders),
v2 AS ({_DIFF_V2}),
j AS (
  SELECT coalesce(v1.k, v2.k) AS k,
         v1.cents AS c1, v2.cents AS c2,
         v1.st AS s1, v2.st AS s2,
         CASE WHEN v2.k IS NULL THEN 'removed'
              WHEN v1.k IS NULL THEN 'added'
              WHEN v1.cents <> v2.cents OR v1.st <> v2.st
                THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN status = 'changed'
                     THEN abs(c2 - c1) ELSE 0 END) AS BIGINT)
           AS abs_drift_cents
FROM j GROUP BY status ORDER BY status
"""


@query("table_diff_reconcile", oracle=_DIFF_ORACLE)
def table_diff_reconcile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-version table reconciliation — the report a dual-write
    cutover or backfill signs off on: a deterministic 'v2' of the
    orders table (mod-keyed drops/updates/inserts, so both engines
    derive the identical version), FULL OUTER JOIN on the key, each
    row classified added / removed / changed / unchanged, plus the
    changed rows' total absolute cents drift. One co-partitioned
    full-outer shuffle join on the key — the diff never leaves the
    join's own exchange; at cluster scale bucket both versions on
    the key and the exchange disappears."""
    o = Catalog(spark, sf_dir).orders
    # r12 scan-count fix: v1 and v2's two branches each scanned
    # orders (3 scans measured); the narrow (key, cents, status)
    # projection is materialized once and all three derive from it —
    # DISK_ONLY persist, not localCheckpoint, because it is
    # orders-ROW-sized (materialize.py discipline)
    base = persist_fact_rows(
        o.select(
            F.col("o_orderkey").alias("bk"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("bc"),
            F.col("o_orderstatus").alias("bs"),
        )
    )
    v1 = base.select(
        F.col("bk").alias("k"),
        F.col("bc").alias("c1"),
        F.col("bs").alias("s1"),
    )
    v2 = (
        base.where(F.col("bk") % DIFF_DROP_MOD != 0)
        .select(
            F.col("bk").alias("k"),
            (
                F.col("bc")
                + F.when(
                    F.col("bk") % DIFF_CHG_MOD == 0, 100
                ).otherwise(0)
            ).alias("c2"),
            F.col("bs").alias("s2"),
        )
        .unionByName(
            base.where(F.col("bk") % DIFF_ADD_MOD == 0).select(
                (F.col("bk") + DIFF_KEY_SHIFT).alias("k"),
                F.col("bc").alias("c2"),
                F.col("bs").alias("s2"),
            )
        )
    )
    j = v1.join(v2, "k", "full_outer").select(
        F.when(F.col("c2").isNull() & F.col("s2").isNull(), "removed")
        .when(F.col("c1").isNull() & F.col("s1").isNull(), "added")
        .when(
            (F.col("c1") != F.col("c2")) | (F.col("s1") != F.col("s2")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("status"),
        "c1",
        "c2",
    )
    # r14 hygiene: the 4-row diff summary is checkpointed off the
    # cache and the orders-row persist released — no session cache
    return checkpoint_reduced_and_release(
        j.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    F.col("status") == "changed",
                    F.abs(F.col("c2") - F.col("c1")),
                ).otherwise(0)
            )
            .cast("long")
            .alias("abs_drift_cents"),
        )
        .orderBy("status"),
        base,
    )


# --------------------------------------------------------------------
# capped sessionization
# --------------------------------------------------------------------

#: 2-hour inactivity gap defines an activity episode; each episode is
#: then sliced into 30-minute sub-sessions. Cap < gap is deliberate
#: and non-vacuous at every scale (30-min-gap sessions never exceed
#: one hour in this corpus; 2-hour episodes reach 6 hours, so the
#: chunk distribution has real mass past index 0).
SESSION_GAP_S = 7200
SESSION_CAP_S = 1800

_CAPPED_ORACLE = f"""
WITH e AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t
  FROM events),
flag AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   > CAST({SESSION_GAP_S} AS BIGINT) * 1000000
              OR lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM e),
sess AS (
  SELECT user_id, t,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flag),
anchored AS (
  SELECT user_id, sid, t,
         CAST(min(t) OVER (PARTITION BY user_id, sid) AS BIGINT)
             AS s0
  FROM sess),
sub AS (
  SELECT user_id, sid,
         CAST((t - s0) // (CAST({SESSION_CAP_S} AS BIGINT) * 1000000) AS BIGINT) AS chunk
  FROM anchored),
per AS (
  SELECT user_id, sid, chunk, CAST(count(*) AS BIGINT) AS n_events
  FROM sub GROUP BY user_id, sid, chunk)
SELECT chunk,
       CAST(count(*) AS BIGINT) AS n_subsessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_events
FROM per GROUP BY chunk ORDER BY chunk
"""


@query("sessionization_capped", oracle=_CAPPED_ORACLE)
def sessionization_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duration-capped sessionization: 2-hour-inactivity activity
    episodes, each hard-split into 30-minute sub-sessions by integer
    chunking against the episode-start epoch — the
    'no session outlives the cap' rule that bounds bot sessions,
    WITHOUT a sequential re-anchoring recursion (fixed-epoch
    chunking is one subtraction + one integer division, and its
    whole pipeline is the same single (user, ts) shuffle plain
    sessionization uses: gap flag → running session id → per-session
    min → chunk). Output: the bounded per-chunk-index distribution
    (sub-session count, events, largest sub-session)."""
    ev = Catalog(spark, sf_dir).events
    # exact integer MICROseconds on both engines (unix_micros /
    # epoch_us): DuckDB's epoch() returns fractional seconds while
    # Spark's unix_timestamp truncates — a sub-second gap straddling
    # a session boundary would split differently.
    e = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    wu = Window.partitionBy("user_id").orderBy("t")
    flag = e.select(
        "user_id",
        "t",
        F.when(
            (F.col("t") - F.lag("t").over(wu) > SESSION_GAP_S * 1_000_000)
            | F.lag("t").over(wu).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flag.select(
        "user_id",
        "t",
        F.sum("new_s")
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("sid"),
    )
    anchored = sess.select(
        "user_id",
        "sid",
        "t",
        F.min("t")
        .over(Window.partitionBy("user_id", "sid"))
        .cast("long")
        .alias("s0"),
    )
    per = (
        anchored.select(
            "user_id",
            "sid",
            F.expr(f"cast((t - s0) div ({SESSION_CAP_S} * 1000000) as bigint)")
            .alias("chunk"),
        )
        .groupBy("user_id", "sid", "chunk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return (
        per.groupBy("chunk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subsessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("max_events"),
        )
        .orderBy("chunk")
    )


# --------------------------------------------------------------------
# business-day lag
# --------------------------------------------------------------------


def _bizdays_sql(epoch_col: str) -> str:
    """Weekdays in [1970-01-01, epoch day e) — closed form, validated
    against brute force in tests: 5·((e+3) div 7) +
    least((e+3) mod 7, 5) − 3. Pure div/mod/least, portable to both
    engines verbatim."""
    return (
        f"(5 * (({epoch_col} + 3) // 7)"
        f" + least(({epoch_col} + 3) % 7, 5) - 3)"
    )


_BIZ_ORACLE = f"""
WITH lag_t AS (
  SELECT o.o_orderpriority AS priority,
         {_bizdays_sql("date_diff('day', DATE '1970-01-01', l.l_shipdate)")}
         - {_bizdays_sql("date_diff('day', DATE '1970-01-01', o.o_orderdate)")}
             AS bizdays
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
SELECT priority, CAST(count(*) AS BIGINT) AS n,
       CAST(min(bizdays) AS BIGINT) AS min_bizdays,
       CAST(max(bizdays) AS BIGINT) AS max_bizdays,
       CAST(sum(bizdays) * 1000 // count(*) AS BIGINT)
           AS avg_bizdays_milli
FROM lag_t GROUP BY priority ORDER BY priority
"""


@query("business_days_lag", oracle=_BIZ_ORACLE)
def business_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag measured in BUSINESS days (weekends excluded)
    via the closed-form weekday counter — no calendar dimension
    table, no per-day explode, one arithmetic expression per row
    (the formula g(e) = 5·((e+3) div 7) + least((e+3) mod 7, 5) − 3
    counts weekdays before epoch day e; the lag is g(ship)−g(order),
    naturally SIGNED — this corpus contains shipdates before their
    order dates, and the truncating mean keeps parity on negatives).
    Everything stays in int64 codegen; the join is the standard
    orders⋈lineitem key join and the output is the bounded priority
    rollup with an exact milli-day mean."""
    o = Catalog(spark, sf_dir).orders
    li = Catalog(spark, sf_dir).lineitem
    spark_biz = (
        lambda col: f"(5 * (({col} + 3) div 7)"
        f" + least(({col} + 3) % 7, 5) - 3)"
    )
    ship_e = "datediff(l_shipdate, date '1970-01-01')"
    ord_e = "datediff(o_orderdate, date '1970-01-01')"
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(f"{spark_biz(ship_e)} - {spark_biz(ord_e)}").alias(
            "bizdays"
        ),
    )
    return (
        j.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("bizdays").cast("long").alias("min_bizdays"),
            F.max("bizdays").cast("long").alias("max_bizdays"),
            F.expr(
                "cast(sum(bizdays) * 1000 div count(1) as bigint)"
            ).alias("avg_bizdays_milli"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------
# share-of-parent rollup
# --------------------------------------------------------------------

_SHARE_ORACLE = f"""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum({_CENTS}) AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2),
reg AS (
  SELECT region, CAST(sum(rev_cents) AS BIGINT) AS reg_cents
  FROM rev GROUP BY 1),
tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS t FROM rev)
SELECT rev.region, rev.nation, rev.rev_cents,
       CAST(rev.rev_cents * 1000 // reg.reg_cents AS BIGINT)
           AS share_of_parent_permille
FROM rev JOIN reg ON rev.region = reg.region
UNION ALL
SELECT reg.region, '_all', reg.reg_cents,
       CAST(reg.reg_cents * 1000 // tot.t AS BIGINT)
FROM reg CROSS JOIN tot
ORDER BY region, nation
"""


@query("share_of_parent_rollup", oracle=_SHARE_ORACLE)
def share_of_parent_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The two-level OLAP share report: each nation's revenue as a
    permille share of ITS REGION, plus a ``_all`` row per region
    carrying the region's share of the grand total — the
    drill-down/contribution view every revenue dashboard leads with.
    One fact aggregation to the (region, nation) grain; the region
    totals and the 1-row grand total are broadcast back onto it —
    shares are integer permille, parent-aligned by construction
    (children of a region sum to ≤1000 with truncation loss
    < nation count)."""
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.orders.join(
            cat.customer,
            cat.orders.o_custkey == cat.customer.c_custkey,
        )
        .join(
            B(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            B(cat.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
        # r12 scan-count fix: the region totals, grand total and the
        # child-share join each re-ran the fact aggregation from
        # parquet (4 scans measured); the (region, nation) grain is
        # checkpointed once
        .localCheckpoint()
    )
    reg = rev.groupBy("region").agg(
        F.sum("rev_cents").cast("long").alias("reg_cents")
    )
    tot = rev.agg(F.sum("rev_cents").cast("long").alias("t"))
    child = rev.join(B(reg), "region").select(
        "region",
        "nation",
        "rev_cents",
        F.expr("cast(rev_cents * 1000 div reg_cents as bigint)").alias(
            "share_of_parent_permille"
        ),
    )
    parent = reg.crossJoin(B(tot)).select(
        "region",
        F.lit("_all").alias("nation"),
        F.col("reg_cents").alias("rev_cents"),
        F.expr("cast(reg_cents * 1000 div t as bigint)").alias(
            "share_of_parent_permille"
        ),
    )
    return child.unionByName(parent).orderBy("region", "nation")
