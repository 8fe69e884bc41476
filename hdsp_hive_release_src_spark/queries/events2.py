"""SURVEY.md §2.3 continued — events wave 2: forward as-of join,
day-over-day anomaly flags, group-size skew profiling, and per-column
data profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.asof import asof_join
from hdsp_hive_release_src_spark.registry import query


@query(
    "asof_join_forward",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             -epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS nt
      FROM orders WHERE o_custkey < 100),
    e AS (
      SELECT user_id, value,
             -epoch_us(CAST(ts AS TIMESTAMP)) AS nt
      FROM events WHERE user_id < 100)
    SELECT o.o_orderkey,
           CAST(count(e.nt) AS BIGINT) AS has_next,
           round(coalesce(max(e.value), -1.0), 2) AS next_value
    FROM o ASOF LEFT JOIN e
      ON o.o_custkey = e.user_id AND e.nt <= o.nt
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — each order matched to the user's NEXT
    event at-or-after the order date (the "what happened next"
    direction backward as-of can't answer). Implemented by running the
    backward operator on NEGATED epoch timestamps — direction is a
    sign flip, not a second operator; DuckDB's ASOF does the same
    trick in the oracle. Ties at the exact instant resolve to the
    event (inclusive), matching the backward operator's contract."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(F.col("o_custkey") < 100).select(
        "o_orderkey",
        "o_custkey",
        (-F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "nt"
        ),
    )
    e = cat.events.where(F.col("user_id") < 100).select(
        "user_id",
        "value",
        (-F.unix_micros("ts")).alias("ent"),
    )
    joined = asof_join(
        o,
        e,
        left_on="nt",
        right_on="ent",
        by_left="o_custkey",
        by_right="user_id",
        value_cols=["value"],
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count("value_right").cast("long").alias("has_next"),
            F.round(
                F.coalesce(F.max("value_right"), F.lit(-1.0)), 2
            ).alias("next_value"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "event_count_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                  AS TIMESTAMP) AS day,
             count(*) AS n
      FROM events GROUP BY event_type, day),
    flagged AS (
      SELECT *, lag(n) OVER (PARTITION BY event_type ORDER BY day)
                 AS prev_n
      FROM daily)
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CAST(prev_n AS BIGINT) AS prev_n,
           (n > 2 * prev_n OR 2 * n < prev_n) AS anomaly
    FROM flagged WHERE prev_n IS NOT NULL
    ORDER BY event_type, day
    """,
)
def event_count_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volume anomaly flags (count doubled or halved vs
    the prior day, per event type) — the simplest alarm every ingest
    monitor runs; the window is over the per-day AGGREGATE (tiny), so
    the pattern costs one shuffle regardless of event volume."""
    ev = Catalog(spark, sf_dir).events
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    flagged = daily.withColumn("prev_n", F.lag("n").over(w))
    return (
        flagged.where(F.col("prev_n").isNotNull())
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.col("prev_n").cast("long").alias("prev_n"),
            (
                (F.col("n") > 2 * F.col("prev_n"))
                | (2 * F.col("n") < F.col("prev_n"))
            ).alias("anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "group_size_skew_profile",
    oracle="""
    WITH sizes AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey)
    SELECT CAST(n_orders AS BIGINT) AS group_size,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(count(*)) OVER (ORDER BY n_orders DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_groups
    FROM sizes GROUP BY n_orders ORDER BY group_size DESC
    """,
)
def group_size_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size (key-skew) profile: the distribution of orders per
    customer as (size → how many keys), with a cumulative count from
    the heaviest down — the diagnostic you run BEFORE choosing a
    partitioning strategy: a long tail at the top row means salting or
    AQE skew handling, a flat profile means plain hash partitioning is
    fine. Two aggregations; the window runs over the profile (tiny)."""
    o = Catalog(spark, sf_dir).orders
    sizes = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    profile = sizes.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    w = (
        Window.orderBy(F.desc("n_orders"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return profile.select(
        F.col("n_orders").cast("long").alias("group_size"),
        F.col("n_groups").cast("long").alias("n_groups"),
        F.sum("n_groups").over(w).cast("long").alias("cum_groups"),
    ).orderBy(F.desc("group_size"))


@query(
    "column_profile",
    oracle="""
    SELECT 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(o_custkey) AS BIGINT) AS nulls,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(min(o_custkey) AS DOUBLE) AS min_v,
           CAST(max(o_custkey) AS DOUBLE) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2)
    FROM orders
    UNION ALL
    SELECT 'o_shippriority_mod',
           count(*), count(*) - count(o_orderkey),
           count(DISTINCT o_orderkey % 7),
           CAST(min(o_orderkey % 7) AS DOUBLE),
           CAST(max(o_orderkey % 7) AS DOUBLE)
    FROM orders
    ORDER BY col
    """,
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile (count / nulls / distinct / min / max,
    one row per column) — the catalog-profiling surface every data
    discovery tool materializes. All columns profile in a SINGLE scan
    (one wide aggregate, reshaped to long), not a scan per column —
    the difference between O(1) and O(columns) passes at 100 TB."""
    o = Catalog(spark, sf_dir).orders
    wide = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("ck_nn"),
        F.count_distinct("o_custkey").alias("ck_nd"),
        F.min("o_custkey").cast("double").alias("ck_min"),
        F.max("o_custkey").cast("double").alias("ck_max"),
        F.count("o_totalprice").alias("tp_nn"),
        F.count_distinct("o_totalprice").alias("tp_nd"),
        F.round(F.min("o_totalprice"), 2).alias("tp_min"),
        F.round(F.max("o_totalprice"), 2).alias("tp_max"),
        F.count("o_orderkey").alias("sp_nn"),
        F.count_distinct(F.col("o_orderkey") % 7).alias("sp_nd"),
        F.min(F.col("o_orderkey") % 7).cast("double").alias("sp_min"),
        F.max(F.col("o_orderkey") % 7).cast("double").alias("sp_max"),
        # r12 scan-count fix: the long reshape selects this 1-row
        # aggregate once per column — checkpoint it so the single-scan
        # promise in the docstring holds in the executed plan too
    ).localCheckpoint()
    rows = [
        ("o_custkey", "ck_nn", "ck_nd", "ck_min", "ck_max"),
        ("o_totalprice", "tp_nn", "tp_nd", "tp_min", "tp_max"),
        ("o_shippriority_mod", "sp_nn", "sp_nd", "sp_min", "sp_max"),
    ]
    out = None
    for name, nn, nd, mn, mx in rows:
        part = wide.select(
            F.lit(name).alias("col"),
            F.col("n").cast("long").alias("n"),
            (F.col("n") - F.col(nn)).cast("long").alias("nulls"),
            F.col(nd).cast("long").alias("n_distinct"),
            F.col(mn).cast("double").alias("min_v"),
            F.col(mx).cast("double").alias("max_v"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("col")


@query(
    "batch_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                  - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                  >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS is_new
      FROM events),
    tagged AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered)
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(max(ts)) + 30 * 60 * 1000000 AS BIGINT)
               AS session_end_us,
           count(*) AS n_events
    FROM tagged GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window() in BATCH mode (30-min gap) — the same
    builtin the streaming job uses (stream_sessionization), here as a
    one-shot groupBy: Spark merges overlapping [ts, ts+gap) intervals
    per key into sessions whose end = last event + gap — the window
    end is EXCLUSIVE, so an event exactly gap after its predecessor
    starts a NEW session (the oracle's split condition is therefore
    >=, not >). The oracle derives identical sessions from the
    lag/cumsum formulation,
    proving the two sessionization formulations (window-function and
    native operator) agree — which is also the batch↔stream
    consistency contract. One shuffle on user_id."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


@query(
    "watermark_lateness_profile",
    oracle="""
    WITH arr AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
             max(CAST(ts AS TIMESTAMP)) OVER
               (ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS high_water
      FROM events),
    late AS (
      SELECT CAST((epoch_us(high_water) - epoch_us(ts)) / 1000000.0
                  AS DOUBLE) AS lateness_s
      FROM arr)
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN lateness_s > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out_of_order,
           round(max(lateness_s), 2) AS max_lateness_s,
           round(quantile_cont(lateness_s, 0.99), 2) AS p99_lateness_s
    FROM late
    """,
)
def watermark_lateness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Out-of-orderness profile — the measurement that SETS a
    watermark delay instead of guessing it: replaying events in
    arrival order (event_id), each event's lateness is how far it
    trails the running event-time high-water mark; the p99/max tell
    you what `withWatermark` delay keeps (almost) everything while
    bounding state. The running max is a single ordered pass in
    arrival order — in production this profile is computed per
    partition/source (arrival order only exists per partition), here
    globally so the oracle can replay it exactly."""
    ev = Catalog(spark, sf_dir).events
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    arr = ev.select(
        "ts", F.max("ts").over(w).alias("high_water")
    )
    late = arr.select(
        (
            (
                F.unix_micros("high_water") - F.unix_micros("ts")
            )
            / 1e6
        ).alias("lateness_s")
    )
    late.createOrReplaceTempView("lateness_src")
    return spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN lateness_s > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_out_of_order,
               round(max(lateness_s), 2) AS max_lateness_s,
               round(percentile_cont(0.99) WITHIN GROUP
                     (ORDER BY lateness_s), 2) AS p99_lateness_s
        FROM lateness_src
        """
    )
