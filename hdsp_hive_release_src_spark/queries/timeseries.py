"""SURVEY.md §2.3 continued — time-series operators beyond plain
bucketing: OHLC bars (first/last-by-time aggregates), calendar
gap-filling (dense day grid with zero-fill), cumulative distinct
users (first-touch + running sum — the two-pass form that avoids a
quadratic distinct-per-day rescan).

Scale notes: OHLC is one shuffle on day with mergeable min_by/max_by;
gap-fill builds the day grid from a 1-row bounds aggregate (broadcast)
so the grid never shuffles the fact table; cumulative-users reduces
events → one row per user before the (tiny) running sum.

DuckDB oracle notes: events.ts is nanosecond parquet; oracles
CAST(ts AS TIMESTAMP) to match the catalog's microsecond floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "ohlc_daily",
    oracle="""
    WITH r AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                 AS day, value,
             row_number() OVER (PARTITION BY date_trunc('day',
                 CAST(ts AS TIMESTAMP))
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_open,
             row_number() OVER (PARTITION BY date_trunc('day',
                 CAST(ts AS TIMESTAMP))
                 ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC)
                 AS rn_close
      FROM events)
    SELECT day,
           round(max(CASE WHEN rn_open = 1 THEN value END), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(CASE WHEN rn_close = 1 THEN value END), 6) AS close,
           count(*) AS n_events
    FROM r GROUP BY day ORDER BY day
    """,
)
def ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: open/close via min_by/max_by on a composite
    (ts, event_id) time key (ties on ts broken deterministically),
    high/low/count in the same single-shuffle aggregation. The oracle
    emulates arg-min/max with window ranks (DuckDB arg_min can't take
    a composite key)."""
    ev = Catalog(spark, sf_dir).events
    tkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.min_by("value", tkey), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", tkey), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day")
    )


@query(
    "gapfill_daily",
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS lo,
             max(date_trunc('day', CAST(ts AS TIMESTAMP))) AS hi
      FROM events),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                  AS TIMESTAMP) AS day FROM b),
    grid AS (
      SELECT day, event_type
      FROM days CROSS JOIN (SELECT DISTINCT event_type FROM events)),
    counts AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                 AS day, event_type, count(*) AS n
      FROM events GROUP BY day, event_type)
    SELECT g.day, g.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN counts c USING (day, event_type)
    ORDER BY g.day, g.event_type
    """,
)
def gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: dense (day × event_type) grid from a 1-row
    min/max bounds aggregate (sequence + explode), zero-filled left
    join against the real daily counts. The grid side is tiny and
    broadcast — the fact table is aggregated exactly once."""
    ev = Catalog(spark, sf_dir).events
    day = F.date_trunc("day", "ts").alias("day")
    # r12 scan-count fix: bounds and the type list used to re-scan
    # events (3 scans measured); both derive from the checkpointed
    # daily count grid, so the fact table really is aggregated
    # exactly once as the docstring promises
    counts = (
        ev.groupBy(day, "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    bounds = counts.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        )
    )
    grid = F.broadcast(
        days.crossJoin(counts.select("event_type").distinct())
    )
    return (
        grid.join(counts, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "window_range_trailing",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW),
               2) AS trailing_30d
    FROM orders WHERE o_custkey < 300
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer trailing 30-day order total.
    Spark's rangeBetween is numeric-only, so the time axis is epoch
    seconds (value-based peers — identical semantics to the oracle's
    RANGE INTERVAL frame, unlike a ROWS frame which would miss
    same-day peers)."""
    o = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.where(F.col("o_custkey") < 300)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "locf_interpolation",
    oracle="""
    SELECT user_id, event_id,
           round(last_value(CASE WHEN event_id % 7 = 0 THEN NULL
                                 ELSE value END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               6) AS value_filled
    FROM events WHERE user_id < 100
    ORDER BY user_id, event_id
    """,
)
def locf_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap repair: nulls (synthesized
    deterministically on every 7th event) are filled from the user's
    most recent non-null reading — last(ignorenulls) over a running
    row frame, one shuffle on user_id. Leading nulls stay null (no
    observation to carry)."""
    ev = Catalog(spark, sf_dir).events
    v = F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.where(F.col("user_id") < 100)
        .select(
            "user_id",
            "event_id",
            F.round(F.last(v, ignorenulls=True).over(w), 6).alias(
                "value_filled"
            ),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "cumulative_users",
    oracle="""
    WITH fs AS (
      SELECT user_id,
             min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                 AS TIMESTAMP)) AS first_day
      FROM events GROUP BY user_id),
    d AS (SELECT first_day AS day, count(*) AS new_users
          FROM fs GROUP BY first_day)
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_users
    FROM d ORDER BY day
    """,
)
def cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day: reduce to one first-touch
    row per user (one shuffle on user_id), then a running sum over the
    tiny per-day series — never a distinct-count rescan per day."""
    ev = Catalog(spark, sf_dir).events
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")
