"""SURVEY.md §2 round-9 twenty-first wave (queued for the r10 window)
— the epoch / timezone / interval constructor matrix (the Spark 4.x
datetime builtins the earlier datetime waves did not reach):

- ``epoch_timezone_matrix`` — timestamp_seconds / timestamp_millis /
  unix_seconds / unix_millis / unix_date / date_from_unix_date /
  to_unix_timestamp round trips, dayname/monthname, convert_timezone
  (UTC → America/New_York across a DST boundary), and
  make_dt_interval / make_ym_interval applied to an anchor timestamp
  (intervals are compared by their EFFECT — adding them — not their
  engine-specific string forms). One row mixing literals with
  data-derived epochs so the matrix cannot go vacuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_EPOCH_ORACLE = """
WITH mn AS (
  SELECT min(CAST(ts AS TIMESTAMP)) AS mints,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events)
SELECT
  strftime(to_timestamp(1700000000)::TIMESTAMP,
           '%Y-%m-%d %H:%M:%S') AS ts_from_seconds,
  strftime(epoch_ms(1700000000123)::TIMESTAMP,
           '%Y-%m-%d %H:%M:%S.%g') AS ts_from_millis,
  CAST(epoch_us(TIMESTAMP '2023-11-14 22:13:20') // 1000000
       AS BIGINT) AS unix_s,
  CAST(epoch_ms(TIMESTAMP '2023-11-14 22:13:20.123')
       AS BIGINT) AS unix_ms,
  CAST(date_diff('day', DATE '1970-01-01', DATE '2024-03-01')
       AS BIGINT) AS unix_d,
  CAST(DATE '1970-01-01' + INTERVAL 19783 DAY AS DATE)
      AS date_from_unix_d,
  CAST(epoch_us(TIMESTAMP '2024-03-01 12:00:00') // 1000000
       AS BIGINT) AS to_unix_ts,
  left(dayname(DATE '2024-03-01'), 3) AS day_name,
  left(monthname(DATE '2024-03-01'), 3) AS month_name,
  strftime(TIMESTAMP '2024-03-09 12:00:00'
           AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York',
           '%Y-%m-%d %H:%M:%S') AS ny_before_dst,
  strftime(TIMESTAMP '2024-03-10 12:00:00'
           AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York',
           '%Y-%m-%d %H:%M:%S') AS ny_after_dst,
  strftime(TIMESTAMP '2024-01-01 00:00:00'
           + INTERVAL '1 day 2 hours 3 minutes 4.5 seconds',
           '%Y-%m-%d %H:%M:%S.%g') AS anchor_plus_dt,
  CAST(DATE '2024-01-15' + INTERVAL '1 year 7 months' AS DATE)
      AS anchor_plus_ym,
  CAST(epoch_us(mn.mints) // 1000000 AS BIGINT) AS min_event_unix_s,
  mn.n_events
FROM mn
"""


@query("epoch_timezone_matrix", oracle=_EPOCH_ORACLE)
def epoch_timezone_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch/timezone/interval constructor matrix:
    timestamp_seconds / timestamp_millis and their unix_* inverses,
    unix_date / date_from_unix_date, to_unix_timestamp,
    dayname/monthname (normalized to 3 letters — DuckDB spells them
    out), convert_timezone probed ON BOTH SIDES of the 2024 US DST
    spring-forward (2024-03-09 12:00 UTC → NY 07:00 EST but
    2024-03-10 12:00 UTC → NY 08:00 EDT — a tz-table regression
    flips exactly one of the two), and make_dt_interval /
    make_ym_interval verified by their EFFECT on anchor dates
    (interval string forms differ by engine; the arithmetic cannot).
    The events min-timestamp epoch and row count anchor the matrix
    to real data. All literal work is constant-folded; the only scan
    is the 1-row min/count aggregate."""
    ev = Catalog(spark, sf_dir).events
    mn = ev.agg(
        F.min("ts").alias("mints"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return mn.select(
        F.expr(
            "date_format(timestamp_seconds(1700000000),"
            " 'yyyy-MM-dd HH:mm:ss')"
        ).alias("ts_from_seconds"),
        F.expr(
            "date_format(timestamp_millis(1700000000123),"
            " 'yyyy-MM-dd HH:mm:ss.SSS')"
        ).alias("ts_from_millis"),
        F.expr("unix_seconds(TIMESTAMP '2023-11-14 22:13:20')")
        .cast("long")
        .alias("unix_s"),
        F.expr("unix_millis(TIMESTAMP '2023-11-14 22:13:20.123')")
        .cast("long")
        .alias("unix_ms"),
        F.expr("unix_date(DATE '2024-03-01')")
        .cast("long")
        .alias("unix_d"),
        F.expr("date_from_unix_date(19783)").alias("date_from_unix_d"),
        F.expr("to_unix_timestamp('2024-03-01 12:00:00')")
        .cast("long")
        .alias("to_unix_ts"),
        F.expr("dayname(DATE '2024-03-01')").alias("day_name"),
        F.expr("monthname(DATE '2024-03-01')").alias("month_name"),
        F.expr(
            "date_format(convert_timezone('UTC', 'America/New_York',"
            " TIMESTAMP_NTZ '2024-03-09 12:00:00'),"
            " 'yyyy-MM-dd HH:mm:ss')"
        ).alias("ny_before_dst"),
        F.expr(
            "date_format(convert_timezone('UTC', 'America/New_York',"
            " TIMESTAMP_NTZ '2024-03-10 12:00:00'),"
            " 'yyyy-MM-dd HH:mm:ss')"
        ).alias("ny_after_dst"),
        F.expr(
            "date_format(TIMESTAMP '2024-01-01 00:00:00'"
            " + make_dt_interval(1, 2, 3, 4.5),"
            " 'yyyy-MM-dd HH:mm:ss.SSS')"
        ).alias("anchor_plus_dt"),
        F.expr(
            "cast(DATE '2024-01-15' + make_ym_interval(1, 7) as date)"
        ).alias("anchor_plus_ym"),
        F.expr("unix_seconds(cast(mints as timestamp))")
        .cast("long")
        .alias("min_event_unix_s"),
        "n_events",
    )
