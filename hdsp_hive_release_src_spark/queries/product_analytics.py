"""SURVEY.md §2.3 continued — product-analytics composites: first-touch
attribution within sessions, statistical outlier flagging, and
time-to-convert distributions. Each composes primitives the suite
already verifies (sessionization windows, stats aggregates) into the
query shapes analysts actually run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "session_first_touch_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE user_id < 300),
    tagged AS (
      SELECT *,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       >= 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      FROM tagged),
    attributed AS (
      SELECT user_id, sid,
             min(CASE WHEN event_type = 'view' THEN event_id END)
                 AS first_view,
             round(sum(CASE WHEN event_type = 'purchase'
                            THEN value ELSE 0 END), 2) AS revenue
      FROM sess GROUP BY user_id, sid)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count_if(first_view IS NOT NULL AND revenue > 0)
                AS BIGINT) AS attributed_sessions,
           round(sum(CASE WHEN first_view IS NOT NULL
                          THEN revenue ELSE 0 END), 2)
               AS attributed_revenue,
           round(sum(revenue), 2) AS total_revenue
    FROM attributed
    """,
)
def session_first_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution: purchase revenue inside a 30-minute
    session is credited to the session's first view event — the
    marketing-analytics composite of gap sessionization + conditional
    aggregation. One user_id shuffle serves both windows and the
    session rollup."""
    ev = Catalog(spark, sf_dir).events.where(F.col("user_id") < 300)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    tagged = ev.withColumn(
        "is_new",
        F.when(
            gap_us.isNull() | (gap_us >= 1800 * 1_000_000), 1
        ).otherwise(0),
    )
    sess = tagged.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    attributed = sess.groupBy("user_id", "sid").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("event_id"))
        ).alias("first_view"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ),
            2,
        ).alias("revenue"),
    )
    return attributed.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_if(
            F.col("first_view").isNotNull() & (F.col("revenue") > 0)
        ).alias("attributed_sessions"),
        F.round(
            F.sum(
                F.when(
                    F.col("first_view").isNotNull(), F.col("revenue")
                ).otherwise(0.0)
            ),
            2,
        ).alias("attributed_revenue"),
        F.round(F.sum("revenue"), 2).alias("total_revenue"),
    )


@query(
    "zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority AS grp,
             avg(o_totalprice) AS mu,
             stddev_samp(o_totalprice) AS sigma
      FROM orders GROUP BY o_orderpriority)
    SELECT grp,
           CAST(count_if(abs((o_totalprice - mu) / sigma) > 2.5)
                AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(max(abs((o_totalprice - mu) / sigma)), 4) AS max_z
    FROM orders JOIN stats ON o_orderpriority = grp
    GROUP BY grp ORDER BY grp
    """,
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 2.5) — the
    statistical DQ screen between the hard-rule dq_audit and a model:
    group moments aggregate once (tiny), broadcast back over the fact
    scan, flags count map-side. Two passes total, no window sort."""
    o = Catalog(spark, sf_dir).orders
    stats = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sigma"),
    )
    z = F.abs((F.col("o_totalprice") - F.col("mu")) / F.col("sigma"))
    return (
        o.join(
            F.broadcast(stats),
            F.col("o_orderpriority") == F.col("grp"),
        )
        .groupBy("grp")
        .agg(
            F.count_if(z > 2.5).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.max(z), 4).alias("max_z"),
        )
        .orderBy("grp")
    )


@query(
    "time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                 AS first_view_us,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                 AS first_buy_us
      FROM events GROUP BY user_id),
    converted AS (
      SELECT (first_buy_us - first_view_us) / 1000000.0 AS ttc_s
      FROM firsts
      WHERE first_view_us IS NOT NULL AND first_buy_us IS NOT NULL
        AND first_buy_us >= first_view_us)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(median(ttc_s), 1) AS median_ttc_s,
           round(quantile_cont(ttc_s, 0.9), 1) AS p90_ttc_s,
           CAST(round(min(ttc_s)) AS BIGINT) AS min_ttc_s
    FROM converted
    """,
)
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from FIRST view
    to FIRST purchase (users who bought before ever viewing are
    excluded — the funnel direction matters), summarized as median and
    p90. One conditional-min aggregation per user, then percentile
    over the user-level (small) result — the fact table never sorts."""
    ev = Catalog(spark, sf_dir).events
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(
                F.col("event_type") == "view", F.unix_micros("ts")
            )
        ).alias("first_view_us"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.unix_micros("ts")
            )
        ).alias("first_buy_us"),
    )
    conv = firsts.where(
        F.col("first_view_us").isNotNull()
        & F.col("first_buy_us").isNotNull()
        & (F.col("first_buy_us") >= F.col("first_view_us"))
    ).select(
        (
            (F.col("first_buy_us") - F.col("first_view_us")) / 1_000_000.0
        ).alias("ttc_s")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.median("ttc_s"), 1).alias("median_ttc_s"),
        F.round(F.expr("percentile(ttc_s, 0.9)"), 1).alias("p90_ttc_s"),
        F.round(F.min("ttc_s")).cast("long").alias("min_ttc_s"),
    )
