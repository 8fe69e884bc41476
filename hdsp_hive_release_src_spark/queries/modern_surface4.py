"""SURVEY.md §2.2/§2.3 round-7 — final polish wave:

- ``session_window_sql`` — the NATIVE session_window() grouping
  function (vs the lag+cumsum composition `sessionization` uses):
  dynamic-gap session aggregation in one groupBy. The oracle
  rebuilds identical sessions with the window-function form, so
  parity proves the builtin's gap semantics (end = last event +
  gap).
- ``pivot_multi_agg`` — SQL PIVOT with MULTIPLE aggregate measures
  (count + sum per pivoted value), the form single-measure pivots
  can't express without a join.
- ``percentile_array_variants`` — percentile(col, array(...)): the
  multi-quantile exact form returning an array in one pass; output
  flattened to rows for the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: session gap (minutes) shared with the oracle.
_SW_GAP_MIN = 30


@query(
    "session_window_sql",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                         (PARTITION BY user_id
                          ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       >= {_SW_GAP_MIN} * 60000000
                       OR lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                          (PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id)
                          IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             value
      FROM events),
    sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {_SW_GAP_MIN} MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_window_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session_window() aggregation — Spark's dynamic-gap
    grouping function, the declarative alternative to the lag+cumsum
    composition (`sessionization`): ONE groupBy(session_window(ts,
    gap), user) and the engine merges overlapping windows itself
    (same operator that powers streaming session windows). The
    oracle rebuilds the identical sessions the window-function way,
    pinning the builtin's semantics: window end = last event + gap.
    One (user, ts) exchange; value sums in integer cents."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.session_window("ts", f"{_SW_GAP_MIN} minutes"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "pivot_multi_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F')
                AS BIGINT) AS F_n,
           round(CAST(sum(CAST(l_quantity AS BIGINT))
                 FILTER (WHERE l_linestatus = 'F') AS DOUBLE), 1)
               AS F_qty,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O')
                AS BIGINT) AS O_n,
           round(CAST(sum(CAST(l_quantity AS BIGINT))
                 FILTER (WHERE l_linestatus = 'O') AS DOUBLE), 1)
               AS O_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT with MULTIPLE aggregate measures per pivoted value
    (count AND quantity sum per line status) — the form a
    single-measure pivot needs a self-join to express. Quantities
    sum as exact integers before the display cast. Map-side partial
    aggregation applies to every (value, measure) cell."""
    Catalog(spark, sf_dir).lineitem.createOrReplaceTempView(
        "pivot_li_src"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               F_n, round(CAST(F_qty AS DOUBLE), 1) AS F_qty,
               O_n, round(CAST(O_qty AS DOUBLE), 1) AS O_qty
        FROM (
          SELECT l_returnflag, l_linestatus,
                 CAST(l_quantity AS BIGINT) AS qty
          FROM pivot_li_src)
        PIVOT (count(*) AS n, sum(qty) AS qty
               FOR l_linestatus IN ('F' AS F, 'O' AS O))
        ORDER BY l_returnflag
        """
    ).selectExpr(
        "l_returnflag",
        "CAST(F_n AS BIGINT) AS F_n",
        "F_qty",
        "CAST(O_n AS BIGINT) AS O_n",
        "O_qty",
    )


#: quantile probe points shared with the oracle.
_PCT_POINTS = "0.1, 0.25, 0.5, 0.75, 0.9"


@query(
    "percentile_array_variants",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag,
             unnest(quantile_cont(l_quantity,
                    [{_PCT_POINTS}])) AS qv,
             unnest(CAST([{_PCT_POINTS}] AS DOUBLE[])) AS p
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, p, round(qv, 6) AS quantile_value
    FROM q ORDER BY l_returnflag, p
    """,
)
def percentile_array_variants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact multi-quantile in ONE aggregation: percentile(col,
    array(p...)) returns the whole quantile vector per group in a
    single pass (vs one percentile call per point — five scans).
    Flattened to (group, p, value) rows with posexplode; DuckDB's
    quantile_cont(list) unnests the same way. Both engines use
    linear interpolation on the sorted values, so 6dp parity holds
    exactly."""
    li = Catalog(spark, sf_dir).lineitem
    pts = [float(x) for x in _PCT_POINTS.split(", ")]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_quantity", F.array(*[F.lit(p) for p in pts])
            ).alias("qs")
        )
        .select(
            "l_returnflag", F.posexplode("qs").alias("i", "qv")
        )
        .select(
            "l_returnflag",
            F.element_at(
                F.array(*[F.lit(p) for p in pts]), F.col("i") + 1
            ).alias("p"),
            F.round("qv", 6).alias("quantile_value"),
        )
        .orderBy("l_returnflag", "p")
    )
