"""SURVEY.md §2.2 continued — builtin corners wave 4: distinct counts
over windows (the dense_rank workaround for a frame Spark can't
express), median, boolean aggregates, the linear-regression aggregate
family, map-entry explosion, and interval arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "windowed_distinct_count",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_orderpriority
      FROM orders WHERE o_custkey < 200)
    SELECT o_custkey, o_orderkey,
           CAST(count(DISTINCT o_orderpriority)
                OVER (PARTITION BY o_custkey) AS BIGINT)
               AS n_prio
    FROM base ORDER BY o_custkey, o_orderkey
    """,
)
def windowed_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a window — Spark rejects DISTINCT inside a
    window frame, so the engine must provide the classic equivalent:
    dense_rank over the value within the partition, then max(rank)
    broadcast back over the same window. Two window passes sharing ONE
    partitioning (single shuffle); DuckDB supports the frame natively,
    which makes it the perfect oracle for the rewrite's equivalence."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_custkey") < 200)
    wp = Window.partitionBy("o_custkey")
    dr = F.dense_rank().over(
        wp.orderBy("o_orderpriority")
    )
    return (
        o.select("o_custkey", "o_orderkey", dr.alias("_dr"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.max("_dr").over(wp).cast("long").alias("n_prio"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "median_boolean_aggs",
    oracle="""
    SELECT l_returnflag,
           round(median(l_extendedprice), 4) AS med_price,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(count_if(l_tax = 0) AS BIGINT) AS n_taxfree
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def median_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() (the 50th percentile as a first-class aggregate, exact
    — interpolating between middle values like DuckDB) plus the
    boolean aggregate family bool_and/bool_or — the assertion
    aggregates data-quality SQL leans on."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_extendedprice"), 4).alias("med_price"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
            F.bool_or(F.col("l_discount") > 0.09).alias(
                "any_deep_discount"
            ),
            F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "regr_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)
               AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
               AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard linear-regression aggregate family
    (slope/intercept/R²/count of y-on-x) — one-pass sufficient-
    statistics aggregation, so it parallelizes like any sum: the
    at-scale way to fit a trend without an ML library round trip.
    Price regressed on quantity recovers the per-unit price trend."""
    li = Catalog(spark, sf_dir).lineitem
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "explode_map_entries",
    oracle="""
    SELECT o_orderkey, 'prio' AS k, o_orderpriority AS v
    FROM orders WHERE o_orderkey < 300
    UNION ALL
    SELECT o_orderkey, 'stat' AS k, o_orderstatus AS v
    FROM orders WHERE o_orderkey < 300
    ORDER BY o_orderkey, k
    """,
)
def explode_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map explosion: a per-row map unpivoted to (key, value) rows via
    explode(map) — the Hive LATERAL VIEW explode(map_col) idiom the
    array explode queries don't cover. The oracle rebuilds the same
    rows relationally."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 300)
    m = F.create_map(
        F.lit("prio"), F.col("o_orderpriority"),
        F.lit("stat"), F.col("o_orderstatus"),
    )
    return (
        o.select("o_orderkey", F.explode(m).alias("k", "v"))
        .orderBy("o_orderkey", "k")
    )


@query(
    "interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 MONTH
                + INTERVAL 10 DAY AS TIMESTAMP) AS due_ts,
           CAST(datediff('day', CAST(o_orderdate AS TIMESTAMP),
                TIMESTAMP '2024-12-31') AS INTEGER) AS days_to_eoy,
           CAST(12 * (2024 - year(o_orderdate))
                + (12 - month(o_orderdate)) AS BIGINT) AS months_to_2025
    FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey
    """,
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: month+day interval addition (calendar-aware
    — adding 3 months to Jan 31 clamps correctly), day differences to
    a fixed horizon, and a whole-month countdown derived from parts
    (kept integral so both engines agree exactly — fractional
    months_between is engine-defined)."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 400)
    od = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        (od + F.expr("INTERVAL 3 MONTH") + F.expr("INTERVAL 10 DAY"))
        .alias("due_ts"),
        F.datediff(F.lit("2024-12-31").cast("timestamp"), od)
        .cast("int")
        .alias("days_to_eoy"),
        (12 * (2024 - F.year(od)) + (12 - F.month(od)))
        .cast("long")
        .alias("months_to_2025"),
    ).orderBy("o_orderkey")
