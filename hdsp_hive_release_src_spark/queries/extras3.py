"""SURVEY.md §2 wave 4c — the remaining Hive date/time builtins with
exact cross-engine parity: unix_timestamp (epoch seconds), last_day
(month-end), add_months (month arithmetic with day clamping). Only
functions whose semantics match DuckDB exactly are included —
months_between's 31-day-fraction rule is Spark-specific and is left
out rather than approximated.

Scale note: one shuffle (groupBy year), all projections codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "date_builtins_extended",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
           count(*) AS n_orders,
           CAST(min(epoch(o_orderdate)) AS BIGINT) AS min_epoch,
           max(last_day(CAST(o_orderdate AS DATE))) AS max_month_end,
           CAST(min(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH)
                AS DATE) AS min_plus_3m
    FROM orders
    GROUP BY year(o_orderdate)
    ORDER BY y
    """,
)
def date_builtins_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix_timestamp / last_day / add_months per order-year. The
    session is pinned to UTC (tune_for_oracle) so epoch seconds agree
    with DuckDB's epoch(); add_months clamps day-of-month identically
    to DuckDB's + INTERVAL MONTH."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.unix_timestamp("o_orderdate")).alias("min_epoch"),
            F.max(F.last_day("o_orderdate")).alias("max_month_end"),
            F.min(F.add_months("o_orderdate", 3)).alias("min_plus_3m"),
        )
        .orderBy("y")
    )
