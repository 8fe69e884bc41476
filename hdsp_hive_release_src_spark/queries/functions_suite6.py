"""SURVEY.md §2.2 round-5 additions — remaining ANSI/HiveQL syntax
surfaces: the LIKE predicate family (ILIKE / RLIKE / LIKE ALL / LIKE
ANY), the SQL PIVOT→UNPIVOT clause round trip, the named WINDOW
clause, and the remaining date built-ins (months_between's fractional
31-day rule, next_day, ISO week, quarter, dayofweek).

All pure-SQL single-scan shapes; every oracle replays the exact
semantics (DuckDB spells RLIKE as regexp_matches, LIKE ALL as a
conjunction, dayofweek 0-based → +1, months_between via the
documented day-diff/31 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "like_family",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_like,
           CAST(sum(CASE WHEN p_name ILIKE '%GOLD%' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ilike,
           CAST(sum(CASE WHEN regexp_matches(p_name, 'spring|autumn')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rlike,
           CAST(sum(CASE WHEN p_name LIKE '%o%' AND p_name LIKE '%e%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_like_all,
           CAST(sum(CASE WHEN p_name LIKE '%ros%' OR p_name LIKE '%bl%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_like_any
    FROM part
    """,
)
def like_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LIKE predicate family in one scan: plain LIKE,
    case-insensitive ILIKE, regex RLIKE, and the multi-pattern
    LIKE ALL / LIKE ANY quantifiers (which Hive users otherwise
    hand-expand into AND/OR chains). All compile to JVM predicates
    inside one whole-stage-codegen pass — five predicates cost one
    scan, the reason quantified LIKE exists."""
    Catalog(spark, sf_dir).part.createOrReplaceTempView(
        "like_part_src"
    )
    return spark.sql(
        """
        SELECT CAST(sum(CASE WHEN p_name LIKE '%gold%'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_like,
               CAST(sum(CASE WHEN p_name ILIKE '%GOLD%'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_ilike,
               CAST(sum(CASE WHEN p_name RLIKE 'spring|autumn'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_rlike,
               CAST(sum(CASE WHEN p_name LIKE ALL ('%o%', '%e%')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_like_all,
               CAST(sum(CASE WHEN p_name LIKE ANY ('%ros%', '%bl%')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_like_any
        FROM like_part_src
        """
    )


@query(
    "sql_pivot_unpivot",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS status,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, status
    """,
)
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT → UNPIVOT round trip (the clause syntax, distinct
    from the DataFrame pivot API `pivot_orders` covers): order counts
    pivot to one column per status, then unpivot back to rows — the
    round trip must reproduce the plain GROUP BY exactly (UNPIVOT's
    NULL-exclusion drops precisely the combos that never existed).
    One scan for the pivot; unpivot is a map-side expand."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "pivot_orders_src"
    )
    return spark.sql(
        """
        WITH p AS (
          SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus
            FROM pivot_orders_src)
          PIVOT (count(*) FOR o_orderstatus IN
                 ('O' AS st_O, 'F' AS st_F, 'P' AS st_P))
        )
        SELECT o_orderpriority,
               CASE status WHEN 'st_O' THEN 'O' WHEN 'st_F' THEN 'F'
                    ELSE 'P' END AS status,
               n
        FROM p UNPIVOT (n FOR status IN (st_O, st_F, st_P))
        ORDER BY o_orderpriority, status
        """
    )


@query(
    "named_window_clause",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           round(sum(o_totalprice) OVER w, 2) AS run_total,
           round(max(o_totalprice) OVER w, 2) AS run_max
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL WINDOW clause: one named spec shared by several window
    functions — beyond readability, a single named window guarantees
    Catalyst plans ONE sort/partition pass for all of them (inline
    specs rely on spec-equality detection). Identical clause syntax
    both engines."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "winclause_orders_src"
    )
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               round(sum(o_totalprice) OVER w, 2) AS run_total,
               round(max(o_totalprice) OVER w, 2) AS run_max
        FROM winclause_orders_src
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
        """
    )


@query(
    "date_builtins_wave3",
    oracle="""
    SELECT o_orderkey,
           round((year(o_orderdate) - 2023) * 12
                 + (month(o_orderdate) - 1)
                 + CASE WHEN day(o_orderdate) = 15 THEN 0.0
                        ELSE (day(o_orderdate) - 15) / 31.0 END,
                 4) AS mb_anchor,
           CAST(o_orderdate + INTERVAL (
                 CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                      ELSE (8 - isodow(o_orderdate)) % 7 END) DAY
               AS DATE) AS next_monday,
           CAST(week(o_orderdate) AS INTEGER) AS iso_week,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def date_builtins_wave3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining date built-ins: months_between against a fixed
    anchor (fractional (day₁−day₂)/31 rule replayed arithmetically in
    the oracle — equal day-of-month yields exact integers), next_day
    to the following Monday (strictly after, hence the %7→7 wrap in
    the oracle's isodow arithmetic), ISO week number, quarter, and
    dayofweek (Spark 1=Sunday vs DuckDB 0=Sunday, hence +1). All
    map-only."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.round(
            F.months_between(
                F.col("o_orderdate"), F.lit("2023-01-15").cast("date")
            ),
            4,
        ).alias("mb_anchor"),
        F.next_day("o_orderdate", "MO").alias("next_monday"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).orderBy("o_orderkey")
