"""SURVEY.md §2.2 round-5 additions — the modern Spark SQL surface
(3.4/4.x): exact ordered-set percentiles (WITHIN GROUP), SQL session
variables, EXECUTE IMMEDIATE + parameterized queries, GROUP BY ALL /
ORDER BY ALL, lateral column aliases, and to_char/to_number format
round-trips. These are the surfaces a Hive migration lands on when it
modernizes its SQL — each replayed exactly in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "percentile_within_group",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_cont,
           round(quantile_disc(o_totalprice, 0.5), 2) AS median_disc,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_cont
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ordered-set aggregates: PERCENTILE_CONT (linear
    interpolation) and PERCENTILE_DISC (first value at cume_dist ≥ p)
    WITHIN GROUP — the EXACT percentiles, vs percentile_approx's
    sketch. Exact percentiles need the group sorted, so at 100 TB this
    is per-GROUP cost (fine for bounded groups like priority classes);
    unbounded groups take the approx path. DuckDB's
    quantile_cont/quantile_disc share both definitions exactly."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "pwg_orders_src"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile_cont(0.5) WITHIN GROUP
                     (ORDER BY o_totalprice), 4) AS median_cont,
               round(percentile_disc(0.5) WITHIN GROUP
                     (ORDER BY o_totalprice), 2) AS median_disc,
               round(percentile_cont(0.9) WITHIN GROUP
                     (ORDER BY o_totalprice), 4) AS p90_cont
        FROM pwg_orders_src
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "sql_session_variables",
    oracle="""
    WITH thresh AS (
      SELECT round(avg(o_totalprice), 2) AS cutoff FROM orders)
    SELECT count(*) AS n_above,
           round(min(o_totalprice), 2) AS min_above,
           (SELECT cutoff FROM thresh) AS cutoff_used
    FROM orders, thresh WHERE o_totalprice > thresh.cutoff
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE / SET VAR, Spark 4): a scalar
    computed once into a variable, then used as a literal in a second
    query — the procedural-script idiom (Hive's hivevar / SET
    substitution, now typed and evaluated server-side). The oracle
    inlines the same scalar via a CTE; values must agree exactly.
    Variables are session-scoped literals at plan time, so the second
    query's filter is a pushed-down constant predicate — no re-scan
    of the defining subquery."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "var_orders_src"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE rev_cutoff DOUBLE")
    spark.sql(
        "SET VAR rev_cutoff = (SELECT round(avg(o_totalprice), 2)"
        " FROM var_orders_src)"
    )
    return spark.sql(
        """
        SELECT count(*) AS n_above,
               round(min(o_totalprice), 2) AS min_above,
               rev_cutoff AS cutoff_used
        FROM var_orders_src WHERE o_totalprice > rev_cutoff
        """
    )


@query(
    "parameterized_query",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_custkey < 500
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter queries two ways: the spark.sql(args=...) API
    and SQL-level EXECUTE IMMEDIATE ... USING — the injection-safe
    parameter binding Hive scripts fake with string substitution.
    Both forms must produce identical results (the EXECUTE IMMEDIATE
    result is what's returned; a cross-check against the args form
    runs in tests). Parameters bind as literals before optimization,
    so the predicate pushes down like any constant."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "param_orders_src"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority, count(*) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM param_orders_src WHERE o_custkey < ?
         GROUP BY o_orderpriority ORDER BY o_orderpriority'
        USING 500
        """
    )


@query(
    "group_order_by_all",
    oracle="""
    SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the DuckDB-popularized shorthand
    Spark adopted in 3.4/4.x): non-aggregate select items become the
    grouping key, and the full select list becomes the sort key —
    identical SQL text runs on both engines, which is itself the
    point of the feature (one less place for a migration to
    diverge)."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "gba_orders_src"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM gba_orders_src
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "lateral_column_alias",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice * 0.07, 2) AS tax,
           round(round(o_totalprice * 0.07, 2) + o_totalprice, 2)
               AS gross,
           round(round(round(o_totalprice * 0.07, 2) + o_totalprice, 2)
                 - round(o_totalprice * 0.07, 2), 2) AS net_check
    FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
    """,
)
def lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4): a select item referencing
    an alias defined EARLIER IN THE SAME SELECT — the chained-derived-
    column idiom that otherwise forces nested subqueries. The oracle
    expands the chain manually; values must match through every
    intermediate rounding step (proving the alias references the
    rounded result, not a re-derivation)."""
    Catalog(spark, sf_dir).orders.where(
        F.col("o_orderkey") < 2000
    ).createOrReplaceTempView("lca_orders_src")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice * 0.07, 2) AS tax,
               round(tax + o_totalprice, 2) AS gross,
               round(gross - tax, 2) AS net_check
        FROM lca_orders_src ORDER BY o_orderkey
        """
    )


@query(
    "number_format_roundtrip",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_totalprice
      FROM orders WHERE o_orderkey < 2000)
    SELECT o_orderkey,
           '$' || format('{:,}', cents // 100) || '.'
               || lpad(CAST(cents % 100 AS VARCHAR), 2, '0')
               AS formatted,
           round(o_totalprice, 2) AS reparsed
    FROM c ORDER BY o_orderkey
    """,
)
def number_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_char / to_number format-template round trip (Oracle-style
    '$9,999.99' templates, Spark 3.4): each price renders to a
    grouped currency string and parses back to exactly the original
    value — the ETL pattern for ingesting formatted numerics from
    mainframe/report extracts. The oracle reproduces the rendering
    with format('{:,.2f}') and expects the reparse to equal the
    source, so a lossy template (too few 9s, dropped cents) breaks
    parity."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    fmt = "$999,999,999.99"
    formatted = F.expr(f"to_char(o_totalprice, '{fmt}')")
    return o.select(
        "o_orderkey",
        F.regexp_replace(formatted, " ", "").alias("formatted"),
        F.round(
            F.expr(
                f"to_number(to_char(o_totalprice, '{fmt}'), '{fmt}')"
            ).cast("double"),
            2,
        ).alias("reparsed"),
    ).orderBy("o_orderkey")
