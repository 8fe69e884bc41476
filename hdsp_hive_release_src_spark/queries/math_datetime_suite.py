"""SURVEY.md §2.2 round-7 — the last unexercised math builtins and
the datetime CONSTRUCTOR family (make_date / make_timestamp /
make_interval and the epoch converters). Everything is per-row
scalar math — deterministic regardless of partitioning (no
accumulation anywhere), which is what makes float parity safe here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "math_funcs_wave2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(cot(l_quantity / 10.0), 6) AS cot_v,
           CAST(factorial(CAST(CAST(l_quantity AS BIGINT) % 10
                               AS INT)) AS BIGINT) AS fact_v,
           round(cbrt(l_quantity), 6) AS cbrt_v,
           round(exp(l_discount) - 1.0, 6) AS expm1_v,
           round(ln(1.0 + l_discount), 6) AS log1p_v,
           round_even(l_quantity * 1.5, 0) AS rint_v,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_v,
           isnan(CASE WHEN l_orderkey % 7 = 0 THEN 'NaN'::DOUBLE
                      ELSE l_discount END) AS is_nan,
           round(CASE WHEN isnan(CASE WHEN l_orderkey % 7 = 0
                                      THEN 'NaN'::DOUBLE
                                      ELSE l_discount END)
                      THEN -1.0 ELSE l_discount END, 6) AS nanvl_v
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def math_funcs_wave2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math builtins wave 2: cot, factorial, cbrt, expm1/log1p (the
    numerically-stable small-x forms; DuckDB mirrors them with
    exp()-1 / ln(1+x) — for x in the discount range the forms agree
    far inside the 6dp rounding), rint (banker's rounding — quantity
    × 1.5 lands exactly on .5 for odd quantities, so the
    round-half-even semantics is genuinely exercised against DuckDB's
    round_even), signum, and isnan/nanvl over an injected NaN lane.
    hypot is deliberately absent: Java's overflow-safe algorithm and
    a sqrt(x²+y²) mirror can disagree in the last ulp, which is
    exactly the cross-engine noise class the rounding audit bans.
    All per-row scalar math — no accumulation, partition-independent
    by construction."""
    li = Catalog(spark, sf_dir).lineitem
    q = F.col("l_quantity")
    d = F.col("l_discount")
    nan_lane = F.when(
        F.col("l_orderkey") % 7 == 0, F.lit(float("nan"))
    ).otherwise(d)
    return (
        li.where(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.cot(q / 10.0), 6).alias("cot_v"),
            F.factorial((q.cast("long") % 10).cast("int"))
            .cast("long")
            .alias("fact_v"),
            F.round(F.cbrt(q), 6).alias("cbrt_v"),
            F.round(F.expm1(d), 6).alias("expm1_v"),
            F.round(F.log1p(d), 6).alias("log1p_v"),
            F.rint(q * 1.5).alias("rint_v"),
            F.signum(d - 0.05).alias("sign_v"),
            F.isnan(nan_lane).alias("is_nan"),
            F.round(F.nanvl(nan_lane, F.lit(-1.0)), 6).alias(
                "nanvl_v"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "datetime_constructors",
    oracle="""
    SELECT o_orderkey,
           make_date(2020 + CAST(o_orderkey % 5 AS INT),
                     1 + CAST(o_orderkey % 12 AS INT),
                     1 + CAST(o_orderkey % 28 AS INT)) AS built_date,
           make_timestamp(2021, 6, 15,
                          CAST(o_orderkey % 24 AS INT),
                          CAST(o_orderkey % 60 AS INT),
                          (o_orderkey % 60) + 0.25) AS built_ts,
           dayofyear(CAST(o_orderdate AS DATE)) AS doy,
           strftime(to_timestamp(1600000000 + o_orderkey * 3600)
                    AT TIME ZONE 'UTC',
                    '%Y-%m-%d %H:%M:%S') AS from_unix,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
               AS to_unix,
           CAST(o_orderdate AS TIMESTAMP)
               + INTERVAL 1 DAY * (o_orderkey % 30)
               + INTERVAL 1 HOUR * (o_orderkey % 12) AS shifted,
           TRY_CAST('definitely not a date' AS TIMESTAMP)
               AS bad_ts_null
    FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey
    """,
)
def datetime_constructors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime constructor family: make_date / make_timestamp
    (fractional seconds included), dayofyear, from_unixtime /
    unix_timestamp (the epoch bridge — both sessions pinned UTC so
    the string forms agree), interval arithmetic via make_interval,
    and try_to_timestamp's NULL-not-error contract on garbage input.
    Per-row expressions only."""
    o = Catalog(spark, sf_dir).orders
    k = F.col("o_orderkey")
    return (
        o.where(k < 400)
        .select(
            "o_orderkey",
            F.make_date(
                (k % 5 + 2020).cast("int"),
                (k % 12 + 1).cast("int"),
                (k % 28 + 1).cast("int"),
            ).alias("built_date"),
            F.expr(
                "make_timestamp(2021, 6, 15,"
                " cast(o_orderkey % 24 as int),"
                " cast(o_orderkey % 60 as int),"
                " (o_orderkey % 60) + 0.25)"
            ).alias("built_ts"),
            F.dayofyear("o_orderdate").alias("doy"),
            F.from_unixtime(
                F.lit(1600000000) + k * 3600
            ).alias("from_unix"),
            F.unix_timestamp("o_orderdate").alias("to_unix"),
            F.expr(
                "o_orderdate + make_interval(0, 0, 0,"
                " cast(o_orderkey % 30 as int),"
                " cast(o_orderkey % 12 as int), 0, 0)"
            ).alias("shifted"),
            F.try_to_timestamp(
                F.lit("definitely not a date")
            ).alias("bad_ts_null"),
        )
        .orderBy("o_orderkey")
    )
