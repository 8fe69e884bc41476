"""SURVEY.md §2.2 continued — builtin corners wave 3: dynamic pivot
(values inferred from the data, the thing HiveQL itself cannot do),
array mutation functions, bitmap-based exact distinct aggregation, the
week/quarter date_trunc variants, and the try_cast error-safe family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "pivot_dynamic",
    oracle="""
    SELECT c_mktsegment,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS "F",
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS "O",
           CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS "P"
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot: the status columns are INFERRED from the data
    (no value list passed — Spark runs the distinct scan itself),
    which plain HiveQL cannot express at all and pivot_orders's static
    variant sidesteps. The oracle pins the complete inferred column
    set, so a status appearing or vanishing breaks parity loudly. At
    100 TB pass the value list explicitly when you know it — the
    inference is an extra distinct scan."""
    cat = Catalog(spark, sf_dir)
    j = cat.orders.join(
        cat.customer, F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus")  # no values= → inferred
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("c_mktsegment")
    )


@query(
    "array_funcs_wave2",
    oracle="""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part
      WHERE p_partkey < 200)
    SELECT p_partkey,
           CAST(coalesce(list_position(ws, 'green'), 0)
                AS INTEGER) AS pos_green,
           array_to_string(list_prepend('HEAD', ws), chr(31)) AS pre,
           array_to_string(ws[1:1] || ['X'] || ws[2:], chr(31)) AS ins,
           array_to_string(ws[2:], chr(31)) AS tail_slice
    FROM t ORDER BY p_partkey
    """,
)
def array_funcs_wave2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array mutation wave 2: array_position (1-based; Spark returns 0
    when absent where DuckDB's list_position returns NULL — the oracle
    coalesces to 0 to pin Spark's convention), array_prepend,
    array_insert, and tail slicing. All map-only expression work."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 200)
    ws = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_position(ws, "green").cast("int").alias("pos_green"),
        F.concat_ws("\x1f", F.array_prepend(ws, F.lit("HEAD"))).alias(
            "pre"
        ),
        F.concat_ws(
            "\x1f", F.array_insert(ws, 2, F.lit("X"))
        ).alias("ins"),
        F.concat_ws(
            "\x1f", F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0)))
        ).alias("tail_slice"),
    ).orderBy("p_partkey")


@query(
    "bitmap_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders WHERE o_custkey < 30000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def bitmap_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap exact distinct (Spark 3.5 bitmap_* family): per-group
    roaring-style bitmaps over bucketed bit positions, summed across
    buckets — EXACT distinct counts with mergeable fixed-size state,
    the middle ground between count_distinct's shuffle-heavy exact
    expand and HLL's approximation. The bucket sub-aggregation is the
    shape that scales: state per (group, bucket) is one 4KB bitmap."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_custkey") < 30000)
    per_bucket = (
        o.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias(
                "n_custs"
            )
        )
        .orderBy("o_orderpriority")
    )


@query(
    "date_trunc_variants",
    oracle="""
    SELECT CAST(date_trunc('week', CAST(o_orderdate AS TIMESTAMP))
                AS TIMESTAMP) AS wk,
           CAST(date_trunc('quarter', CAST(o_orderdate AS TIMESTAMP))
                AS TIMESTAMP) AS qtr,
           count(*) AS n
    FROM orders GROUP BY wk, qtr ORDER BY wk, qtr
    """,
)
def date_trunc_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc at the divergence-prone granularities: 'week' (ISO
    Monday start — engines disagreeing on week start silently shifts
    every weekly report) and 'quarter'. Parity proves both engines
    share the ISO convention on this data."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy(
            F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
            F.date_trunc("quarter", F.col("o_orderdate")).alias("qtr"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("wk", "qtr")
    )


@query(
    "try_cast_family",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST('x' || o_orderstatus AS BIGINT) AS bad_cast,
           TRY_CAST(o_orderkey AS SMALLINT) AS narrow_cast,
           TRY_CAST(o_orderpriority[1:1] AS BIGINT) AS prio_digit
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def try_cast_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast — NULL-on-failure casting (vs ANSI cast's job-killing
    error): a guaranteed-bad cast (NULL for every row), a narrowing
    cast that overflows to NULL only where the key exceeds smallint
    (DuckDB agrees on overflow→NULL under TRY_CAST), and a
    digit-prefix parse that succeeds. The ingest-hardening idiom
    alongside try_arithmetic and the PERMISSIVE CSV quarantine."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.expr(
            "TRY_CAST(concat('x', o_orderstatus) AS BIGINT)"
        ).alias("bad_cast"),
        F.expr("TRY_CAST(o_orderkey AS SMALLINT)").alias("narrow_cast"),
        F.expr(
            "TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"
        ).alias("prio_digit"),
    ).orderBy("o_orderkey")
