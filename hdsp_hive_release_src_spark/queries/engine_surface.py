"""SURVEY.md §2.2/§2.5 continued — engine-surface parity queries:

- ``script_transform`` — Hive TRANSFORM (custom script over rows)
  re-expressed as Arrow-batched ``mapInPandas`` with a FULL oracle.
- ``sql_over_views`` — the SQL-string interface: one ANSI string runs
  verbatim on Spark temp views AND as its own DuckDB oracle.
- ``null_safe_join`` — Hive's ``<=>`` (eqNullSafe) join semantics.
- ``window_sliding_hop`` — hopping windows (1-day window, 12-h slide):
  each event lands in two epoch-aligned windows.
- ``ctas_catalog`` — CTAS into the session catalog (managed parquet
  table) and query-back, the Hive metastore workflow.
"""

from __future__ import annotations

import shutil
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table


@query(
    "script_transform",
    oracle="""
    SELECT doc_id,
           upper(substring(text, 1, 20)) AS head_upper,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive TRANSFORM/MAP-REDUCE script stage: arbitrary per-row Python
    over Arrow batches via mapInPandas (the idiomatic replacement for
    piping rows through an external script). Deterministic logic →
    full oracle. At 100 TB this is a map-only stage; batch size is
    Arrow-controlled, never row-at-a-time."""
    d = Catalog(spark, sf_dir).documents

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "head_upper": pdf["text"].str.slice(0, 20).str.upper(),
                    "n_tokens": pdf["text"].str.split(" ").str.len(),
                }
            )

    return d.mapInPandas(
        transform, "doc_id long, head_upper string, n_tokens long"
    ).orderBy("doc_id")


_SHARED_SQL = """
    WITH cust_orders AS (
      SELECT c_mktsegment, o_orderstatus, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT c_mktsegment, o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM cust_orders
    GROUP BY c_mktsegment, o_orderstatus
    ORDER BY c_mktsegment, o_orderstatus
"""


@query("sql_over_views", oracle=_SHARED_SQL)
def sql_over_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HiveQL entry point: register temp views, run a raw SQL
    string. The SAME string is the oracle — byte-identical SQL against
    Spark and DuckDB proves the ANSI-subset surface, not just the
    DataFrame API."""
    cat = Catalog(spark, sf_dir)
    cat.orders.createOrReplaceTempView("orders")
    cat.customer.createOrReplaceTempView("customer")
    return spark.sql(_SHARED_SQL)


@query(
    "null_safe_join",
    oracle="""
    WITH lhs AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer),
    segs AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg
             FROM customer)
    SELECT segs.seg, count(*) AS n_custs
    FROM lhs JOIN segs ON lhs.seg IS NOT DISTINCT FROM segs.seg
    GROUP BY segs.seg ORDER BY segs.seg NULLS FIRST
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's <=> null-safe equality join: NULL keys match each other
    (a plain equi-join drops them). The BUILDING segment is nulled out
    to exercise the NULL bucket. Note: at scale a null-safe join sends
    ALL null keys to one partition — salt them if nulls are hot."""
    c = Catalog(spark, sf_dir).customer
    lhs = c.select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
    )
    segs = lhs.select("seg").distinct().withColumnRenamed("seg", "rseg")
    return (
        lhs.join(F.broadcast(segs), lhs.seg.eqNullSafe(segs.rseg))
        .groupBy(F.col("rseg").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.asc_nulls_first("seg"))
    )


@query(
    "window_sliding_hop",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    x AS (
      SELECT ts, value,
             to_timestamp((epoch_us(ts) // 43200000000) * 43200)
                 AS floor12
      FROM e),
    cand AS (
      SELECT ts, value, CAST(floor12 AS TIMESTAMP) AS w_start FROM x
      UNION ALL
      SELECT ts, value,
             CAST(floor12 - INTERVAL 12 HOUR AS TIMESTAMP) FROM x)
    SELECT w_start, count(*) AS n, round(sum(value), 2) AS total_value
    FROM cand
    WHERE ts >= w_start AND ts < w_start + INTERVAL 24 HOUR
    GROUP BY w_start ORDER BY w_start
    """,
)
def window_sliding_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-day windows every 12 hours — each
    event lands in exactly two epoch-aligned windows (Spark's
    F.window(ts, '1 day', '12 hours'), the batch twin of the streaming
    hop). The oracle replays the assignment arithmetic explicitly."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "total_value")
        .orderBy("w_start")
    )


_CORRELATED_SCALAR_SQL = """
    SELECT o_orderkey, o_totalprice,
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity > 25)
               AS n_bulk_items
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
"""


@query("correlated_scalar_select", oracle=_CORRELATED_SCALAR_SQL)
def correlated_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list — Catalyst
    decorrelates it into an aggregate + left outer join (no per-row
    rescan; the only plan that survives at scale). Same SQL string
    runs as the oracle."""
    cat = Catalog(spark, sf_dir)
    cat.orders.createOrReplaceTempView("orders")
    cat.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(_CORRELATED_SCALAR_SQL)


@query(
    "sql_udf_registration",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand) || ':' || CAST(length(p_name) AS VARCHAR)
               AS tagged
    FROM part WHERE p_partkey < 200 ORDER BY p_partkey
    """,
)
def sql_udf_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive CREATE FUNCTION parity: register a Python scalar UDF under
    a SQL name and call it from a SQL string. Row-at-a-time Python is
    the SLOW path (use pandas_udf / builtins in anything hot — see
    pandas_udf_scalar); what's exercised here is the registration +
    SQL-callable surface itself."""
    cat = Catalog(spark, sf_dir)
    cat.part.createOrReplaceTempView("part")

    def tag(brand: str, name: str) -> str:
        return f"{brand[::-1]}:{len(name)}"

    spark.udf.register("brand_tag", tag, "string")
    return spark.sql(
        """
        SELECT p_partkey, brand_tag(p_brand, p_name) AS tagged
        FROM part WHERE p_partkey < 200 ORDER BY p_partkey
        """
    )


@query(
    "ctas_catalog",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def ctas_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS into the session catalog (managed parquet table) then
    query-back — the Hive metastore create/read workflow. The managed
    location is cleared first: after a metastore reset DROP TABLE
    alone leaves the directory behind and CTAS refuses to overwrite."""
    cat = Catalog(spark, sf_dir)
    table = "ctas_orders_f"
    fresh_managed_table(spark, f"{table}")
    (
        cat.orders.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .saveAsTable(table)
    )
    return (
        spark.table(table)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )
