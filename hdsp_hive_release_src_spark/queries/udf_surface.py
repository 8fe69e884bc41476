"""SURVEY.md §2.2 continued — the full UDF taxonomy, each tier with a
FULL oracle (deterministic logic, so value parity is checkable):

- ``pandas_udf_scalar`` — vectorized scalar @pandas_udf (Arrow batch
  in/out; the 10-100× replacement for row-at-a-time Python UDFs).
- ``grouped_pandas_quantiles`` — applyInPandas grouped-map (whole
  group as one pandas frame — Hive UDAF-with-script analog).
- (``script_transform`` in engine_surface.py covers mapInPandas;
  ``stream_stateful_user_agg`` covers applyInPandasWithState.)

Plus the UDTF corners Hive's LATERAL VIEW surface includes:
- ``explode_outer_empty`` — explode_outer keeps empty-array parents.
- ``arrays_zip_explode`` — arrays_zip + inline-style struct explode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "pandas_udf_scalar",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
               AS n_word_runs,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)
               AS n_vowels
    FROM documents ORDER BY doc_id
    """,
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: regex feature extraction on Arrow
    string batches (pandas .str ops are C-backed — the sanctioned shape
    when a builtin truly doesn't cover the logic). Map-only at scale."""

    @pandas_udf("long")
    def word_runs(s: pd.Series) -> pd.Series:
        return s.str.count("[a-z]+").astype("int64")

    @pandas_udf("long")
    def vowels(s: pd.Series) -> pd.Series:
        return s.str.count("[aeiou]").astype("int64")

    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        word_runs("text").alias("n_word_runs"),
        vowels("text").alias("n_vowels"),
    ).orderBy("doc_id")


@query(
    "grouped_pandas_quantiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 4) AS q25,
           round(quantile_cont(c_acctbal, 0.50), 4) AS q50,
           round(quantile_cont(c_acctbal, 0.75), 4) AS q75,
           CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def grouped_pandas_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each market segment arrives as one
    pandas frame, numpy computes linear-interpolated quartiles
    (identical to SQL quantile_cont / percentile). One shuffle on the
    group key; groups must fit one executor's memory — fine for
    bounded-cardinality dimensions, use approx sketches otherwise."""
    c = Catalog(spark, sf_dir).customer

    def quartiles(pdf: pd.DataFrame) -> pd.DataFrame:
        q25, q50, q75 = np.percentile(pdf["c_acctbal"], [25, 50, 75])
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "q25": [round(q25, 4)],
                "q50": [round(q50, 4)],
                "q75": [round(q75, 4)],
                "n": [len(pdf)],
            }
        )

    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(
            quartiles,
            "c_mktsegment string, q25 double, q50 double, q75 double, n long",
        )
        .orderBy("c_mktsegment")
    )


@query(
    "explode_outer_empty",
    oracle="""
    SELECT p_partkey,
           unnest(CASE WHEN p_size % 10 = 0 THEN [NULL]
                       ELSE string_split(p_type, '') END) AS ch
    FROM part WHERE p_partkey < 300
    """,
)
def explode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: parents with empty arrays survive as a NULL row
    (plain explode silently drops them — the classic LATERAL VIEW
    OUTER pitfall). Every 10th size gets an empty array to prove it."""
    p = Catalog(spark, sf_dir).part
    arr = F.when(
        F.col("p_size") % 10 == 0, F.array().cast("array<string>")
    ).otherwise(F.split("p_type", ""))
    return (
        p.where(F.col("p_partkey") < 300)
        .select("p_partkey", F.explode_outer(arr).alias("ch"))
    )


@query(
    "arrays_zip_explode",
    oracle="""
    SELECT p_partkey,
           unnest(list_transform(string_split(p_name, ' '),
                  x -> {'word': x, 'wlen': CAST(len(x) AS INTEGER)}),
                  recursive := true)
    FROM part WHERE p_partkey < 200
    """,
)
def arrays_zip_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + inline (explode of an array<struct>): tokens zipped
    with their lengths, one output row per struct field pair — Hive's
    LATERAL VIEW inline(...) shape, built array-side (no join)."""
    p = Catalog(spark, sf_dir).part
    ws = F.split("p_name", " ")
    zipped = F.arrays_zip(
        ws.alias("word"),
        F.transform(ws, lambda x: F.length(x)).alias("wlen"),
    )
    return (
        p.where(F.col("p_partkey") < 200)
        .select("p_partkey", F.inline(zipped))
    )


@query(
    "cogroup_pandas_enrich",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders WHERE o_custkey < 200 GROUP BY o_custkey),
    c AS (
      SELECT c_custkey AS custkey, round(c_acctbal, 2) AS acctbal
      FROM customer WHERE c_custkey < 200)
    SELECT coalesce(o.custkey, c.custkey) AS custkey,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           coalesce(total_price, 0.0) AS total_price,
           coalesce(acctbal, 0.0) AS acctbal
    FROM o FULL OUTER JOIN c ON o.custkey = c.custkey
    ORDER BY custkey
    """,
)
def cogroup_pandas_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the one grouped-Pandas surface the
    other UDF queries don't cover: orders and customers cogrouped on
    custkey, each key's two frames handed to one Python function
    (Hive's reduce-side custom-join-script analog). Arrow-batched;
    per-key state only, so executor memory is bounded by the largest
    single key at any corpus size. The full-outer oracle pins the
    union-of-keys semantic (a key present on either side fires the
    function)."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(F.col("o_custkey") < 200).select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = cat.customer.where(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("custkey"), "c_acctbal"
    )

    def enrich(key, orders_pdf, cust_pdf):
        n = len(orders_pdf)
        total = float(orders_pdf["o_totalprice"].sum()) if n else 0.0
        bal = float(cust_pdf["c_acctbal"].iloc[0]) if len(cust_pdf) else 0.0
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [n],
                "total_price": [round(total, 2)],
                "acctbal": [round(bal, 2)],
            }
        )

    return (
        o.groupBy("custkey")
        .cogroup(c.groupBy("custkey"))
        .applyInPandas(
            enrich,
            schema=(
                "custkey long, n_orders long, total_price double, "
                "acctbal double"
            ),
        )
        .orderBy("custkey")
    )
