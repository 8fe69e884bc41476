"""SURVEY.md §2 wave 4b — map higher-order functions and error-safe
(`try_*`) arithmetic, the last Hive/Spark builtin families without a
first-class query.

- map higher-order: transform_values / map_filter over a constructed
  map, exploded back to rows so the (map-less) DuckDB oracle can
  replay the semantics with plain column arithmetic.
- try_* family: ANSI-mode-safe arithmetic — try_divide / try_cast
  return NULL instead of raising, the Hive `hive.strict.checks`-style
  tolerance re-expressed with Spark 3.3+ try functions. The oracle
  emulates with CASE/TRY_CAST.

Scale notes: both are pure per-row projections — no shuffle at all
except the final tiny ordered aggregation; whole-stage codegen keeps
them JVM-side (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "map_higher_order",
    oracle="""
    WITH kv AS (
      SELECT p_partkey, 'price_cents' AS key,
             round(p_retailprice * 100, 2) AS value
      FROM part
      UNION ALL
      SELECT p_partkey, 'size_sq' AS key,
             CAST(p_size AS DOUBLE) * p_size AS value
      FROM part)
    SELECT key, count(*) AS n, round(sum(value), 2) AS total
    FROM kv WHERE value > 1000
    GROUP BY key ORDER BY key
    """,
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order pipeline: create_map → transform_values (scale
    each value by a key-dependent rule) → map_filter (> 1000) →
    explode to rows → aggregate per key. The oracle replays the same
    arithmetic without maps (UNION ALL of the two keys + WHERE)."""
    p = Catalog(spark, sf_dir).part
    m = F.create_map(
        F.lit("price_cents"), F.col("p_retailprice"),
        F.lit("size_sq"), F.col("p_size").cast("double"),
    )
    scaled = F.transform_values(
        m,
        lambda k, v: F.when(
            k == "price_cents", F.round(v * 100, 2)
        ).otherwise(v * F.col("p_size")),
    )
    kept = F.map_filter(scaled, lambda k, v: v > 1000)
    return (
        p.select(F.explode(kept).alias("key", "value"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("key")
    )


@query(
    "try_arithmetic",
    oracle="""
    SELECT
      count(*) AS n_rows,
      count(TRY_CAST(substr(p_brand, 7) AS INTEGER)) AS n_brand_ids,
      CAST(sum(COALESCE(TRY_CAST(substr(p_brand, 7) AS INTEGER), 0))
           AS BIGINT) AS brand_id_sum,
      count(TRY_CAST(p_type AS INTEGER)) AS n_type_numeric,
      round(sum(CASE WHEN p_size = 0 THEN NULL
                     ELSE p_retailprice / p_size END), 2)
          AS price_per_size_sum
    FROM part
    """,
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_cast salvages the numeric tail of
    'Brand#NN' (and proves non-numeric p_type casts to NULL, not an
    error), try_divide yields NULL on zero denominators. The oracle
    emulates try_divide with CASE (DuckDB int division by zero
    raises); TRY_CAST is native on both engines."""
    p = Catalog(spark, sf_dir).part
    brand_id = F.expr("try_cast(substr(p_brand, 7) AS INT)")
    return p.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(brand_id).alias("n_brand_ids"),
        F.sum(F.coalesce(brand_id, F.lit(0)))
        .cast("long").alias("brand_id_sum"),
        F.count(F.expr("try_cast(p_type AS INT)")).alias("n_type_numeric"),
        F.round(
            F.sum(F.try_divide(F.col("p_retailprice"), F.col("p_size"))), 2
        ).alias("price_per_size_sum"),
    )
