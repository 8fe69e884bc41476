"""SURVEY.md §2 round-9 twenty-sixth wave (queued for the r10 window)
— data-layout clustering for file skipping:

- ``morton_zorder_clustering`` — the Z-ORDER (Morton) interleaved
  sort key Delta/Iceberg OPTIMIZE ZORDER builds its multi-column
  file clustering on: two 10-bit dimensions bit-interleaved into a
  20-bit key by pure div/mod arithmetic (the identical expression
  runs on both engines), rows bucketed into 64 z-blocks, and each
  block's per-dimension min/max span emitted — the bounded span
  product per block IS the data-skipping property (a lexicographic
  sort bounds only the leading dimension; z-order bounds both, so
  min/max file stats prune on either predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: dimension width (bits) and the z-block shift: 2*10-bit keys in 64
#: blocks of 16384 z-values each.
Z_BITS = 10
Z_BLOCK_SHIFT = 14


def _interleave_sql(a: str, b: str) -> str:
    """Portable Morton interleave: bit i of ``a`` lands at 2i, bit i
    of ``b`` at 2i+1 — pure div/mod/multiply, identical text on
    Spark and DuckDB."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({a} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({b} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_ORACLE = f"""
WITH pts AS (
  SELECT DISTINCT l_partkey % {1 << Z_BITS} AS pk,
         l_suppkey % {1 << Z_BITS} AS sk
  FROM lineitem),
z AS (
  SELECT pk, sk,
         CAST(({_interleave_sql("pk", "sk")}) // {1 << Z_BLOCK_SHIFT}
              AS BIGINT) AS zblock
  FROM pts)
SELECT zblock, CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(pk) AS BIGINT) AS pk_min,
       CAST(max(pk) AS BIGINT) AS pk_max,
       CAST(min(sk) AS BIGINT) AS sk_min,
       CAST(max(sk) AS BIGINT) AS sk_max,
       CAST((max(pk) - min(pk) + 1) * (max(sk) - min(sk) + 1)
            AS BIGINT) AS span_product
FROM z GROUP BY zblock ORDER BY zblock
"""


@query("morton_zorder_clustering", oracle=_Z_ORACLE)
def morton_zorder_clustering(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Z-order (Morton) clustering blocks over the (partkey, suppkey)
    plane — the layout technique behind OPTIMIZE ZORDER file
    clustering: interleave the two {Z_BITS}-bit dimensions into one
    sort key with pure integer arithmetic (the generated expression
    is textually identical in both engines — no engine bit
    intrinsics), cut the key space into 64 z-blocks, and report each
    block's per-dimension min/max span. The span_product column is
    the point: a z-block bounds BOTH dimensions (≈ key-space /
    blocks in area), so per-file min/max statistics prune scans on
    either predicate — a lexicographic sort gives the same guarantee
    only for the leading column. Map-side arithmetic + one bounded
    64-group aggregation; at 100 TB the same key feeds a
    repartitionByRange write."""
    li = Catalog(spark, sf_dir).lineitem
    pts = li.select(
        (F.col("l_partkey") % (1 << Z_BITS)).alias("pk"),
        (F.col("l_suppkey") % (1 << Z_BITS)).alias("sk"),
    ).distinct()
    # Spark div is `div`; the shared expression uses // — translate
    spark_expr = _interleave_sql("pk", "sk").replace("//", "div")
    z = pts.select(
        "pk",
        "sk",
        F.expr(
            f"cast(({spark_expr}) div {1 << Z_BLOCK_SHIFT} as bigint)"
        ).alias("zblock"),
    )
    return (
        z.groupBy("zblock")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("pk").cast("long").alias("pk_min"),
            F.max("pk").cast("long").alias("pk_max"),
            F.min("sk").cast("long").alias("sk_min"),
            F.max("sk").cast("long").alias("sk_max"),
        )
        .select(
            "zblock",
            "n_points",
            "pk_min",
            "pk_max",
            "sk_min",
            "sk_max",
            (
                (F.col("pk_max") - F.col("pk_min") + 1)
                * (F.col("sk_max") - F.col("sk_min") + 1)
            )
            .cast("long")
            .alias("span_product"),
        )
        .orderBy("zblock")
    )
