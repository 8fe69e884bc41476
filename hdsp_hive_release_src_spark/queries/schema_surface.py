"""SURVEY.md §2.2/§2.5 continued — schema-lifecycle surfaces: union
across drifted schemas, parquet mergeSchema evolution at the source,
nested-struct construction/serialization, NULL ordering contracts, and
LIMIT/OFFSET pagination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "schema_evolution_union",
    oracle="""
    SELECT o_orderkey, 'v1' AS src, o_orderstatus,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey < 300
    UNION ALL
    SELECT o_orderkey, 'v2' AS src, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 600
    ORDER BY o_orderkey
    """,
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across schema drift: a v1 extract (no priority column)
    unioned with a v2 extract via unionByName(allowMissingColumns) —
    absent columns surface as NULL instead of a position-based
    mis-alignment (plain UNION would silently pair the wrong columns).
    The daily reality of long-lived pipelines: readers must survive
    additive schema change."""
    o = Catalog(spark, sf_dir).orders
    v1 = o.where(F.col("o_orderkey") < 300).select(
        "o_orderkey", F.lit("v1").alias("src"), "o_orderstatus"
    )
    v2 = o.where(
        (F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600)
    ).select(
        "o_orderkey",
        F.lit("v2").alias("src"),
        "o_orderstatus",
        "o_orderpriority",
    )
    return v1.unionByName(v2, allowMissingColumns=True).orderBy(
        "o_orderkey"
    )


@query(
    "parquet_schema_merge",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           CASE WHEN o_orderkey >= 300 THEN o_orderpriority END
               AS o_orderpriority
    FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey
    """,
)
def parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level schema evolution: two parquet drops with different
    schemas (the newer adds a column) in one directory, read with
    mergeSchema=true — the unified schema NULL-fills the old files.
    This is how additive evolution works without a table format; at
    100 TB, footer merging is why you set the option only on evolving
    paths (it reads every file's footer at planning)."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    o = Catalog(spark, sf_dir).orders
    path = scratch_path("schema_merge_orders", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    (
        o.where(F.col("o_orderkey") < 300)
        .select("o_orderkey", "o_orderstatus")
        .write.parquet(f"{path}/drop=old")
    )
    (
        o.where((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .write.parquet(f"{path}/drop=new")
    )
    spark.catalog.refreshByPath(path)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/drop=old", f"{path}/drop=new"
    )
    return merged.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).orderBy("o_orderkey")


@query(
    "nested_struct_json",
    oracle="""
    SELECT o_orderkey,
           to_json({'status': o_orderstatus,
                    'price': round(o_totalprice, 2),
                    'tags': [o_orderpriority, o_orderstatus]})
               AS doc
    FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey
    """,
)
def nested_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct construction + JSON serialization: named_struct
    with a nested array serialized via to_json — the export shape for
    document sinks (search indexes, feature stores). Both engines emit
    the identical compact JSON encoding, so parity pins field order,
    number formatting, and array nesting. Map-only."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 400)
    doc = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
            F.array("o_orderpriority", "o_orderstatus").alias("tags"),
        )
    )
    return o.select("o_orderkey", doc.alias("doc")).orderBy("o_orderkey")


@query(
    "null_ordering",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderpriority END AS prio,
           row_number() OVER (ORDER BY
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END DESC NULLS LAST,
             o_orderkey) AS rn_nl
    FROM orders WHERE o_orderkey < 300
    ORDER BY rn_nl
    """,
)
def null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL ordering: DESC NULLS LAST (overriding Spark's
    DESC default of NULLS FIRST — exactly the default divergence that
    silently reorders reports when porting between engines). The
    row_number pins the full total order, so any NULL-placement
    disagreement breaks parity."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 300)
    prio = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
        F.col("o_orderpriority")
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        prio.desc_nulls_last(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            prio.alias("prio"),
            F.row_number().over(w).alias("rn_nl"),
        )
        .orderBy("rn_nl")
    )


@query(
    "limit_offset_pagination",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 50
    """,
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (page 3 of a price-ranked report) over a
    deterministic total order — the BI-tool access pattern. At scale
    OFFSET is a full sort of the prefix; keyset pagination (WHERE
    price < last_seen) is the 100 TB alternative, but the surface must
    exist for tool compatibility. Spark 3.4+ supports OFFSET natively."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "page_orders_src"
    )
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM page_orders_src
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25 OFFSET 50
        """
    )
