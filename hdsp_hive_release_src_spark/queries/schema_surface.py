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
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table


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


@query(
    "alter_table_evolution",
    oracle="""
    WITH c1 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey < 1000),
    c2 AS (SELECT count(*) AS n FROM orders
           WHERE o_orderkey >= 1000 AND o_orderkey < 2000)
    SELECT CAST(c1.n AS BIGINT) AS rows_before_alter,
           CAST(c2.n AS BIGINT) AS rows_after_alter,
           CAST(c1.n AS BIGINT) AS note_null_rows,
           CAST(c2.n AS BIGINT) AS note_v2_rows
    FROM c1, c2
    """,
)
def alter_table_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-place DDL schema evolution: CREATE TABLE, load, ALTER TABLE
    ADD COLUMNS, load more with the new column populated — old rows
    read back with NULL in the added column, new rows carry values,
    one consolidated scan serves both generations (the managed-table
    half of schema evolution; parquet_schema_merge covers the
    file-level half). At 100 TB ALTER ADD COLUMNS is metadata-only —
    no rewrite of existing files — which is exactly why the old rows
    MUST read as NULL."""

    o = Catalog(spark, sf_dir).orders
    fresh_managed_table(spark, "evo_orders")
    o.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey", "o_totalprice"
    ).write.saveAsTable("evo_orders")
    spark.sql("ALTER TABLE evo_orders ADD COLUMNS (note STRING)")
    o.where(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
    ).select(
        "o_orderkey", "o_totalprice", F.lit("v2").alias("note")
    ).write.insertInto("evo_orders")
    t = spark.table("evo_orders")
    return spark.createDataFrame(
        [
            (
                t.where(F.col("o_orderkey") < 1000).count(),
                t.where(F.col("o_orderkey") >= 1000).count(),
                t.where(F.col("note").isNull()).count(),
                t.where(F.col("note") == "v2").count(),
            )
        ],
        "rows_before_alter long, rows_after_alter long, "
        "note_null_rows long, note_v2_rows long",
    )


@query(
    "insert_into_overwrite_semantics",
    oracle="""
    WITH c AS (SELECT count(*) AS n FROM orders WHERE o_orderkey < 1500)
    SELECT CAST(2 * n AS BIGINT) AS after_two_inserts,
           CAST(n AS BIGINT) AS after_overwrite,
           CAST(0 AS BIGINT) AS after_truncate
    FROM c
    """,
)
def insert_into_overwrite_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Hive write-semantics triad on one table: INSERT INTO
    appends (two loads double the rows), INSERT OVERWRITE replaces
    the table's contents wholesale, TRUNCATE empties it — the
    difference between them is the single most common source of
    silent data duplication in ported Hive ETL. Counts are captured
    after each stage and checked against exact arithmetic."""

    o = Catalog(spark, sf_dir).orders.where(
        F.col("o_orderkey") < 1500
    ).select("o_orderkey", "o_totalprice")
    fresh_managed_table(spark, "ins_sem_orders")
    o.limit(0).write.saveAsTable("ins_sem_orders")
    o.write.insertInto("ins_sem_orders")          # append 1
    o.write.insertInto("ins_sem_orders")          # append 2
    after_two = spark.table("ins_sem_orders").count()
    o.write.insertInto("ins_sem_orders", overwrite=True)
    after_over = spark.table("ins_sem_orders").count()
    spark.sql("TRUNCATE TABLE ins_sem_orders")
    after_trunc = spark.table("ins_sem_orders").count()
    return spark.createDataFrame(
        [(after_two, after_over, after_trunc)],
        "after_two_inserts long, after_overwrite long, "
        "after_truncate long",
    )


@query(
    "alter_drop_partition",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderkey < 4000 AND o_orderpriority <> '1-URGENT'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def alter_drop_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ... DROP PARTITION — the retention/GDPR primitive
    of every partitioned warehouse: one partition's data and metadata
    removed without touching siblings (the read back proves exactly
    the dropped priority is gone and every other partition is
    intact). At 100 TB dropping a date partition is O(1) metadata +
    file deletes — the reason tables partition by date in the first
    place."""

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 4000)
    fresh_managed_table(spark, "droppart_orders")
    (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .saveAsTable("droppart_orders")
    )
    spark.sql(
        "ALTER TABLE droppart_orders DROP PARTITION "
        "(o_orderpriority='1-URGENT')"
    )
    return (
        spark.table("droppart_orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )
