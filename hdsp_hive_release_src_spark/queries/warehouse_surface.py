"""SURVEY.md §2.2 continued — warehouse-engineering surfaces: recursive
CTE traversal (Spark 4 WITH RECURSIVE), LATERAL correlated subqueries,
bucketed co-located joins (the shuffle-free fact-fact join), an SCD
Type-2 dimension build, and grouping_id over GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table


@query(
    "recursive_cte_hierarchy",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT s_suppkey, s_suppkey AS root, 0 AS depth
      FROM supplier WHERE s_suppkey < 10
      UNION ALL
      SELECT s.s_suppkey, c.root, c.depth + 1
      FROM supplier s JOIN chain c ON s.s_suppkey // 10 = c.s_suppkey
      WHERE s.s_suppkey >= 10)
    SELECT CAST(root AS BIGINT) AS root,
           CAST(depth AS INTEGER) AS depth,
           count(*) AS n, CAST(sum(s_suppkey) AS BIGINT) AS key_sum
    FROM chain GROUP BY root, depth ORDER BY root, depth
    """,
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4): suppliers form an implicit decimal
    hierarchy (parent = suppkey // 10); the recursive CTE walks from
    the single-digit roots down, labeling every supplier with its root
    and depth — org-chart / BOM traversal, the one query shape plain
    SQL can't express without a fixed unroll. Identical SQL runs on
    both engines. Each recursion level is one self-join on the (tiny)
    frontier — depth bounds the iteration, not corpus size."""
    Catalog(spark, sf_dir).supplier.createOrReplaceTempView(
        "rec_supplier_src"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT s_suppkey, s_suppkey AS root, 0 AS depth
          FROM rec_supplier_src WHERE s_suppkey < 10
          UNION ALL
          SELECT s.s_suppkey, c.root, c.depth + 1
          FROM rec_supplier_src s
          JOIN chain c ON CAST(s.s_suppkey / 10 AS BIGINT) = c.s_suppkey
          WHERE s.s_suppkey >= 10)
        SELECT root, depth, count(*) AS n,
               sum(s_suppkey) AS key_sum
        FROM chain GROUP BY root, depth ORDER BY root, depth
        """
    )


@query(
    "lateral_topk_join",
    oracle="""
    SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    ORDER BY n.n_name, acctbal DESC, t.c_custkey
    """,
)
def lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery in FROM — "top-2 customers per
    nation" phrased as a per-row subquery, the modern SQL alternative
    to the window-filter idiom (window_topk_per_group). Catalyst
    decorrelates it into a join + ranked window, so the executed plan
    is the scalable one even though the SQL reads row-at-a-time."""
    cat = Catalog(spark, sf_dir)
    cat.nation.createOrReplaceTempView("lat_nation_src")
    cat.customer.createOrReplaceTempView("lat_customer_src")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
        FROM lat_nation_src n, LATERAL (
          SELECT c_custkey, c_acctbal FROM lat_customer_src
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, acctbal DESC, t.c_custkey
        """
    )


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey < 5000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: both sides written
    bucketBy(8, orderkey) sortBy(orderkey) into catalog tables, then
    joined on the bucket key — Spark aligns the buckets and the join
    runs with NO shuffle exchange on either side (asserted in
    tests/test_scale_patterns.py). THE pre-partitioning pattern for a
    fact table joined on the same key every day at 100 TB: pay the
    bucketed write once, skip the dominant shuffle on every read.
    Values must equal the plain join (oracle)."""
    cat = Catalog(spark, sf_dir)
    for tbl in ("bk_lineitem", "bk_orders"):
        fresh_managed_table(spark, tbl)
    (
        cat.lineitem.where(F.col("l_orderkey") < 5000)
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bk_lineitem")
    )
    (
        cat.orders.where(F.col("o_orderkey") < 5000)
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bk_orders")
    )
    li = spark.table("bk_lineitem")
    o = spark.table("bk_orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "scd2_dimension",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderpriority,
             CAST(o_orderdate AS TIMESTAMP) AS od,
             o_orderkey
      FROM orders WHERE o_custkey < 100),
    changes AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_prio
      FROM h WINDOW w AS (PARTITION BY o_custkey
                          ORDER BY od, o_orderkey)),
    versions AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey
      FROM changes
      WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority)
    SELECT o_custkey,
           o_orderpriority AS attr,
           od AS valid_from,
           coalesce(lead(od) OVER (PARTITION BY o_custkey
                                   ORDER BY od, o_orderkey),
                    TIMESTAMP '2200-01-01') AS valid_to,
           (lead(od) OVER (PARTITION BY o_custkey
                           ORDER BY od, o_orderkey) IS NULL)
               AS is_current
    FROM versions ORDER BY o_custkey, valid_from
    """,
)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: a customer's order-priority history
    is collapsed into versioned [valid_from, valid_to) rows — new
    version only when the attribute CHANGES, open-ended current row,
    the classic warehouse change-tracking shape. Two window passes per
    key partition (change detection, then interval close-off); at
    100 TB both windows share the custkey partitioning so the dimension
    builds with a single shuffle.

    Open-interval sentinel is 2200-01-01, NOT the traditional
    9999-12-31: pandas nanosecond timestamps max out at 2262-04-11, so
    the far-future sentinel is unrepresentable in any pandas-based
    consumer (it killed the r4 driver row before comparison). Interval
    semantics are identical — `is_current` is the authoritative
    open-row marker either way."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("od"), F.col("o_orderkey")
    )
    h = o.select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("timestamp").alias("od"),
        "o_orderkey",
    )
    changes = h.withColumn(
        "prev_prio", F.lag("o_orderpriority").over(w)
    ).where(
        F.col("prev_prio").isNull()
        | (F.col("prev_prio") != F.col("o_orderpriority"))
    )
    lead_od = F.lead("od").over(w)
    return (
        changes.select(
            "o_custkey",
            F.col("o_orderpriority").alias("attr"),
            F.col("od").alias("valid_from"),
            F.coalesce(
                lead_od, F.lit("2200-01-01").cast("timestamp")
            ).alias("valid_to"),
            lead_od.isNull().alias("is_current"),
        )
        .orderBy("o_custkey", "valid_from")
    )


@query(
    "grouping_id_agg",
    oracle="""
    SELECT CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT)
               AS gid,
           coalesce(o_orderpriority, 'ALL') AS prio,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    ORDER BY gid, prio, status
    """,
)
def grouping_id_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() over GROUPING SETS — the bitmask that
    disambiguates "NULL because superaggregate" from "NULL in the
    data", which every cube-consuming BI layer keys on. Identical SQL
    both engines."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "gid_orders_src"
    )
    return spark.sql(
        """
        SELECT CAST(grouping_id(o_orderpriority, o_orderstatus)
                    AS BIGINT) AS gid,
               coalesce(o_orderpriority, 'ALL') AS prio,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n
        FROM gid_orders_src
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        ORDER BY gid, prio, status
        """
    )


@query(
    "dynamic_partition_pruning",
    oracle="""
    SELECT l.l_linestatus, count(*) AS n,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY l.l_linestatus ORDER BY l.l_linestatus
    """,
)
def dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition pruning: the fact side is PARTITIONED on the
    order's priority attribute, and the dim filter sits on a
    DIFFERENT column (o_totalprice > 450000) — which priorities
    survive is only knowable at run time, so no static partition
    predicate can be derived (a filter ON the partition column itself
    gets constant-propagated into a static PartitionFilter — the
    easier case). DPP injects the dim's surviving priority keys as a
    runtime subquery into the fact scan's partition pruning. THE
    optimization for star joins over date-partitioned 100 TB facts
    (without it, every dim-filtered join is a full fact scan). The
    dynamicpruning expression's presence in the plan is asserted in
    tests; the oracle checks values against the unpartitioned
    join."""
    cat = Catalog(spark, sf_dir)
    from hdsp_hive_release_src_spark.sources.io import scratch_path
    import shutil

    path = scratch_path("dpp_lineitem", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    # stamp each lineitem with its order's priority and partition on it
    li = cat.lineitem.join(
        cat.orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_orderpriority").alias("prio"),
        ),
        "l_orderkey",
    ).select("l_orderkey", "l_linestatus", "l_extendedprice", "prio")
    li.write.partitionBy("prio").parquet(path)
    spark.catalog.refreshByPath(path)
    fact = spark.read.parquet(path)
    dim = cat.orders.select(
        "o_orderkey", "o_orderpriority"
    ).where(F.col("o_totalprice") > 450000)
    joined = fact.join(
        dim,
        (fact.l_orderkey == dim.o_orderkey)
        & (fact.prio == dim.o_orderpriority),
    )
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("l_linestatus")
    )
