"""SURVEY.md §2.1 continued — the remaining TPC-H-expressible queries
(Q15/Q17/Q20/Q21 shapes, adapted: no partsupp/commit/receipt columns)
plus a MERGE-INTO/SCD upsert emulation (Hive ACID's MERGE re-expressed
as anti-join + union — the Delta-less idiom).

Broadcast hints are restricted to always-small frames (supplier, 1-row
scalar aggregates): part- and customer-derived frames scale with the
fact tables at 100 TB, so they are left unhinted and AQE selects the
join strategy from post-filter runtime sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue (view + scalar-max
    subquery; the revenue agg is computed once and reused)."""
    cat = Catalog(spark, sf_dir)
    revenue = (
        cat.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    max_rev = revenue.agg(F.max("total_rev").alias("m"))
    return (
        revenue.join(B(max_rev))
        .where(F.col("total_rev") == F.col("m"))
        .join(B(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated avg subquery → pre-aggregated per-part avg
    joined back (one extra shuffle on partkey instead of a per-row
    subquery — the only plan that works at scale)."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    part = cat.part.where(F.col("p_brand") == "Brand#5").select("p_partkey")
    avg_qty = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty.withColumnRenamed("l_partkey", "ap_k"),
              li.l_partkey == F.col("ap_k"))
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@query(
    "q20_promo_shippers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 400)
    ORDER BY s_suppkey
    """,
)
def q20_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant PROMO volume in
    a year (IN-subquery with HAVING → aggregate + semi join)."""
    cat = Catalog(spark, sf_dir)
    promo = cat.part.where(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        cat.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 400)
        .select("l_suppkey")
    )
    return (
        cat.supplier.join(
            heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    sole AS (
      SELECT lt.l_orderkey, lt.l_suppkey
      FROM late lt JOIN multi USING (l_orderkey)
      WHERE NOT EXISTS (
        SELECT 1 FROM late lt2
        WHERE lt2.l_orderkey = lt.l_orderkey
          AND lt2.l_suppkey <> lt.l_suppkey))
    SELECT s_name, count(*) AS numwait
    FROM sole JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >60d after order): suppliers who
    were the ONLY late shipper on multi-supplier orders.

    Single-scan form (r12 scan-count audit; previously two lineitem
    scans — one for the multi-supplier filter, one for the late
    pairs): join lineitem to orders once, dedup to (order, supplier,
    ever_late) pairs with a partial-combining two-level aggregate,
    then derive per order in one pass the distinct-supplier count, the
    distinct-late-supplier count, and the sole late supplier key.
    ns > 1 AND n_late == 1 is exactly the EXISTS / NOT-EXISTS pair.
    Shuffles: lineitem once by (orderkey, suppkey) with map-side
    combine, then the ~4x-smaller pair set by orderkey."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    joined = li.join(
        cat.orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    pairs = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    sole = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("ns"),
            F.sum(F.col("late").cast("int")).alias("n_late"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias(
                "the_suppkey"
            ),
        )
        .where((F.col("ns") > 1) & (F.col("n_late") == 1))
    )
    return (
        sole.join(
            B(cat.supplier), F.col("the_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    flt AS (SELECT p_partkey, p_brand FROM part
            WHERE p_size < 10 AND p_type = 'PROMO'),
    ranked AS (
      SELECT p_partkey, p_brand, l_suppkey, unit_cost,
             row_number() OVER (PARTITION BY l_partkey
                 ORDER BY unit_cost, l_suppkey) AS rn
      FROM cost JOIN flt ON p_partkey = l_partkey)
    SELECT p_partkey, p_brand, unit_cost AS best_cost,
           s_suppkey, s_name
    FROM ranked JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 ORDER BY p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp-less: lineitem is the part↔supplier
    link): cheapest supplier per filtered part by observed unit cost.
    Correlated-min subquery → one agg + one window rank; part filter
    is applied BEFORE the rank so only qualifying parts shuffle.
    best_cost is emitted unrounded: both engines derive the identical
    double (same division, same min), while an explicit round(4) can
    split on representation (x.41175 stored below the .5 boundary
    rounds differently under decimal-string vs scaled-double rounding
    — seen at sf0.1); the comparator's round-to-6 handles parity."""
    cat = Catalog(spark, sf_dir)
    flt = cat.part.where(
        (F.col("p_size") < 10) & (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_brand")
    cost = (
        cat.lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        cost.join(flt, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(B(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("unit_cost").alias("best_cost"),
            "s_suppkey",
            "s_name",
        )
        .orderBy("p_partkey")
    )


@query(
    "q11_important_parts",
    oracle="""
    SELECT l_partkey,
           round(sum(l_extendedprice * l_quantity), 2) AS part_value
    FROM lineitem GROUP BY l_partkey
    HAVING sum(l_extendedprice * l_quantity) >
      (SELECT sum(l_extendedprice * l_quantity) * 0.0006 FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total traded value exceeds a
    fraction (0.06%) of the global total.

    Single-scan form (r12 scan-count audit): the global total is the
    sum of the per-part sums, so one lineitem groupBy serves both the
    threshold and the output. Spark has no plan-level sharing for the
    two consumers (exchange reuse does not fire across the scalar-agg
    branch — measured), so the parts-sized aggregate is eagerly
    localCheckpoint-ed (a REDUCED table — operators/materialize.py
    discipline). At 100 TB this trades the second full lineitem scan
    (~100 TB of IO) for a parts-sized (~SF x 200k rows) local
    materialization.

    r13 advice fix: the threshold is a 1-row broadcast joined back to
    the same checkpoint — no driver collect, the comparison never
    leaves the engine. FP boundary note: the global total is the sum
    of per-part DOUBLE sums, while the oracle sums all products in
    one pass; a part whose value lands exactly ON the 0.06% boundary
    could differ in the last ulp between the two summation orders.
    The strict > against a measure-zero boundary makes this benign at
    every tested scale; at new scales re-gate before trusting the
    boundary row."""
    li = Catalog(spark, sf_dir).lineitem
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum(val).alias("v"))
        .localCheckpoint()
    )
    threshold = per_part.agg(
        (F.sum("v") * 0.0006).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .where(F.col("v") > F.col("threshold"))
        .select("l_partkey", F.round("v", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
      AND l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    with a NOT IN supplier exclusion → broadcast anti join (no null
    keys in this schema, so anti ≡ NOT IN)."""
    cat = Catalog(spark, sf_dir)
    part = cat.part.where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = cat.supplier.where(F.col("s_name").like("%7%")).select(
        "s_suppkey"
    )
    return (
        cat.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            B(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01'),
    source AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
    merged AS (
      SELECT * FROM source
      UNION ALL
      SELECT t.* FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM source s
                        WHERE s.o_orderkey = t.o_orderkey))
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (Hive ACID / Delta-less idiom): source rows
    win, unmatched target rows survive — anti-join + union, one shuffle
    on the merge key. Overlap window ('98–'99) exercises both the
    update and insert arms."""
    o = Catalog(spark, sf_dir).orders
    target = o.where(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    source = o.where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    survivors = target.join(source, "o_orderkey", "left_anti")
    merged = source.unionByName(survivors)
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )
