"""SURVEY.md §2.2 continued — analytics wave 2: numeric RANGE window
frames, ratio-to-report contribution, equi-depth histograms, and
sequence-gap detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "range_frame_numeric",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS price,
           CAST(count(*) OVER w AS BIGINT) AS n_near,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
                AS BIGINT) AS near_cents
    FROM orders WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
    ORDER BY o_orderkey
    """,
)
def range_frame_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame (±10000 of the current VALUE, not ±N rows) —
    the price-band peer-group window the ROWS-frame queries can't
    express: each order is compared against all orders of similar
    price within its priority class. Value-range frames need no
    tiebreak to stay deterministic (peers are defined by value
    equality) — the property that distinguishes RANGE from ROWS. The
    in-frame money total rides as integer cents: a windowed double
    avg rounds differently across engines' summation orders."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_near"),
        F.sum(cents).over(w).cast("long").alias("near_cents"),
    ).orderBy("o_orderkey")


@query(
    "ratio_to_report",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment)
    SELECT c_mktsegment, revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share,
           round(revenue / max(revenue) OVER (), 6) AS vs_best
    FROM seg ORDER BY c_mktsegment
    """,
)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report — THE reporting idiom (segment share of total,
    index vs the best segment) via an empty-frame window over the
    AGGREGATED result: the whole-table window runs on 5 rows, never
    the fact table, which is the only scale-sane place for a global
    window."""
    cat = Catalog(spark, sf_dir)
    seg = (
        cat.orders.join(
            cat.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "share"
        ),
        F.round(F.col("revenue") / F.max("revenue").over(w), 6).alias(
            "vs_best"
        ),
    ).orderBy("c_mktsegment")


@query(
    "histogram_equi_depth",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                 AS bucket
      FROM orders)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (ntile deciles: equal row counts, derived
    boundaries) — the stats histogram optimizers keep, vs
    histogram_bins' equi-WIDTH buckets. The orderkey tiebreak pins
    which duplicate price lands in which bucket so both engines cut
    identically. Deciles come from the distributed exact-ntile
    operator (approx-percentile range split + per-range rank + exact
    offsets — operators/ranking.py), NOT a global ORDER BY window:
    orders is a fact table, and a no-partition ntile is a one-task
    sort of the whole table at 100 TB. The oracle keeps the plain
    ntile(10) window — identical semantics by construction."""
    from hdsp_hive_release_src_spark.operators.ranking import exact_ntile

    o = Catalog(spark, sf_dir).orders
    # the 10-row rollup runs as exact_ntile's finalize so the operator
    # can release its fact-row DISK_ONLY input cache before returning
    # (kmeans-style hygiene, r14) at the pinned 1 executed orders scan
    return exact_ntile(
        o.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        ["o_orderkey"],
        n_buckets=10,
        finalize=lambda b: (
            b.select(
                "o_totalprice",
                F.col("bucket").cast("int").alias("bucket"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.min("o_totalprice"), 2).alias("lo"),
                F.round(F.max("o_totalprice"), 2).alias("hi"),
            )
            .orderBy("bucket")
        ),
    )


@query(
    "sequence_gap_detection",
    oracle="""
    WITH ids AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderkey < 3000 AND o_orderkey % 97 <> 0),
    gaps AS (
      SELECT k, lead(k) OVER (ORDER BY k) AS next_k FROM ids)
    SELECT k AS gap_after,
           CAST(next_k - k - 1 AS BIGINT) AS missing
    FROM gaps WHERE next_k - k > 1
    ORDER BY gap_after
    """,
)
def sequence_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection: holes in a supposedly-contiguous id
    space (the load-completeness audit — a gap means a batch was
    dropped). lead() over the ordered distinct ids emits one row per
    gap with its width; a single global window over the DISTINCT key
    set (small), never the fact rows. Known holes are punched (every
    97th key dropped) so the detector provably FIRES — a gap query
    that returns zero rows proves nothing."""
    o = Catalog(spark, sf_dir).orders.where(
        (F.col("o_orderkey") < 3000) & (F.col("o_orderkey") % 97 != 0)
    )
    ids = o.select(F.col("o_orderkey").alias("k")).distinct()
    w = Window.orderBy("k")
    gaps = ids.select("k", F.lead("k").over(w).alias("next_k"))
    return (
        gaps.where(F.col("next_k") - F.col("k") > 1)
        .select(
            F.col("k").alias("gap_after"),
            (F.col("next_k") - F.col("k") - 1)
            .cast("long")
            .alias("missing"),
        )
        .orderBy("gap_after")
    )


@query(
    "order_fulfillment_lag",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority,
             CAST(CAST(l.l_shipdate AS DATE)
                  - CAST(o.o_orderdate AS DATE) AS BIGINT) AS lag_days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority,
           count(*) AS n_lines,
           CAST(min(lag_days) AS BIGINT) AS min_lag,
           round(quantile_cont(CAST(lag_days AS DOUBLE), 0.5), 2)
               AS median_lag,
           round(quantile_cont(CAST(lag_days AS DOUBLE), 0.95), 2)
               AS p95_lag,
           CAST(max(lag_days) AS BIGINT) AS max_lag
    FROM lag GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority class — the SLA
    report every fulfillment warehouse runs (does URGENT actually
    ship faster?): exact median/p95 of (shipdate − orderdate) days.
    One fact-fact join on orderkey, then per-priority exact
    percentiles (bounded groups — 5 priorities — so the per-group
    sort is safe at any SF; unbounded keys would take
    percentile_approx)."""
    cat = Catalog(spark, sf_dir)
    lag = (
        cat.orders.join(
            cat.lineitem,
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).cast("long").alias("lag_days"),
        )
    )
    lag.createOrReplaceTempView("fulfillment_lag_src")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(min(lag_days) AS BIGINT) AS min_lag,
               round(percentile_cont(0.5) WITHIN GROUP
                     (ORDER BY CAST(lag_days AS DOUBLE)), 2)
                   AS median_lag,
               round(percentile_cont(0.95) WITHIN GROUP
                     (ORDER BY CAST(lag_days AS DOUBLE)), 2)
                   AS p95_lag,
               CAST(max(lag_days) AS BIGINT) AS max_lag
        FROM fulfillment_lag_src
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
    WITH share AS (
      SELECT p.p_type, l.l_suppkey,
             sum(l.l_extendedprice) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, l.l_suppkey),
    tot AS (SELECT p_type, sum(rev) AS t FROM share GROUP BY p_type)
    SELECT share.p_type,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum((rev / t) * (rev / t)), 6) AS hhi
    FROM share JOIN tot ON share.p_type = tot.p_type
    GROUP BY share.p_type ORDER BY share.p_type
    """,
)
def supplier_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier-concentration Herfindahl–Hirschman index per part
    type: Σ (supplier revenue share)² — the supply-chain-risk metric
    (1/n for perfectly spread, →1 for a sole supplier; antitrust
    review uses the same statistic ×10,000). Two aggregations: the
    (type, supplier) revenue cells, then per-type totals broadcast
    back for the share squaring — the fact table shuffles once on
    the composite key."""
    cat = Catalog(spark, sf_dir)
    share = (
        cat.lineitem.join(
            cat.part, F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    # r13 subtree-sweep fix: the per-type total was a second aggregate
    # joined back, re-running the lineitem x part join. A
    # type-partitioned window computes it in the same pass.
    s = F.col("rev") / F.col("t")
    return (
        share.withColumn(
            "t", F.sum("rev").over(Window.partitionBy("p_type"))
        )
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(s * s), 6).alias("hhi"),
        )
        .orderBy("p_type")
    )
