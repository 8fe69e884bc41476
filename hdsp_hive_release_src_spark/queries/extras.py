"""SURVEY.md §2 wave 4 — remaining engine-surface corners:

- band (range-predicate) join: equi-key + date-band self join — the
  shape Hive/Spark express as an equi-join with a residual range
  filter, which scales (shuffle on the equi key only; the band
  predicate never widens the shuffle).
- LISTAGG / string_agg with deterministic intra-group order — Hive's
  concat_ws(collect_list) idiom, made order-stable via array_sort.
- gaps-and-islands streak detection — the row_number date-offset
  trick, a classic Hive/SQL interview-grade window pattern.
- salted skew join exposed as a first-class query: result parity with
  the plain join is the whole point (the oracle IS the plain join).

Scale notes: band join shuffles both sides once on the equi key —
candidate pairs are bounded per key, never a cross join; listagg is a
single shuffle with mergeable collect_list (cluster caveat: per-group
string must fit an executor — bounded here by the acctbal filter);
streaks reduce events to distinct (user, day) before any window;
salted join spreads each hot key over 8 sub-keys so no single reducer
owns a hot key's whole payload (operators/skew.py, property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.skew import salted_join
from hdsp_hive_release_src_spark.registry import query


@query(
    "band_join_order_pairs",
    oracle="""
    SELECT a.o_custkey AS custkey, count(*) AS n_pairs
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= 30
    GROUP BY a.o_custkey
    ORDER BY custkey
    """,
)
def band_join_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed by the same customer within 30 days of each other:
    equi-join on custkey + date-band residual filter (k1 < k2 dedups
    the pair). Catalyst plans this as a plain shuffled equi-join with
    the band as a post-join filter — no cartesian product."""
    o = Catalog(spark, sf_dir).orders
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    return (
        a.join(b, "custkey")
        .where(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.datediff("d2", "d1")) <= 30)
        )
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("custkey")
    )


@query(
    "listagg_sorted",
    oracle="""
    SELECT n.n_name,
           string_agg(c.c_name, ',' ORDER BY c.c_name) AS names,
           count(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 7500
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg with deterministic order: collect_list is
    order-unstable under distributed merge, so sort the array before
    concat_ws — the Hive-idiomatic stable form. Nation side broadcast."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.where(F.col("c_acctbal") > 7500)
        .join(F.broadcast(cat.nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("c_name")))
            .alias("names"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


@query(
    "streak_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
      FROM events),
    r AS (
      SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
    g AS (
      SELECT user_id, day - CAST(rn AS INTEGER) AS grp,
             count(*) AS streak_len
      FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
    SELECT user_id,
           max(streak_len) AS max_streak,
           count(*) AS n_streaks,
           CAST(sum(streak_len) AS BIGINT) AS active_days
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the date-minus-row_number grouping trick. Events reduce to distinct
    (user, day) FIRST, so the window input is tiny regardless of raw
    event volume — the 100 TB-safe ordering of the two shuffles."""
    ev = Catalog(spark, sf_dir).events
    d = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn("rn", F.row_number().over(w))
    g = (
        r.groupBy("user_id", F.date_sub("day", F.col("rn")).alias("grp"))
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("max_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("streak_len").alias("active_days"),
        )
        .orderBy("user_id")
    )


@query(
    "skew_salted_join_agg",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-fact join as a first-class query: the salted
    join (operators/skew.py — left keys spread over 8 salts, right side
    replicated 8x) must produce EXACTLY the plain join's result, so the
    oracle is the plain join. On a cluster this is the manual fallback
    when AQE skew-split can't help (e.g. a single hot key inside one
    partition-sized unit)."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = cat.orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    j = salted_join(li, o, key="l_orderkey", n_salts=8)
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )
