"""SURVEY.md §2.2 — HiveQL analytics extensions re-expressed Spark-first:
windowed analytics, ROLLUP/CUBE/GROUPING SETS, PIVOT/UNPIVOT, set ops,
DISTINCT aggregates, percentiles, LATERAL VIEW explode, subqueries,
string/date builtin suites.

Parity target: Hive's windowing-and-analytics spec and builtin function
library (reference = Apache Hive release fork, /root/reference/README.md:
1-4). All pure DataFrame/SQL — window exchanges are the only shuffles,
partitioned on the window key, which is exactly the 1000-executor plan.

Determinism: every window ORDER BY carries a unique tiebreaker; rollup/
cube grouping cells are label-encoded via COALESCE(col, 'ALL') rather
than engine-specific grouping_id so the DuckDB oracle is portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


# ---------------------------------------------------------------- windows

@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, round(o_totalprice,2) AS o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority — the canonical top-K-per-group
    window; single shuffle on the partition key."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend (explicit ROWS frame on both
    engines)."""
    o = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between a customer's consecutive orders (lag); NULL first."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row sliding mean of event values per user."""
    ev = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    ).orderBy("user_id", "event_id")


@query(
    "window_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
               AS balance_quartile
    FROM customer
    ORDER BY c_custkey
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing by account balance — distributed exact ntile
    (operators/ranking.py): approx-percentile range split + per-range
    rank + exact offsets, replicating SQL ntile bit-for-bit with NO
    single-partition window (customer grows with SF; a global ORDER BY
    window is a one-task sort at 100 TB). The oracle stays the plain
    ntile(4) window — semantics are identical by construction."""
    from hdsp_hive_release_src_spark.operators.ranking import exact_ntile

    c = Catalog(spark, sf_dir).customer
    return (
        exact_ntile(
            c.select("c_custkey", "c_acctbal"),
            "c_acctbal",
            ["c_custkey"],
            n_buckets=4,
            descending=True,
            bucket_col="balance_quartile",
        )
        .select("c_custkey", "balance_quartile")
        .orderBy("c_custkey")
    )


# --------------------------------------------- grouping sets / rollup / cube

@query(
    "rollup_agg",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with portable COALESCE cell labels."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "cube_agg",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "grouping_sets_agg",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(CAST(year(l_shipdate) AS VARCHAR), 'ALL') AS ship_year,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)))
    ORDER BY returnflag, ship_year
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — by flag and, separately, by ship year."""
    li = Catalog(spark, sf_dir).lineitem
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(CAST(year(l_shipdate) AS STRING), 'ALL') AS ship_year,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)))
        ORDER BY returnflag, ship_year
        """
    )


# ----------------------------------------------------- pivot / unpivot

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "pivot_orders",
    oracle="""
    SELECT o_orderstatus,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
           count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
               AS notspec,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts status × priority. Explicit value list keeps
    the output schema static (required for scale: no driver-side
    distinct scan to discover columns)."""
    o = Catalog(spark, sf_dir).orders
    names = ["urgent", "high", "medium", "notspec", "low"]
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    sel = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(n)
        for p, n in zip(_PRIORITIES, names)
    ]
    return piv.select(*sel).orderBy("o_orderstatus")


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value
    FROM part
    ORDER BY p_partkey, measure
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack() — wide part measures to long form."""
    p = Catalog(spark, sf_dir).part
    return (
        p.select(
            "p_partkey",
            F.expr(
                "stack(2, 'size', CAST(p_size AS DOUBLE), "
                "'retailprice', p_retailprice) AS (measure, value)"
            ),
        )
        .orderBy("p_partkey", "measure")
    )


# --------------------------------------------------- joins & set ops

@query(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers with ≥1 urgent order."""
    cat = Catalog(spark, sf_dir)
    urgent = cat.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cat.customer.join(
            urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no finished orders."""
    cat = Catalog(spark, sf_dir)
    fin = cat.orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        cat.customer.join(
            fin, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "set_ops",
    oracle="""
    SELECT c_custkey FROM (
      (SELECT o_custkey AS c_custkey FROM orders
       WHERE o_orderpriority = '1-URGENT'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ) ORDER BY c_custkey
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT chain over order-customer sets."""
    o = Catalog(spark, sf_dir).orders
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    open_ = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    pend = o.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return urgent.intersect(open_).exceptAll(pend.distinct()).orderBy(
        "c_custkey"
    )


# ------------------------------------------------ aggregate varieties

@query(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (expand-based plan)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile ≡ DuckDB
    quantile_cont). At 100 TB swap to percentile_approx — see
    approx_distinct for the sketch-based pattern."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias(
                "p99"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_8pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for
    distinct counts — mergeable sketch, no expand.

    The HLL estimate itself is impl-defined, so the deterministic output
    is the EXACT count plus a Spark-computed boolean asserting the sketch
    landed within 8% of it (4× the rsd=0.02 — a 5% band is only ~2.5σ
    and could flip the whole row to FAIL on an unlucky dataset); the
    oracle computes the exact count and a literal TRUE — full hash-match
    without pinning HLL internals."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.08 * F.col("exact_parts")
            ).alias("approx_within_8pct"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------- lateral / explode

@query(
    "lateral_explode_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive LATERAL VIEW explode ≡ explode(split()) — token frequency
    over the corpus. Generator runs inside codegen; no Python."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@query(
    "histogram_bins",
    oracle="""
    SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bin,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS bin_revenue
    FROM lineitem GROUP BY bin ORDER BY bin
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width-bucket style binning)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 5).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("bin_revenue"),
        )
        .orderBy("bin")
    )


@query(
    "conditional_agg",
    oracle="""
    SELECT n_name,
           count(CASE WHEN c_acctbal > 0 THEN 1 END) AS n_positive,
           count(CASE WHEN c_acctbal <= 0 THEN 1 END) AS n_nonpositive,
           round(avg(CASE WHEN c_acctbal > 0 THEN c_acctbal END), 4)
               AS avg_positive_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN inside aggregates (filtered aggregation)."""
    cat = Catalog(spark, sf_dir)
    pos = F.when(F.col("c_acctbal") > 0, 1)
    neg = F.when(F.col("c_acctbal") <= 0, 1)
    return (
        cat.customer.join(
            B(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.count(pos).alias("n_positive"),
            F.count(neg).alias("n_nonpositive"),
            F.round(
                F.avg(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))), 4
            ).alias("avg_positive_bal"),
        )
        .orderBy("n_name")
    )


# ------------------------------------------------------- subqueries / CTE

@query(
    "cte_top_nation_revenue",
    oracle="""
    WITH cust_rev AS (
      SELECT o_custkey, sum(o_totalprice) AS rev FROM orders
      GROUP BY o_custkey
    ), nation_rev AS (
      SELECT c_nationkey, sum(rev) AS nation_rev, count(*) AS n_cust
      FROM cust_rev JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    )
    SELECT n_name, round(nation_rev, 2) AS nation_rev, n_cust
    FROM nation_rev JOIN nation ON c_nationkey = n_nationkey
    ORDER BY nation_rev DESC, n_name
    LIMIT 5
    """,
)
def cte_top_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE pipeline: customer revenue → nation revenue → top 5."""
    cat = Catalog(spark, sf_dir)
    cust_rev = cat.orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    nation_rev = (
        cust_rev.join(
            B(cat.customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_nationkey")
        .agg(F.sum("rev").alias("nation_rev"), F.count(F.lit(1)).alias("n_cust"))
    )
    return (
        nation_rev.join(
            B(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select(
            "n_name", F.round("nation_rev", 2).alias("nation_rev"), "n_cust"
        )
        .orderBy(F.desc("nation_rev"), "n_name")
        .limit(5)
    )


@query(
    "correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity > 45)
    ORDER BY s_suppkey
    """,
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via SQL (Catalyst rewrites to a semi join)."""
    cat = Catalog(spark, sf_dir)
    cat.supplier.createOrReplaceTempView("ce_supplier")
    cat.lineitem.createOrReplaceTempView("ce_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM ce_supplier
        WHERE EXISTS (SELECT 1 FROM ce_lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        ORDER BY s_suppkey
        """
    )


@query(
    "scalar_subquery_filter",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a scalar subquery (broadcast single-row join)."""
    o = Catalog(spark, sf_dir).orders
    avg_p = o.agg(F.avg("o_totalprice").alias("avg_p"))
    return (
        o.join(B(avg_p))
        .where(F.col("o_totalprice") > 1.5 * F.col("avg_p"))
        .select(
            "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


# ------------------------------------------------- builtin function suites

@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS upper_name,
           substring(c_name, 1, 8) AS prefix,
           CAST(length(c_name) AS BIGINT) AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           trim(lower(c_mktsegment)) AS seg_lower
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive string builtin suite: upper/substring/length/regexp_extract/
    concat/trim/lower — all JVM-side codegen expressions."""
    c = Catalog(spark, sf_dir).customer
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("upper_name"),
            F.substring("c_name", 1, 8).alias("prefix"),
            F.length("c_name").cast("long").alias("name_len"),
            F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
            F.concat_ws(
                "", F.col("c_mktsegment"), F.lit(":"),
                F.col("c_nationkey").cast("string"),
            ).alias("seg_nat"),
            F.trim(F.lower("c_mktsegment")).alias("seg_lower"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')
                AS BIGINT) AS days_to_y2k
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive date builtin suite: year/month/day/date_trunc/datediff."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(
                F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")
            )
            .cast("long")
            .alias("days_to_y2k"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )
