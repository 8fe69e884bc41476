"""SURVEY.md §2.2 continued — engine-operations surfaces: the literal
HiveQL ``SELECT TRANSFORM ... USING 'cmd'`` external-process stage,
Dataset.observe load instrumentation, ANALYZE TABLE statistics (what
the cost-based optimizer reads), and the CACHE TABLE surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table


@query(
    "transform_using_script",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 3000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def transform_using_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal HiveQL external-process stage: SELECT TRANSFORM
    pipes rows through 'cat' as tab-separated text and reparses them —
    proving the script-serde round trip (the aggregation downstream
    breaks if any row is lost or mangled). This is the syntax-level
    twin of script_transform (which shows the mapInPandas replacement);
    real deployments should prefer the Arrow path — an OS pipe
    per-partition plus text serde is the slowest possible stage — but
    the surface must exist for Hive script jobs to port verbatim."""
    Catalog(spark, sf_dir).orders.where(
        F.col("o_orderkey") < 3000
    ).createOrReplaceTempView("xform_orders_src")
    return spark.sql(
        """
        WITH piped AS (
          SELECT TRANSFORM(o_orderkey, o_orderpriority)
          USING 'cat' AS (k STRING, prio STRING)
          FROM xform_orders_src)
        SELECT prio AS o_orderpriority, count(*) AS n,
               sum(CAST(k AS BIGINT)) AS key_sum
        FROM piped GROUP BY prio ORDER BY prio
        """
    )


@query(
    "observed_load_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(o_totalprice), 2) AS total_price,
           CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big
    FROM orders
    """,
)
def observed_load_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset.observe — zero-extra-pass load instrumentation: metric
    expressions ride along the load job itself (an accumulator per
    metric, no second scan) and surface when the action finishes; the
    pattern every production load uses to publish row counts and
    checksums without re-reading 100 TB. The observed values are
    returned AS the result row, so the oracle proves the piggybacked
    metrics equal a direct aggregation."""
    from pyspark.sql import Observation

    o = Catalog(spark, sf_dir).orders
    obs = Observation("load_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.count_if(F.col("o_totalprice") > 300000).alias("n_big"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the "load"
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_price"], m["n_big"])],
        "n_rows long, total_price double, n_big long",
    )


@query(
    "analyze_table_stats",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS stats_rows,
           CAST(count(*) AS BIGINT) AS exact_rows
    FROM lineitem
    """,
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE COMPUTE STATISTICS — the stats the cost-based
    optimizer's join reordering and broadcast decisions read. The
    catalog's recorded rowCount must equal the exact count (the oracle
    runs the count directly); at 100 TB you ANALYZE incrementally per
    partition, and stale stats are how plans go wrong — this check is
    the freshness audit."""

    li = Catalog(spark, sf_dir).lineitem
    fresh_managed_table(spark, "stats_lineitem")
    li.select("l_orderkey", "l_quantity").write.saveAsTable(
        "stats_lineitem"
    )
    spark.sql("ANALYZE TABLE stats_lineitem COMPUTE STATISTICS")
    import re

    stats = (
        spark.sql("DESCRIBE EXTENDED stats_lineitem")
        .where(F.col("col_name") == "Statistics")
        .select("data_type")
        .collect()
    )
    n_stats = int(re.search(r"(\d+) rows", stats[0][0]).group(1))
    exact = spark.table("stats_lineitem").count()
    return spark.createDataFrame(
        [(n_stats, exact)], "stats_rows long, exact_rows long"
    )


@query(
    "analyze_column_stats",
    oracle="""
    SELECT 'o_orderpriority' AS col_name,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv,
           CAST(sum(CASE WHEN o_orderpriority IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(NULL AS DOUBLE) AS min_val,
           CAST(NULL AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(NULL AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT),
           round(min(o_totalprice), 2),
           round(max(o_totalprice), 2)
    FROM orders
    ORDER BY col_name
    """,
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS — the
    column-level NDV/null-count/min/max the cost-based optimizer's
    join reordering actually keys on (table-level rowCount alone —
    analyze_table_stats — can't order a join tree). Stats are read
    back through DESCRIBE EXTENDED <table> <col> and compared against
    exact aggregation: NDV uses HLL++, which is exact in its sparse
    regime (ndv=5 here), and min/max/null-count are exact at any
    scale, so the oracle parity is deterministic. At 100 TB: ANALYZE
    is one full scan with mergeable sketches per column — run it
    incrementally per partition and only for the columns the
    workload's join/filter keys need."""

    o = Catalog(spark, sf_dir).orders
    fresh_managed_table(spark, "colstats_orders")
    o.select("o_orderpriority", "o_totalprice").write.saveAsTable(
        "colstats_orders"
    )
    spark.sql(
        "ANALYZE TABLE colstats_orders COMPUTE STATISTICS "
        "FOR COLUMNS o_orderpriority, o_totalprice"
    )

    def col_stats(col: str) -> dict[str, str]:
        rows = spark.sql(
            f"DESCRIBE EXTENDED colstats_orders {col}"
        ).collect()
        return {r.info_name: r.info_value for r in rows}

    prio = col_stats("o_orderpriority")
    price = col_stats("o_totalprice")
    out = [
        (
            "o_orderpriority",
            int(prio["distinct_count"]),
            int(prio["num_nulls"]),
            None,
            None,
        ),
        (
            "o_totalprice",
            None,
            int(price["num_nulls"]),
            round(float(price["min"]), 2),
            round(float(price["max"]), 2),
        ),
    ]
    return spark.createDataFrame(
        out,
        "col_name string, ndv long, n_nulls long, "
        "min_val double, max_val double",
    ).orderBy("col_name")


@query(
    "cache_table_reuse",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def cache_table_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CACHE TABLE — the SQL-surface materialization Hive users reach
    for between reuse-heavy stages. The cached relation serves the
    query (InMemoryRelation asserted in tests) and UNCACHE releases it
    deterministically. At 100 TB you cache AGGREGATED intermediates,
    never raw fact tables — this caches the post-aggregation view
    shape a dashboard fan-out would reuse."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "cache_orders_src"
    )
    spark.sql("UNCACHE TABLE IF EXISTS cache_orders_agg")
    # UNCACHE releases storage but keeps the temp view registered —
    # drop it too or a second run in the same session fails
    spark.sql("DROP VIEW IF EXISTS cache_orders_agg")
    spark.sql(
        """
        CACHE TABLE cache_orders_agg AS
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM cache_orders_src GROUP BY o_orderstatus
        """
    )
    return spark.table("cache_orders_agg").orderBy("o_orderstatus")


@query(
    "join_hint_strategies",
    oracle="""
    SELECT 'broadcast' AS strategy, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey < 500
    UNION ALL
    SELECT 'merge', count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey < 500
    UNION ALL
    SELECT 'shuffle_hash', count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey < 500
    ORDER BY strategy
    """,
)
def join_hint_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-strategy hint surface (BROADCAST / MERGE /
    SHUFFLE_HASH): the SAME join executed under each hint must produce
    identical results — hints steer the physical planner, never the
    semantics. tests/test_plans_r4.py asserts each hint actually
    selects its operator (BroadcastHashJoin / SortMergeJoin /
    ShuffledHashJoin). This is the manual override for the cases AQE
    stats get wrong — the escape hatch every tuning guide reaches for."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders
    c = cat.customer.where(F.col("c_custkey") < 500)

    def joined(hint: str):
        return (
            o.join(c.hint(hint), F.col("o_custkey") == F.col("c_custkey"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
            )
        )

    return (
        joined("broadcast")
        .select(F.lit("broadcast").alias("strategy"), "n", "key_sum")
        .unionByName(
            joined("merge").select(
                F.lit("merge").alias("strategy"), "n", "key_sum"
            )
        )
        .unionByName(
            joined("shuffle_hash").select(
                F.lit("shuffle_hash").alias("strategy"), "n", "key_sum"
            )
        )
        .orderBy("strategy")
    )


def _morton_bits(c: str, d: str, bits: int = 16) -> str:
    """32-bit Morton interleave of two ``bits``-bit ints — identical
    integer-arithmetic text for Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({c} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({d} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@query(
    "zorder_interleave",
    oracle=f"""
    WITH k AS (
      SELECT o_orderkey,
             CAST(o_custkey & 65535 AS BIGINT) AS c,
             CAST(CAST(o_orderdate AS DATE) - DATE '2023-01-01'
                  AS BIGINT) & 65535 AS d
      FROM orders WHERE o_orderkey < 2000)
    SELECT o_orderkey,
           CAST({_morton_bits('c', 'd')} AS BIGINT) AS zval
    FROM k ORDER BY o_orderkey
    """,
)
def zorder_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key: bit-interleaving customer key and order
    date so that sorting by ONE value clusters BOTH dimensions — the
    multi-dimensional data-layout technique behind Delta/Iceberg
    OPTIMIZE ZORDER, built from plain bit arithmetic (no engine
    support needed). Sorting files by zval makes per-file min/max
    ranges tight in both custkey AND date, so scans filtering on
    either dimension skip files (a linear sort clusters only its
    leading column). The same interleave arithmetic runs in both
    engines; the layout benefit itself is asserted in
    tests/test_plans_r5.py on real written files."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    k = o.select(
        "o_orderkey",
        F.expr("CAST(o_custkey & 65535 AS BIGINT)").alias("c"),
        F.expr(
            "CAST(datediff(o_orderdate, DATE '2023-01-01') & 65535"
            " AS BIGINT)"
        ).alias("d"),
    )
    return k.select(
        "o_orderkey",
        F.expr(f"CAST({_morton_bits('c', 'd')} AS BIGINT)").alias(
            "zval"
        ),
    ).orderBy("o_orderkey")


@query(
    "sql_table_function",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_totalprice > 300000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table-valued function (CREATE FUNCTION ... RETURNS TABLE,
    Spark 3.5+): a parameterized query registered once and invoked in
    the FROM clause — the SQL-native reusable-view-with-arguments
    Hive fakes with variable substitution. The function body inlines
    at plan time, so the parameter behaves like a pushed-down literal
    (no materialization boundary). Oracle inlines the same body."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "tf_orders_src"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION big_orders_by_prio(
            cutoff DOUBLE)
        RETURNS TABLE (o_orderpriority STRING, n BIGINT, total DOUBLE)
        RETURN SELECT o_orderpriority, count(*) AS n,
                      round(sum(o_totalprice), 2) AS total
               FROM tf_orders_src WHERE o_totalprice > cutoff
               GROUP BY o_orderpriority
        """
    )
    return spark.sql(
        "SELECT * FROM big_orders_by_prio(300000)"
        " ORDER BY o_orderpriority"
    )
