"""Hive-surface gaps (public Hive idioms the round-2 review ranked by
real-user hit frequency): percentile_approx — the at-scale quantile —
LATERAL VIEW json_tuple — the multi-key JSON accessor — a registered
Python UDTF behind LATERAL, and the SHOW PARTITIONS / DESCRIBE
metadata surface.

Oracle pattern for the sketch query: the approximate value itself is
impl-defined, so the deterministic output is the EXACT quantile plus a
Spark-computed boolean asserting the sketch landed within tolerance;
the oracle computes the exact quantile and a literal TRUE (cf.
approx_distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table


@query(
    "percentile_approx",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
           TRUE AS approx_within_2pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def percentile_approx_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """percentile_approx (KLL-style mergeable quantile sketch) — the
    100 TB quantile: one pass, fixed-size state, map-side mergeable,
    vs exact percentile's full sort/expand. accuracy=10000 bounds rank
    error to n/10000 per group, far inside the 2% value tolerance
    asserted here (the planted price distribution has no heavy atoms).
    """
    li = Catalog(spark, sf_dir).lineitem

    def pa(p: float) -> F.Column:
        return F.expr(
            f"percentile_approx(l_extendedprice, {p}, 10000)"
        )

    def pe(p: float) -> F.Column:
        return F.expr(f"percentile(l_extendedprice, {p})")

    within = (
        (F.abs(F.col("_a50") - F.col("_e50")) <= 0.02 * F.col("_e50"))
        & (F.abs(F.col("_a90") - F.col("_e90")) <= 0.02 * F.col("_e90"))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            pe(0.5).alias("_e50"),
            pe(0.9).alias("_e90"),
            pa(0.5).alias("_a50"),
            pa(0.9).alias("_a90"),
        )
        .select(
            "l_returnflag",
            F.round("_e50", 4).alias("exact_p50"),
            F.round("_e90", 4).alias("exact_p90"),
            within.alias("approx_within_2pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "json_tuple",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(count(json_extract_string(props, '$.missing'))
                AS BIGINT) AS n_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_tuple_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive LATERAL VIEW json_tuple: one parse extracting N keys per
    row (vs N get_json_object re-parses) — map-only, and the absent
    key exercises the NULL path. Run as raw HiveQL: the LATERAL VIEW
    syntax itself is the surface under test."""
    Catalog(spark, sf_dir).events.createOrReplaceTempView(
        "events_jt_src"
    )
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               sum(CAST(jt.k AS BIGINT)) AS sum_k,
               count(jt.missing) AS n_missing
        FROM events_jt_src
        LATERAL VIEW json_tuple(props, 'k', 'missing') jt AS k, missing
        GROUP BY event_type ORDER BY event_type
        """
    )


@query(
    "udtf_lateral",
    oracle="""
    SELECT i - 1 AS pos, count(*) AS n,
           CAST(count(DISTINCT ws[i]) AS BIGINT) AS n_distinct
    FROM (SELECT string_split(text, ' ') AS ws FROM documents),
         range(1, 6) r(i)
    WHERE i <= len(ws)
    GROUP BY pos ORDER BY pos
    """,
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive custom-UDTF registration: a Python table function
    (CREATE FUNCTION → LATERAL VIEW in Hive terms) registered and
    invoked from SQL via LATERAL. Covers the registration surface the
    built-in explode variants can't; the docstring caveat stands — a
    row-based Python UDTF is the slow path, so production pipelines
    should prefer explode/posexplode (see lateral_explode_tokens) and
    reserve UDTFs for genuinely procedural generators."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            for i, w in enumerate(text.split(" ")):
                yield (w, i)

    spark.udtf.register("split_words_udtf", SplitWords)
    Catalog(spark, sf_dir).documents.createOrReplaceTempView(
        "udtf_docs_src"
    )
    return spark.sql(
        """
        SELECT pos, count(*) AS n,
               count(DISTINCT token) AS n_distinct
        FROM udtf_docs_src, LATERAL split_words_udtf(text)
        WHERE pos < 5 GROUP BY pos ORDER BY pos
        """
    )


@query(
    "udaf_register",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive CREATE AGGREGATE FUNCTION parity: a pandas grouped-agg UDF
    (Arrow batch in, scalar out — the vectorized UDAF shape) registered
    under a SQL name and called with GROUP BY from a SQL string. The
    geometric mean is exp(mean(ln x)), so the oracle replays it with
    builtins; round(4) absorbs summation-order noise. The UDF lives in
    functions/udafs.py: pandas_udf needs REAL type hints (Series ->
    scalar marks it grouped-agg), which this module's postponed
    annotations would stringify."""
    from hdsp_hive_release_src_spark.functions.udafs import geo_mean

    spark.udf.register("geo_mean_udaf", geo_mean)
    Catalog(spark, sf_dir).lineitem.createOrReplaceTempView(
        "udaf_lineitem_src"
    )
    # NOTE: a grouped-agg pandas UDF cannot share an Aggregate with
    # JVM aggregates (INVALID_PANDAS_UDF_PLACEMENT), so it aggregates
    # alone here
    return spark.sql(
        """
        SELECT l_returnflag,
               round(geo_mean_udaf(l_extendedprice), 4)
                   AS geo_mean_price
        FROM udaf_lineitem_src
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT source, n_tokens,
             CAST((sum(n_tokens) OVER w - n_tokens) // 256
                  AS BIGINT) AS bin_id
      FROM toks
      WINDOW w AS (PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING))
    SELECT source, bin_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY source, bin_id ORDER BY source, bin_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pretraining sequence packing (concat-and-chunk): documents
    are concatenated in arrival order within each source shard and cut
    into 256-token context bins; a doc's bin is where its first token
    lands (floor division — DuckDB's // mirrors Spark's long cast,
    which truncates where a plain CAST(double) would round). Window
    cumsum per shard — shards pack in parallel, no global sort (the
    per-shard window is the scale unit, matching how packing runs per
    input shard in production pipelines)."""
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / 256
        ).cast("long"),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@query(
    "show_partitions",
    oracle="""
    SELECT DISTINCT 'l_returnflag=' || l_returnflag AS "partition"
    FROM lineitem ORDER BY 1
    """,
)
def show_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive metadata surface: SHOW PARTITIONS on a partitioned catalog
    table. The oracle derives the same partition list from the data, so
    the check proves the catalog's partition discovery matches reality.
    """

    li = Catalog(spark, sf_dir).lineitem
    fresh_managed_table(spark, "sp_lineitem")
    (
        li.select("l_orderkey", "l_extendedprice", "l_returnflag")
        .write.partitionBy("l_returnflag")
        .saveAsTable("sp_lineitem")
    )
    return spark.sql("SHOW PARTITIONS sp_lineitem").orderBy("partition")


@query(
    "full_outer_join",
    oracle="""
    WITH urgent AS (
      SELECT CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP))
                  AS TIMESTAMP) AS day, count(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY day),
    big AS (
      SELECT CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP))
                  AS TIMESTAMP) AS day, count(*) AS n_big
      FROM orders WHERE o_totalprice > 400000 GROUP BY day)
    SELECT coalesce(u.day, b.day) AS day,
           coalesce(n_urgent, 0) AS n_urgent,
           coalesce(n_big, 0) AS n_big,
           (u.day IS NULL OR b.day IS NULL) AS one_sided
    FROM urgent u FULL OUTER JOIN big b ON u.day = b.day
    ORDER BY day
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN (the one outer-join flavor the other queries
    don't cover): days with urgent orders ⟗ days with big-ticket
    orders — days on one side only surface with NULLs, coalesced to 0,
    and the one_sided flag proves both unmatched branches occur. At
    scale a full outer join shuffles both sides on the key (no
    broadcast shortcut exists for FULL OUTER in Spark) — keep keys
    low-cardinality-skew-free; AQE handles the rest."""
    o = Catalog(spark, sf_dir).orders
    day = F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(day.alias("u_day"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    big = (
        o.where(F.col("o_totalprice") > 400000)
        .groupBy(day.alias("b_day"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    j = urgent.join(big, urgent.u_day == big.b_day, "full_outer")
    return (
        j.select(
            F.coalesce("u_day", "b_day").alias("day"),
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("n_big", F.lit(0)).alias("n_big"),
            (F.col("u_day").isNull() | F.col("b_day").isNull()).alias(
                "one_sided"
            ),
        )
        .orderBy("day")
    )


@query(
    "msck_repair_discovery",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def msck_repair_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive partition-discovery ops surface: an EXTERNAL table is
    declared over an already-populated partitioned directory (written
    out-of-band, as a backfill job would), its partitions registered
    with MSCK REPAIR TABLE, and the repaired table queried across all
    partitions. Value parity vs the original table proves discovery
    found every partition — the `MSCK REPAIR` + external-location flow
    is how 100 TB Hive warehouses onboard data written by other
    engines."""
    from hdsp_hive_release_src_spark.sources.io import write_partitioned

    li = Catalog(spark, sf_dir).lineitem
    path = write_partitioned(li, "l_returnflag", "msck_lineitem", sf_dir)
    spark.sql("DROP TABLE IF EXISTS msck_lineitem")
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in li.schema.fields
        if f.name != "l_returnflag"
    )
    spark.sql(
        f"CREATE TABLE msck_lineitem ({cols}) USING parquet"
        f" PARTITIONED BY (l_returnflag STRING) LOCATION '{path}'"
    )
    spark.sql("MSCK REPAIR TABLE msck_lineitem")
    return (
        spark.table("msck_lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "describe_table",
    oracle="""
    SELECT * FROM (VALUES
      ('l_orderkey', 'bigint'), ('l_partkey', 'bigint'),
      ('l_suppkey', 'bigint'), ('l_linenumber', 'int'),
      ('l_quantity', 'double'), ('l_extendedprice', 'double'),
      ('l_discount', 'double'), ('l_tax', 'double'),
      ('l_returnflag', 'string'), ('l_linestatus', 'string'),
      ('l_shipdate', 'timestamp')) t(col_name, data_type)
    ORDER BY col_name
    """,
)
def describe_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive metadata surface: DESCRIBE. The oracle pins the expected
    column/type inventory, so the check proves the catalog reports the
    true parquet schema (the contract every downstream tool reads)."""
    Catalog(spark, sf_dir).lineitem.createOrReplaceTempView(
        "desc_lineitem_src"
    )
    return (
        spark.sql("DESCRIBE TABLE desc_lineitem_src")
        .select("col_name", "data_type")
        .orderBy("col_name")
    )


@query(
    "xpath_extract",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders WHERE o_orderkey < 2000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive xpath UDF family: per-row XML is built from the order,
    then xpath_string/xpath_long must recover the original fields
    exactly (aggregation over the extracted values ≡ aggregation over
    the source, which is what the oracle checks — any xpath
    mis-extraction breaks parity). Money rides as integer cents so no
    float ever transits the string form."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    xml = F.concat(
        F.lit("<order><pri>"), F.col("o_orderpriority"),
        F.lit("</pri><cents>"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("</cents></order>"),
    )
    parsed = o.select(xml.alias("x")).select(
        F.expr("xpath_string(x, 'order/pri')").alias("o_orderpriority"),
        F.expr("xpath_long(x, 'order/cents')").alias("cents"),
    )
    return (
        parsed.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT user_id, event_id,
           last_value(pv IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
              ROWS UNBOUNDED PRECEDING) AS last_purchase,
           lead(pv IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS next_purchase
    FROM (SELECT user_id, event_id, ts,
                 CASE WHEN event_type = 'purchase' THEN round(value, 2)
                 END AS pv
          FROM events WHERE user_id < 20)
    ORDER BY user_id, event_id
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI/Hive IGNORE NULLS window modifiers: last purchase value
    carried forward (last_value) and next purchase looked ahead (lead)
    across non-purchase gaps — the same SQL text runs on both engines.
    """
    Catalog(spark, sf_dir).events.createOrReplaceTempView(
        "win_events_src"
    )
    return spark.sql(
        """
        SELECT user_id, event_id,
               last_value(pv) IGNORE NULLS OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS last_purchase,
               lead(pv) IGNORE NULLS OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_purchase
        FROM (SELECT user_id, event_id, ts,
                     CASE WHEN event_type = 'purchase'
                          THEN round(value, 2) END AS pv
              FROM win_events_src WHERE user_id < 20)
        ORDER BY user_id, event_id
        """
    )


@query(
    "format_number_grouped",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_orderkey < 500)
    SELECT o_orderpriority,
           format('{:,}', max(c) // 100) || '.' ||
               lpad(CAST(max(c) % 100 AS VARCHAR), 2, '0')
               AS max_price_fmt,
           count(*) AS n
    FROM cents GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def format_number_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive format_number (locale thousands separators): the formatted
    string must equal a digit-exact reconstruction from integer cents
    (DuckDB builds it with format('{:,}') on the integer part — no
    float ever gets formatted, so the comma grouping is the only thing
    under test)."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 500)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("format_number(round(max(o_totalprice), 2), 2)").alias(
                "max_price_fmt"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "stack_unpivot_funcs",
    oracle="""
    SELECT p_partkey, 'price' AS metric,
           round(p_retailprice, 2) AS val
    FROM part WHERE p_partkey < 150
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part WHERE p_partkey < 150
    ORDER BY p_partkey, metric
    """,
)
def stack_unpivot_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's stack() UDTF — the SELECT-list unpivot idiom (N columns →
    N rows of (label, value) per input row). Distinct from the
    relational UNPIVOT query (analytics.py): stack is an expression-
    position generator usable anywhere a LATERAL VIEW goes. Map-only."""
    Catalog(spark, sf_dir).part.where(
        F.col("p_partkey") < 150
    ).createOrReplaceTempView("stack_part_src")
    return spark.sql(
        """
        SELECT p_partkey, metric, round(val, 2) AS val
        FROM stack_part_src
        LATERAL VIEW stack(
            2, 'size', CAST(p_size AS DOUBLE),
               'price', p_retailprice) t AS metric, val
        ORDER BY p_partkey, metric
        """
    )


@query(
    "str_to_map_parse",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS prio_rt,
           o_orderstatus AS stat_rt,
           CAST(2 AS INTEGER) AS n_keys
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def str_to_map_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive str_to_map: a "k:v,k:v" config string is built from order
    fields, parsed back with str_to_map, and the extracted values must
    round-trip to the originals (the oracle recomputes them from the
    source columns directly, so any parse drift breaks parity). The
    'settings-string column' parse is a daily Hive-ETL chore; map-only
    expression work."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 500)
    packed = F.concat(
        F.lit("prio:"),
        F.col("o_orderpriority"),
        F.lit(",stat:"),
        F.col("o_orderstatus"),
    )
    m = F.expr("str_to_map(packed, ',', ':')")
    return (
        o.select("o_orderkey", packed.alias("packed"))
        .select(
            "o_orderkey",
            m["prio"].alias("prio_rt"),
            m["stat"].alias("stat_rt"),
            F.size(F.map_keys(m)).alias("n_keys"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "inline_explode",
    oracle="""
    SELECT o_orderkey, 'full_price' AS measure,
           round(o_totalprice, 2) AS val
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, 'with_freight', round(o_totalprice + 100, 2)
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey, measure
    """,
)
def inline_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW inline(array<struct>) — the Hive UDTF that explodes
    an array of structs into columns in one step (explode would yield
    a struct column needing a second projection). Each order emits its
    measure rows from an inline-constructed struct array; map-only, so
    the UNION-ALL-free single scan is the point: N measures cost one
    pass, not N (the same reason stack() exists — inline is its
    struct-typed sibling)."""
    Catalog(spark, sf_dir).orders.where(
        F.col("o_orderkey") < 2000
    ).createOrReplaceTempView("inline_orders_src")
    return spark.sql(
        """
        SELECT o_orderkey, m.measure, round(m.val, 2) AS val
        FROM inline_orders_src
        LATERAL VIEW inline(array(
            named_struct('measure', 'full_price',
                         'val', o_totalprice),
            named_struct('measure', 'with_freight',
                         'val', o_totalprice + 100))) m AS measure, val
        ORDER BY o_orderkey, measure
        """
    )


@query(
    "database_namespace_ddl",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           TRUE AS db_listed
    FROM orders WHERE o_orderkey < 1000
    """,
)
def database_namespace_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE DATABASE + qualified-name addressing — the namespace
    layer every multi-team warehouse organizes by: a table written
    into a non-default database, addressed as db.table from the
    default context, the database verified present in SHOW DATABASES
    (db_listed carries the actual catalog lookup, not a literal).
    Namespaces are pure metastore metadata — no data-path
    implications at any scale."""
    import shutil

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 1000)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ns")
    spark.sql("DROP TABLE IF EXISTS graft_ns.ns_orders")
    # DROP in a fresh metastore can't clear a previous session's
    # leftover location (the db-qualified twin of
    # fresh_managed_table's default-db case)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    shutil.rmtree(
        f"{warehouse}/graft_ns.db/ns_orders", ignore_errors=True
    )
    o.select("o_orderkey", "o_totalprice").write.saveAsTable(
        "graft_ns.ns_orders"
    )
    listed = any(
        r.namespace == "graft_ns"
        for r in spark.sql("SHOW DATABASES").collect()
    )
    return (
        spark.table("graft_ns.ns_orders")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
        .select(
            "n_rows", "key_sum", F.lit(listed).alias("db_listed")
        )
    )


@query(
    "table_properties_ddl",
    oracle="""
    SELECT 'team' AS prop_key, 'curation' AS prop_value,
           count(*) AS n_rows
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT 'retention_days', '90', count(*)
    FROM orders WHERE o_orderkey < 1000
    ORDER BY prop_key
    """,
)
def table_properties_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE SET TBLPROPERTIES + SHOW TBLPROPERTIES — the
    metadata channel ownership/retention/lineage tooling reads
    (properties travel with the table through the metastore, not in a
    side spreadsheet). The returned rows carry the properties READ
    BACK from the catalog joined with the table's live row count, so
    a property that failed to persist breaks parity."""
    from hdsp_hive_release_src_spark.sources.io import (
        fresh_managed_table,
    )

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 1000)
    fresh_managed_table(spark, "props_orders")
    o.select("o_orderkey").write.saveAsTable("props_orders")
    spark.sql(
        "ALTER TABLE props_orders SET TBLPROPERTIES "
        "('team' = 'curation', 'retention_days' = '90')"
    )
    props = {
        r.key: r.value
        for r in spark.sql(
            "SHOW TBLPROPERTIES props_orders"
        ).collect()
        if r.key in ("team", "retention_days")
    }
    n = spark.table("props_orders").count()
    return spark.createDataFrame(
        sorted((k, v, n) for k, v in props.items()),
        "prop_key string, prop_value string, n_rows long",
    )


@query(
    "global_temp_view",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders WHERE o_orderkey < 2000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def global_temp_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL temporary views — the cross-session sharing tier between
    session-local temp views and catalog tables: registered once,
    addressable as global_temp.<name> from ANY session of the
    application (a second session is spun via newSession() and reads
    the view to prove the cross-session contract; a session-local
    view would be invisible there)."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    o.createOrReplaceGlobalTempView("gtv_orders")
    other = spark.newSession()
    return (
        other.table("global_temp.gtv_orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )
