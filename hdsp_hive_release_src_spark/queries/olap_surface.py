"""SURVEY.md §2.2/§2.4/§2.5 continued — OLAP-engine surface, wave 3:

- ``decimal_agg`` — exact DECIMAL arithmetic (the money path: no float
  rounding; Spark and the oracle must agree to the last digit).
- ``array_set_ops`` — array_union/intersect/except/distinct family.
- ``binary_meta`` — multimodal metadata WITHOUT decode: byte length,
  content digest, magic-bytes sniff over a binary column — the part of
  the media pipeline that is engine-checkable (FULL oracle; the decode
  stub lives in ``multimodal_meta``).
- ``distribute_sort_by`` — HiveQL DISTRIBUTE BY / SORT BY clauses
  (cluster-by layout control; row-set equality is the contract).
- ``materialized_view_rewrite`` — Hive MV workflow: materialize a
  monthly rollup table, answer a coarser (quarterly) query FROM THE MV;
  the oracle computes from the base table, so any MV staleness/loss
  breaks parity.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table


@query(
    "decimal_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 4)))
                     AS DECIMAL(38, 4)) AS VARCHAR) AS sum_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 4))
                         * CAST(1 - l_discount AS DECIMAL(18, 4)))
                     AS DECIMAL(38, 8)) AS VARCHAR) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation — the financial-correctness path.
    Unlike the double-typed queries (rounded before compare), these
    sums must match the oracle EXACTLY: decimal addition is associative
    so shuffle/combine order cannot change the result at any scale.
    Final sums surface as fixed-scale decimal STRINGS: a pandas bridge
    turns Spark decimals into Decimal objects but DuckDB decimals into
    float64, so comparing the exact textual form is the only encoding
    both engines render identically."""
    li = Catalog(spark, sf_dir).lineitem
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = (1 - F.col("l_discount")).cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price)
            .cast("decimal(38,4)")
            .cast("string")
            .alias("sum_price"),
            F.sum(price * disc)
            .cast("decimal(38,8)")
            .cast("string")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "array_set_ops",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(ws || [p_brand])),
                           chr(31)) AS u,
           array_to_string(list_sort(list_intersect(ws, ws[1:2])),
                           chr(31)) AS i,
           array_to_string(list_sort(list_filter(list_distinct(ws),
                     x -> NOT list_contains(ws[1:1], x))), chr(31)) AS e,
           CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct,
           list_contains(ws, 'green') AS has_green
    FROM (SELECT p_partkey, p_brand, string_split(p_name, ' ') AS ws
          FROM part WHERE p_partkey < 200)
    ORDER BY p_partkey
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation family: union/intersect/except/distinct/
    contains — outputs sorted AND joined to strings so engine-internal
    set order can't leak into the comparison and driver-side pandas
    canonicalization never sees an unhashable list cell. Joined with
    the unit separator (U+001F), which cannot occur in the word data —
    a ',' join would silently collide if an element ever contained a
    comma."""
    SEP = ""
    p = Catalog(spark, sf_dir).part
    ws = F.split("p_name", " ")
    return (
        p.where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.concat_ws(
                SEP, F.array_sort(F.array_union(ws, F.array(F.col("p_brand"))))
            ).alias("u"),
            F.concat_ws(
                SEP, F.array_sort(F.array_intersect(ws, F.slice(ws, 1, 2)))
            ).alias("i"),
            F.concat_ws(
                SEP, F.array_sort(F.array_except(ws, F.slice(ws, 1, 1)))
            ).alias("e"),
            F.size(F.array_distinct(ws)).alias("n_distinct"),
            F.array_contains(ws, "green").alias("has_green"),
        )
        .orderBy("p_partkey")
    )


@query(
    "binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           hex(substring(text, 1, 4)) AS magic_hex,
           CASE WHEN substring(text, 1, 4) = 'key '
                THEN 'sniffed/key' ELSE 'application/octet-stream'
           END AS sniffed_type
    FROM documents ORDER BY doc_id
    """,
)
def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata pass over an opaque binary column — byte
    length, content digest, magic-byte sniffing — everything a media
    pipeline does BEFORE decoding, as pure JVM expressions with a full
    oracle. (Decode itself is the stubbed mapInPandas in
    ``multimodal_meta``.) At 100 TB this is the cheap map-only triage
    that routes payloads to per-type decode stages."""
    d = Catalog(spark, sf_dir).documents
    payload = F.encode("text", "utf-8")
    magic = F.substring(F.col("text"), 1, 4)
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
        F.hex(F.encode(magic, "utf-8")).alias("magic_hex"),
        F.when(magic == "key ", "sniffed/key")
        .otherwise("application/octet-stream")
        .alias("sniffed_type"),
    ).orderBy("doc_id")


@query(
    "distribute_sort_by",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders WHERE o_totalprice > 100000
    """,
)
def distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL DISTRIBUTE BY / SORT BY: explicit partition-and-order
    layout control (the pre-bucketing write pattern). The contract is
    row-SET equality — per-partition order is a layout property, which
    the order-insensitive compare respects."""
    cat = Catalog(spark, sf_dir)
    cat.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 100000
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        """
    )


@query(
    "mv_auto_rewrite",
    oracle="""
    SELECT l_returnflag,
           CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP)
               AS quarter,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18, 4))
                 * CAST(1 - l_discount AS DECIMAL(18, 4))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 4))
                 * CAST(1 - l_discount AS DECIMAL(18, 4))) AS DOUBLE)
                 / count(*), 4) AS avg_item_revenue,
           TRUE AS answered_from_mv
    FROM lineitem
    GROUP BY l_returnflag, quarter ORDER BY l_returnflag, quarter
    """,
)
def mv_auto_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOMATIC materialized-view rewrite — the Hive
    hive.materializedview.rewriting feature Spark lacks, supplied by
    operators/mv_rewrite.py: the query asks the resolver for a
    QUARTERLY aggregation over the BASE lineitem table without naming
    any MV; the resolver's rollup-containment check (requested keys ∈
    MV grouping cols or functional rollups of one; measures derivable
    from stored SUM/COUNT partials — avg included, rebuilt as
    SUM(sum)/SUM(count)) routes it to the registered MONTHLY MV.
    Decimal partials make the month→quarter re-aggregation exactly
    equal to the direct quarterly computation, which is what the
    base-table oracle checks. Tests additionally pin that the
    resolver picked the MV for this request and falls back to the
    base scan for a non-covered one (answered_from_mv carries the
    resolver's actual decision)."""
    from hdsp_hive_release_src_spark.operators.mv_rewrite import (
        GroupKey,
        Measure,
        MvDef,
        MvResolver,
    )

    cat = Catalog(spark, sf_dir)
    mv = "mv_auto_monthly"
    fresh_managed_table(spark, f"{mv}")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,4)")
    (
        cat.lineitem.groupBy(
            "l_returnflag",
            F.date_trunc("month", "l_shipdate").alias("month"),
        )
        .agg(
            F.sum(rev).alias("rev_sum"),
            F.count(F.lit(1)).alias("n_rows"),
            # non-null measure count — what avg derivation divides by
            # (n_rows would overcount if the measure had NULLs)
            F.count(rev).alias("rev_n"),
        )
        .write.mode("overwrite")
        .saveAsTable(mv)
    )
    resolver = MvResolver()
    resolver.register(
        MvDef(
            table=mv,
            base="lineitem",
            group_cols=("l_returnflag", "month"),
            sums={"revenue": "rev_sum"},
            count_col="n_rows",
            measure_counts={"revenue": "rev_n"},
        )
    )
    keys = [
        GroupKey("l_returnflag", "l_returnflag"),
        GroupKey(
            "quarter",
            "month",
            lambda c: F.date_trunc("quarter", c),
            base_src="l_shipdate",
            base_fn=lambda c: F.date_trunc("quarter", c),
        ),
    ]
    measures = [
        Measure("rev_raw", "sum", "revenue"),
        Measure("n_items", "count"),
        Measure("avg_raw", "avg", "revenue"),
    ]
    out, used = resolver.answer(
        spark,
        cat.lineitem,
        "lineitem",
        keys,
        measures,
        {"revenue": rev},
    )
    return (
        out.select(
            "l_returnflag",
            "quarter",
            # r17 (q9 convention, flagged by the audit's new
            # float-image scan): round the EXACT decimal sum, then
            # cast — round(double-image) can diverge cross-engine at
            # an exact cent half-boundary (the r16 q9 replica find)
            F.round(F.col("rev_raw"), 2).cast("double").alias("revenue"),
            "n_items",
            F.round(F.col("avg_raw").cast("double"), 4).alias(
                "avg_item_revenue"
            ),
            F.lit(used is not None).alias("answered_from_mv"),
        )
        .orderBy("l_returnflag", "quarter")
    )


@query(
    "materialized_view_rewrite",
    oracle="""
    SELECT l_returnflag,
           CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP) AS quarter,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18, 4))
                 * CAST(1 - l_discount AS DECIMAL(18, 4))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag, quarter ORDER BY l_returnflag, quarter
    """,
)
def materialized_view_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive materialized-view workflow: materialize a MONTHLY revenue
    rollup as a managed table, then answer the QUARTERLY question from
    the MV (rollup-on-rollup — sums and counts re-aggregate; this is
    why the MV stores sum/count, never avg). The revenue measure is
    DECIMAL end-to-end: decimal addition is associative, so the
    month→quarter re-aggregation is EXACTLY the direct quarterly sum —
    with doubles the two accumulation orders differ in the last bit
    and can land across a rounding boundary. The oracle computes from
    the base table: staleness or a non-re-aggregable measure breaks
    parity. At 100 TB the MV is the difference between scanning 90
    days of facts and 3 rows per flag."""
    cat = Catalog(spark, sf_dir)
    mv = "mv_monthly_revenue"
    fresh_managed_table(spark, f"{mv}")
    (
        cat.lineitem.groupBy(
            "l_returnflag",
            F.date_trunc("month", "l_shipdate").alias("month"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount")).cast("decimal(18,4)")
            ).alias("rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .write.mode("overwrite")
        .saveAsTable(mv)
    )
    return (
        spark.table(mv)
        .groupBy(
            "l_returnflag",
            F.date_trunc("quarter", "month").alias("quarter"),
        )
        .agg(
            # r17 (q9 convention): round the exact decimal sum, then
            # cast — never round the double image of a decimal
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
            F.sum("n_items").alias("n_items"),
        )
        .orderBy("l_returnflag", "quarter")
    )
