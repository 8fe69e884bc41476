"""SURVEY.md §2.2 continued — Hive builtin-function parity suites:
JSON extraction (get_json_object), statistical aggregates, arg-min/max,
collect_list/collect_set, array higher-order functions, NULL-handling
conditionals, extended string functions.

Each suite is one oracle-checked query exercising a family of builtins
end-to-end (values, not just signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive get_json_object over the events.props JSON column →
    typed aggregation (the semi-structured column pattern)."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            F.min(k).cast("long").alias("min_k"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (stddev/variance/corr/covar) —
    single-pass, mergeable moments (the 100 TB-safe formulation)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "minmax_by",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      FROM orders)
    SELECT o_orderpriority,
           max(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
           max(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (Hive 4 / Spark 3.3+): order id with the extreme
    total price per priority; composite (price, key) ordering struct
    breaks price ties deterministically (oracle emulates with window
    ranks — DuckDB's arg_max can't take a composite key)."""
    o = Catalog(spark, sf_dir).orders
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", key).alias("biggest_order"),
            F.min_by("o_orderkey", key).alias("smallest_order"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "collect_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
           CAST(len(list(n_name)) AS BIGINT) AS n_nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list → sorted array, emitted as a joined
    string (order-canonicalized so the shuffle's row order can't leak
    into results, and scalar-typed so any downstream pandas
    canonicalization — which can't sort list cells — stays hashable)."""
    n = Catalog(spark, sf_dir).nation
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias(
                "nations"
            ),
            F.size(F.collect_list("n_name")).cast("long").alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           round(list_sum(embedding::DOUBLE[]), 6) AS vec_sum,
           round(list_max(embedding::DOUBLE[]), 6) AS vec_max,
           round(embedding[1]::DOUBLE, 6) AS first_dim,
           round(list_sum(list_transform(list_slice(embedding::DOUBLE[], 1, 8),
                 x -> abs(x))), 6) AS l1_head,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS BIGINT)
               AS n_positive
    FROM embeddings ORDER BY vec_id LIMIT 100
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order function family (aggregate/transform/filter/
    slice/element_at) over the embedding column — all JVM-side."""
    e = Catalog(spark, sf_dir).embeddings
    v = F.expr("transform(embedding, x -> cast(x AS double))")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return (
        e.select(
            "vec_id",
            F.round(fold(v), 6).alias("vec_sum"),
            F.round(F.array_max(v), 6).alias("vec_max"),
            F.round(F.element_at(v, 1), 6).alias("first_dim"),
            F.round(
                fold(F.transform(F.slice(v, 1, 8), lambda x: F.abs(x))), 6
            ).alias("l1_head"),
            F.size(F.filter(v, lambda x: x > 0)).cast("long").alias(
                "n_positive"
            ),
        )
        .orderBy("vec_id")
        .limit(100)
    )


@query(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal IS NULL THEN -1.0
                ELSE round(greatest(c_acctbal, 0.0), 2) END AS bal_floor,
           round(least(c_acctbal, 1000.0), 2) AS bal_cap,
           (c_acctbal IS NOT NULL AND c_acctbal > 0) AS is_positive
    FROM customer ORDER BY c_custkey LIMIT 200
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-conditional family: nullif/coalesce/greatest/least/IS NULL
    (Hive nvl idioms)."""
    c = Catalog(spark, sf_dir).customer
    return (
        c.select(
            "c_custkey",
            F.coalesce(
                F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")
            ).alias("seg_or_other"),
            F.when(F.col("c_acctbal").isNull(), -1.0)
            .otherwise(F.round(F.greatest("c_acctbal", F.lit(0.0)), 2))
            .alias("bal_floor"),
            F.round(F.least("c_acctbal", F.lit(1000.0)), 2).alias("bal_cap"),
            (F.col("c_acctbal").isNotNull() & (F.col("c_acctbal") > 0)).alias(
                "is_positive"
            ),
        )
        .orderBy("c_custkey")
        .limit(200)
    )


@query(
    "string_funcs_codec",
    oracle="""
    SELECT doc_id,
           translate(substring(text, 1, 30), 'aeiou', '01234') AS devoweled,
           CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_code,
           chr(CAST(65 + doc_id % 26 AS INTEGER)) AS row_letter,
           to_base64(encode(substring(text, 1, 12))) AS head_b64,
           decode(from_base64(to_base64(encode(substring(text, 1, 12)))))
               AS head_back,
           array_to_string(string_split(text, ' ')[1:3], ' ')
               AS first_three
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def string_funcs_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec/char string family: translate, ascii/chr, base64
    round-trip, substring_index. Base64 parity proves byte-exact
    encode/decode across engines."""
    d = Catalog(spark, sf_dir).documents
    head12 = F.substring("text", 1, 12)
    return (
        d.where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.translate(F.substring("text", 1, 30), "aeiou", "01234").alias(
                "devoweled"
            ),
            F.ascii(F.substring("text", 1, 1)).alias("first_code"),
            F.chr(65 + F.col("doc_id") % 26).alias("row_letter"),
            F.base64(F.encode(head12, "utf-8")).alias("head_b64"),
            F.decode(
                F.unbase64(F.base64(F.encode(head12, "utf-8"))), "utf-8"
            ).alias("head_back"),
            F.substring_index("text", " ", 3).alias("first_three"),
        )
        .orderBy("doc_id")
    )


@query(
    "string_funcs_extended",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           rpad(p_brand, 10, '.') AS brand_padded,
           replace(p_name, ' ', '_') AS name_snake,
           reverse(p_brand) AS brand_rev,
           repeat(substring(p_type, 1, 2), 2) AS type_2x,
           CAST(strpos(p_name, ' ') AS BIGINT) AS space_at,
           split_part(p_name, ' ', 1) AS first_word
    FROM part ORDER BY p_partkey LIMIT 200
    """,
)
def string_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: lpad/rpad/replace/reverse/repeat/
    instr/split_part."""
    p = Catalog(spark, sf_dir).part
    return (
        p.select(
            "p_partkey",
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias(
                "size_padded"
            ),
            F.rpad("p_brand", 10, ".").alias("brand_padded"),
            F.replace("p_name", F.lit(" "), F.lit("_")).alias("name_snake"),
            F.reverse("p_brand").alias("brand_rev"),
            F.repeat(F.substring("p_type", 1, 2), 2).alias("type_2x"),
            F.instr("p_name", " ").cast("long").alias("space_at"),
            F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )
