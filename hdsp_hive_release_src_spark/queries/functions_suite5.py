"""SURVEY.md §2.2 continued — builtin corners wave 5: comparator-based
array sorting, the blocked fuzzy join (entity resolution done the
at-scale way), and unit-row expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "array_custom_sort",
    oracle="""
    SELECT p_partkey,
           array_to_string(list(w ORDER BY len(w), w), chr(31))
               AS by_len_then_alpha
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w
          FROM part WHERE p_partkey < 200)
    GROUP BY p_partkey ORDER BY p_partkey
    """,
)
def array_custom_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_sort with a CUSTOM comparator lambda (shortest-first,
    alphabetical tiebreak) — beyond the natural-order list sort the
    other array queries use. DuckDB lacks comparator sorts, so the
    oracle rebuilds the ordering relationally (unnest → ORDER BY in a
    list() aggregate) — proving the comparator semantics, not just
    round-tripping one engine's quirk."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 200)
    sorted_arr = F.expr(
        "array_sort(split(p_name, ' '), (a, b) -> "
        "CASE WHEN length(a) < length(b) THEN -1 "
        "WHEN length(a) > length(b) THEN 1 "
        "WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END)"
    )
    return p.select(
        "p_partkey",
        F.concat_ws("\x1f", sorted_arr).alias("by_len_then_alpha"),
    ).orderBy("p_partkey")


@query(
    "blocked_fuzzy_join",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             split_part(c_name, '#', 2) AS cname
      FROM customer WHERE c_custkey < 2000),
    s AS (
      SELECT s_suppkey, s_nationkey,
             split_part(s_name, '#', 2) AS sname
      FROM supplier)
    SELECT c.c_custkey, s.s_suppkey,
           CAST(levenshtein(c.cname, s.sname) AS INTEGER) AS dist
    FROM c JOIN s
      ON c.c_nationkey = s.s_nationkey
     AND levenshtein(c.cname, s.sname) <= 2
    ORDER BY c.c_custkey, s.s_suppkey
    """,
)
def blocked_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocked fuzzy join — entity resolution done the way that
    survives scale: candidates are first BLOCKED on an equi-key
    (nation), and edit distance only scores within blocks — never a
    corpus×corpus comparison (the anti-pattern fuzzy_match's docstring
    warns about, here made concrete). The equi-condition keys the
    shuffle; the levenshtein predicate evaluates post-match, so the
    join stays a hash join, not a cartesian."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.where(F.col("c_custkey") < 2000).select(
        "c_custkey",
        "c_nationkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias(
            "cname"
        ),
    )
    s = cat.supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(2)).alias(
            "sname"
        ),
    )
    dist = F.levenshtein("cname", "sname")
    return (
        c.join(
            s,
            (F.col("c_nationkey") == F.col("s_nationkey"))
            & (dist <= 2),
        )
        .select(
            "c_custkey",
            "s_suppkey",
            dist.cast("int").alias("dist"),
        )
        .orderBy("c_custkey", "s_suppkey")
    )


@query(
    "quantity_expansion",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(u AS BIGINT) AS unit_no
    FROM lineitem, unnest(range(1, CAST(l_quantity AS BIGINT) + 1))
         AS t(u)
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber, unit_no
    """,
)
def quantity_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-row expansion: one row per physical unit from a quantity
    column (explode over sequence(1, qty)) — the normalization step
    per-unit costing / serial-number assignment pipelines run. Row
    multiplication is bounded by sum(qty); map-only."""
    li = Catalog(spark, sf_dir).lineitem.where(F.col("l_orderkey") < 300)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.explode(
                F.sequence(
                    F.lit(1), F.col("l_quantity").cast("long")
                )
            ).alias("unit_no"),
        )
        .orderBy("l_orderkey", "l_linenumber", "unit_no")
    )


@query(
    "json_array_explode",
    oracle="""
    SELECT o_orderkey, CAST(o_orderkey % 7 AS BIGINT) AS q
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, CAST(o_orderkey % 11 AS BIGINT) AS q
    FROM orders WHERE o_orderkey < 1000
    ORDER BY o_orderkey, q
    """,
)
def json_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ARRAY parsing (the shape typed_json's object parse doesn't
    cover): a per-row JSON array of objects is schema-parsed with
    from_json('array<struct>') and exploded to one row per element —
    the nested-API-response ingestion shape. The array is built
    deterministically from the key, so the oracle replays the two
    elements relationally — proving the parse+explode recovered
    exactly the planted values."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 1000)
    arr_json = F.concat(
        F.lit('[{"q": '),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit('}, {"q": '),
        (F.col("o_orderkey") % 11).cast("string"),
        F.lit("}]"),
    )
    parsed = o.select(
        "o_orderkey",
        F.explode(
            F.from_json(arr_json, "array<struct<q:long>>")
        ).alias("el"),
    )
    return parsed.select(
        "o_orderkey", F.col("el.q").alias("q")
    ).orderBy("o_orderkey", "q")


@query(
    "listagg_distinct",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT CAST(c_nationkey % 5 AS VARCHAR)
                      ORDER BY CAST(c_nationkey % 5 AS VARCHAR))
               AS nations_mod
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def listagg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG(DISTINCT ... ) WITHIN GROUP — the deduplicating ordered
    string aggregation (SQL:2023 surface, Spark 4): distinct values
    concatenated in a pinned order, the report-ready companion to
    listagg_sorted's bag semantics."""
    Catalog(spark, sf_dir).customer.createOrReplaceTempView(
        "la_customer_src"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(DISTINCT CAST(c_nationkey % 5 AS STRING), ',')
                   WITHIN GROUP (ORDER BY CAST(c_nationkey % 5 AS STRING))
                   AS nations_mod
        FROM la_customer_src
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )
