"""SURVEY.md §2.2 round-7 function-coverage wave 5 — the remaining
unexercised Hive/Spark builtins found by a registry-wide grep:

- ``string_funcs_wave5`` — elt, find_in_set, char_length, url_encode/
  url_decode (round-trip invariant: DuckDB has no URL codec),
  luhn_check (oracle re-implements the Luhn fold with list_reduce).
- ``bitwise_agg_funcs`` — bit_and/bit_or/bit_xor aggregates + getbit.
- ``conditional_agg_family`` — try_sum/try_avg, any_value over
  constant-per-group values, bool_and/bool_or (every/some), count_if.
- ``map_higher_order2`` — map_zip_with / transform_keys /
  transform_values (exploded to sorted entry rows: DuckDB's MAP
  can't be hash-compared by the gate's pandas canonicalizer).
- ``width_bucket_binning`` — width_bucket equi-width histogram
  assignment; the oracle mirrors Spark's documented formula
  arithmetically (DuckDB has no width_bucket), so both engines run
  the identical double expression.
- ``identifier_clause`` — IDENTIFIER(:param) late-bound table/column
  references (the SQL-injection-safe dynamic DDL surface).
- ``posexplode_outer_empty`` — posexplode_outer over possibly-empty
  arrays (NULL row preservation vs posexplode).

All map-side or single-shuffle aggregations; nothing here changes
scale posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "string_funcs_wave5",
    oracle="""
    SELECT p_partkey,
           list_extract(string_split(p_brand, '#'), 2) AS brand_no,
           CASE WHEN p_partkey % 3 = 0 THEN 'alpha'
                WHEN p_partkey % 3 = 1 THEN 'beta'
                ELSE 'gamma' END AS elt_pick,
           COALESCE(list_position(string_split('red,green,blue,ivory',
                                               ','),
                    lower(list_extract(string_split(p_name, ' '), 1))),
                    0) AS set_pos,
           strlen(p_name) AS n_chars,
           p_name AS url_roundtrip,
           (list_reduce(
              list_transform(
                list_reverse(list_transform(
                  string_split_regex(CAST(p_partkey AS VARCHAR), ''),
                  x -> CAST(x AS INT))),
                (d, i) -> CASE WHEN i % 2 = 0
                               THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9
                                         ELSE d * 2 END
                               ELSE d END),
              (a, b) -> a + b) % 10) = 0 AS luhn_ok
    FROM part WHERE p_partkey BETWEEN 1 AND 300
    ORDER BY p_partkey
    """,
)
def string_funcs_wave5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String builtins wave 5. ``elt`` picks the (1-based) Nth
    argument; ``find_in_set`` searches a comma-list (0 when absent);
    ``char_length`` aliases length; ``url_decode(url_encode(x)) = x``
    is checked as a round-trip because DuckDB has no URL codec; and
    ``luhn_check`` of the zero-padded part key is mirrored in the
    oracle by an explicit Luhn fold (double every second digit from
    the right, subtract 9 over 9, sum % 10 == 0) — parity proves
    Spark's builtin implements the published algorithm. The Luhn
    oracle's (d, i) lambda index is 1-based in DuckDB vs 0-based in
    Spark (the documented trap), hence i % 2 == 0 there for the
    'odd position from the right' rule."""
    p = Catalog(spark, sf_dir).part
    return (
        p.where(F.col("p_partkey").between(1, 300))
        .select(
            "p_partkey",
            F.element_at(F.split("p_brand", "#"), 2).alias("brand_no"),
            F.elt(
                F.pmod("p_partkey", F.lit(3)) + 1,
                F.lit("alpha"),
                F.lit("beta"),
                F.lit("gamma"),
            ).alias("elt_pick"),
            F.expr(
                "find_in_set(lower(split(p_name, ' ')[0]),"
                " 'red,green,blue,ivory')"
            ).cast("long").alias("set_pos"),
            F.char_length("p_name").cast("long").alias("n_chars"),
            F.url_decode(F.url_encode("p_name")).alias("url_roundtrip"),
            F.expr("luhn_check(cast(p_partkey as string))").alias(
                "luhn_ok"
            ),
        )
        .orderBy("p_partkey")
    )


@query(
    "bitwise_agg_funcs",
    oracle="""
    SELECT l_returnflag,
           bit_and(CAST(l_quantity AS BIGINT)) AS q_and,
           bit_or(CAST(l_quantity AS BIGINT)) AS q_or,
           bit_xor(CAST(l_quantity AS BIGINT)) AS q_xor,
           CAST(sum((CAST(l_quantity AS BIGINT) >> 2) & 1) AS BIGINT)
               AS bit2_pop
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def bitwise_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AGGREGATES (bit_and/bit_or/bit_xor — the Hive bitmap
    building blocks) plus ``getbit`` as the per-row probe. All
    integer-exact; map-side partial aggregation applies (bitwise ops
    are associative+commutative), so the plan is one shuffle of
    3 longs per group."""
    li = Catalog(spark, sf_dir).lineitem
    q = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and(q).alias("q_and"),
            F.bit_or(q).alias("q_or"),
            F.bit_xor(q).alias("q_xor"),
            F.sum(F.expr("getbit(cast(l_quantity as bigint), 2)"))
            .cast("long")
            .alias("bit2_pop"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "conditional_agg_family",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(o_custkey) AS BIGINT) AS try_sum_key,
           round(avg(o_custkey), 4) AS try_avg_key,
           any_value(o_orderstatus) AS any_status,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS some_jumbo,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000)
                AS BIGINT) AS n_large
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def conditional_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_sum / try_avg (NULL-on-overflow aggregation), any_value
    (over a value provably constant per group — the only spot where
    its nondeterminism contract is still testable), every/some
    (bool_and / bool_or), and count_if. try_sum/try_avg run over the
    integer key column on purpose: integer partial sums stay exact in
    a double up to 2^53, so the rounded average is accumulation-order
    independent (a cent-grid average would not be — the dsir
    class)."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.try_sum("o_custkey").cast("long").alias("try_sum_key"),
            F.round(F.try_avg("o_custkey"), 4).alias("try_avg_key"),
            F.any_value("o_orderstatus").alias("any_status"),
            F.every(F.col("o_totalprice") > 0).alias("all_positive"),
            F.some(F.col("o_totalprice") > 400000).alias("some_jumbo"),
            F.count_if(F.col("o_totalprice") > 200000)
            .cast("long")
            .alias("n_large"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "map_higher_order2",
    oracle="""
    WITH base AS (
      SELECT p_partkey,
             list_extract(string_split(p_name, ' '), 1) AS w1,
             list_extract(string_split(p_name, ' '), 2) AS w2,
             strlen(list_extract(string_split(p_name, ' '), 1))
                 AS len1,
             strlen(list_extract(string_split(p_name, ' '), 2))
                 AS len2
      FROM part WHERE p_partkey < 200)
    SELECT p_partkey, entry_key, entry_val FROM (
      SELECT p_partkey, upper(w1) AS entry_key,
             CAST(len1 * 2 AS BIGINT) AS entry_val FROM base
      UNION ALL
      SELECT p_partkey, upper(w2) AS entry_key,
             CAST(len2 * 2 AS BIGINT) AS entry_val FROM base)
    ORDER BY p_partkey, entry_key
    """,
)
def map_higher_order2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map higher-order wave 2: build word→length maps, then
    transform_keys (upper), transform_values (double), and
    map_zip_with (sum of the doubled map with itself minus itself —
    exercised then discarded so the checked output stays simple).
    Output is EXPLODED to sorted (key, value) rows: the gate's pandas
    canonicalizer cannot hash raw MAP cells, and DuckDB MAPs don't
    compare structurally anyway (the established pattern from
    map_funcs). Map entries per row are tiny; everything is
    map-side."""
    p = Catalog(spark, sf_dir).part
    # p_name is always exactly two distinct words in this schema
    # (asserted by the oracle's two-entry UNION shape)
    words = F.split("p_name", " ")
    base = p.where(F.col("p_partkey") < 200).select(
        "p_partkey",
        F.map_from_arrays(
            words, F.transform(words, lambda w: F.length(w))
        ).alias("m"),
    )
    transformed = base.select(
        "p_partkey",
        F.transform_values(
            F.transform_keys(F.col("m"), lambda k, v: F.upper(k)),
            lambda k, v: v * 2,
        ).alias("m2"),
    )
    zipped = transformed.select(
        "p_partkey",
        F.map_zip_with(
            "m2",
            "m2",
            lambda k, v1, v2: v1 + v2 - v2,
        ).alias("mz"),
    )
    return (
        zipped.select(
            "p_partkey", F.explode("mz").alias("entry_key", "entry_val")
        )
        .withColumn("entry_val", F.col("entry_val").cast("long"))
        .orderBy("p_partkey", "entry_key")
    )


#: width_bucket bounds + bucket count, shared by impl and oracle.
_WB_LO, _WB_HI, _WB_N = "900.0", "105000.0", "16"


@query(
    "width_bucket_binning",
    oracle=f"""
    SELECT CAST(CASE
             WHEN l_extendedprice < {_WB_LO} THEN 0
             WHEN l_extendedprice >= {_WB_HI} THEN {_WB_N} + 1
             ELSE floor((l_extendedprice - {_WB_LO})
                        / (({_WB_HI} - {_WB_LO}) / {_WB_N})) + 1
           END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(l_extendedprice), 2) AS lo_price,
           round(max(l_extendedprice), 2) AS hi_price
    FROM lineitem GROUP BY bucket ORDER BY bucket
    """,
)
def width_bucket_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket equi-width histogram assignment (the SQL-standard
    binning function; Hive ships it since 3.0). DuckDB has no
    width_bucket, so the oracle mirrors Spark's documented formula —
    bucket 0 below the range, n+1 at/above the high bound, else
    ⌊(v-lo)/((hi-lo)/n)⌋+1 — with the identical double expression,
    making parity a conformance check of the builtin itself.
    Downstream is one integer-keyed aggregation; min/max are exact
    (grid values, no accumulation)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.select(
            F.expr(
                f"width_bucket(l_extendedprice, {_WB_LO}, {_WB_HI},"
                f" {_WB_N})"
            ).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo_price"),
            F.round(F.max("l_extendedprice"), 2).alias("hi_price"),
        )
        .orderBy("bucket")
    )


@query(
    "identifier_clause",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER(:param) — late-bound, injection-safe table and
    column references (Spark 3.5+/modern Hive templating surface).
    The table names AND the grouping column arrive as string
    parameters; the clause turns them into catalog identifiers at
    plan time, so a malicious value can't smuggle SQL. Plan is the
    ordinary broadcast dim join."""
    cat = Catalog(spark, sf_dir)
    cat.supplier.createOrReplaceTempView("supplier")
    cat.nation.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT IDENTIFIER(:keycol) AS n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM IDENTIFIER(:fact) JOIN IDENTIFIER(:dim)
          ON s_nationkey = n_nationkey
        GROUP BY IDENTIFIER(:keycol) ORDER BY n_name
        """,
        args={"fact": "supplier", "dim": "nation", "keycol": "n_name"},
    )


@query(
    "posexplode_outer_empty",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN []
                  ELSE string_split(o_orderpriority, '-') END AS parts
      FROM orders WHERE o_orderkey < 500)
    SELECT o_orderkey,
           CASE WHEN len(parts) = 0 THEN NULL
                ELSE u.i - 1 END AS pos,
           CASE WHEN len(parts) = 0 THEN NULL ELSE u.x END AS token
    FROM src LEFT JOIN LATERAL (
      SELECT unnest(parts) AS x,
             generate_subscripts(parts, 1) AS i) u ON TRUE
    ORDER BY o_orderkey, pos
    """,
)
def posexplode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer — the OUTER generator variant that preserves
    the parent row as (NULL, NULL) when the array is empty (plain
    posexplode drops it, silently losing rows from left-joined
    pipelines; every 5th order here gets an empty array to prove the
    preservation). Generator output is pipelined — no shuffle."""
    o = Catalog(spark, sf_dir).orders
    src = o.where(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split("o_orderpriority", "-"))
        .alias("parts"),
    )
    return src.select(
        "o_orderkey",
        F.posexplode_outer("parts").alias("pos", "token"),
    ).orderBy("o_orderkey", "pos")
