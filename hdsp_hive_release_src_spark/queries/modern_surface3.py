"""SURVEY.md §2.2 round-7 — modern-SQL polish wave 3:

- ``star_syntax_variants`` — SELECT * EXCEPT(...), qualified t.*,
  and struct.* expansion in one projection matrix.
- ``higher_order_wave3`` — reduce() with a finish lambda (the
  init/merge/finish fold Spark added over plain aggregate),
  map_from_entries / map_concat, array_repeat, array_join. Map
  outputs are exploded to sorted entry rows (the established
  pandas-canonicalizer pattern); DuckDB mirrors array_repeat with a
  range-comprehension since it lacks the builtin.
- ``values_inline_table`` — FROM (VALUES ...) literal tables joined
  against real relations (the seed/config-table idiom); identical
  SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "star_syntax_variants",
    oracle="""
    SELECT n_nationkey, n_name, r_name,
           n_nationkey AS s_key, n_name AS s_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_nationkey
    """,
)
def star_syntax_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-expansion syntax matrix: ``* EXCEPT (cols)`` (Spark 4
    projection pruning without naming the keepers), qualified
    ``t.*``, and ``struct.*`` field expansion — three ways a SELECT
    list explodes into columns, all in one query so a parser change
    in any of them breaks parity. Column pruning still reaches the
    scan (the EXCEPT form is resolved at analysis time, not
    runtime)."""
    cat = Catalog(spark, sf_dir)
    cat.nation.createOrReplaceTempView("nation")
    cat.region.createOrReplaceTempView("region")
    return spark.sql(
        """
        WITH joined AS (
          SELECT n.* EXCEPT (n_regionkey), r.r_name,
                 struct(n_nationkey AS s_key, n_name AS s_name) AS s
          FROM nation n JOIN region r ON n_regionkey = r_regionkey)
        SELECT n_nationkey, n_name, r_name, s.*
        FROM joined ORDER BY n_nationkey
        """
    )


@query(
    "higher_order_wave3",
    oracle="""
    WITH src AS (
      SELECT p_partkey, string_split(p_name, ' ') AS ws
      FROM part WHERE p_partkey < 200),
    base AS (
      SELECT p_partkey, ws,
             list_reduce(list_transform(ws, x -> strlen(x)),
                         (a, b) -> a + b) * 10 AS folded,
             array_to_string(ws, '-') AS joined,
             array_to_string(
               list_transform(range(1, 4), i ->
                 list_extract(ws, 1)), ',') AS repeated
      FROM src)
    SELECT p_partkey, folded, joined, repeated,
           u.entry_key, u.entry_val
    FROM base, LATERAL (
      SELECT upper(list_extract(ws, 1)) AS entry_key,
             strlen(list_extract(ws, 1)) AS entry_val
      UNION ALL
      SELECT upper(list_extract(ws, 2)),
             strlen(list_extract(ws, 2))) u
    ORDER BY p_partkey, entry_key
    """,
)
def higher_order_wave3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order wave 3: reduce() with init/merge/FINISH lambdas
    (fold char lengths, finish multiplies by 10 — proving the finish
    stage runs), array_join, array_repeat (first word ×3; DuckDB
    mirrors with a range comprehension), and map_from_entries +
    map_concat building a word→length map from entry structs, merged
    with itself (idempotent on distinct keys) and exploded to sorted
    rows for the gate. All map-side."""
    p = Catalog(spark, sf_dir).part
    ws = F.split("p_name", " ")
    base = p.where(F.col("p_partkey") < 200).select(
        "p_partkey",
        ws.alias("ws"),
        F.reduce(
            F.transform(ws, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
            lambda acc: acc * 10,
        ).alias("folded"),
        F.array_join(ws, "-").alias("joined"),
        F.array_join(
            F.array_repeat(F.element_at(ws, 1), 3), ","
        ).alias("repeated"),
    )
    entries = F.transform(
        F.col("ws"),
        lambda w: F.struct(
            F.upper(w).alias("k"), F.length(w).alias("v")
        ),
    )
    m = F.map_concat(
        F.map_from_entries(entries),
    )
    return (
        base.select(
            "p_partkey",
            "folded",
            "joined",
            "repeated",
            F.explode(m).alias("entry_key", "entry_val"),
        )
        .withColumn("folded", F.col("folded").cast("long"))
        .withColumn("entry_val", F.col("entry_val").cast("long"))
        .orderBy("p_partkey", "entry_key")
    )


@query(
    "values_inline_table",
    oracle="""
    SELECT t.region_label, CAST(count(*) AS BIGINT) AS n_nations,
           CAST(sum(weight) AS BIGINT) AS weight_sum
    FROM nation
    JOIN (VALUES (0, 'africa', 10), (1, 'america', 20),
                 (2, 'asia', 30), (3, 'europe', 40),
                 (4, 'mideast', 50))
         AS t(rk, region_label, weight)
      ON n_regionkey = t.rk
    GROUP BY t.region_label ORDER BY t.region_label
    """,
)
def values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM (VALUES ...) inline literal tables — the seed/config
    table idiom (weights, label maps, feature flags) joined against a
    real relation. The literal relation is broadcast by construction;
    identical SQL text runs on both engines."""
    Catalog(spark, sf_dir).nation.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT t.region_label, CAST(count(*) AS BIGINT) AS n_nations,
               CAST(sum(weight) AS BIGINT) AS weight_sum
        FROM nation
        JOIN (VALUES (0, 'africa', 10), (1, 'america', 20),
                     (2, 'asia', 30), (3, 'europe', 40),
                     (4, 'mideast', 50))
             AS t(rk, region_label, weight)
          ON n_regionkey = t.rk
        GROUP BY t.region_label ORDER BY t.region_label
        """
    )
