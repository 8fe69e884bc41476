"""SURVEY.md §2.2 continued — builtin-function corners wave 2:
banker's rounding vs half-up (the financial-report divergence), the
regexp_count/instr/substr family, Spark 4 collated comparison, and
radix conversion (conv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "rounding_modes",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           round(p_retailprice / 10, 0) AS half_up,
           round_even(p_retailprice / 10, 0) AS half_even,
           CAST(round(p_retailprice / 10, 0)
                <> round_even(p_retailprice / 10, 0) AS BOOLEAN)
               AS diverges
    FROM part WHERE p_partkey < 400 ORDER BY p_partkey
    """,
)
def rounding_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HALF_UP round() vs HALF_EVEN bround() (banker's rounding) — the
    two modes financial reports disagree on at exact .5 boundaries;
    the diverges flag marks exactly those rows. Spark bround pairs
    with DuckDB round_even, Spark round with DuckDB round — parity
    proves both engines implement both modes identically."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 400)
    x = F.col("p_retailprice") / 10
    return p.select(
        "p_partkey",
        F.round(x, 0).alias("half_up"),
        F.bround(x, 0).alias("half_even"),
        (F.round(x, 0) != F.bround(x, 0)).alias("diverges"),
    ).orderBy("p_partkey")


@query(
    "regexp_family",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(len(regexp_extract_all(p_name, '[aeiou]'))
                AS INTEGER) AS n_vowels,
           nullif(regexp_extract(p_name, '[a-z]{6,}'), '')
               AS first_long,
           CAST(strpos(p_name, 'e') AS INTEGER) AS first_e_pos,
           regexp_replace(p_name, '([aeiou])', '<\\1>', 'g')
               AS marked
    FROM part WHERE p_partkey < 200 ORDER BY p_partkey
    """,
)
def regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-Hive regexp accessor family: regexp_count (match
    tally), regexp_substr (first match or NULL — note DuckDB's
    regexp_extract returns '' instead, aligned with nullif),
    regexp_instr (1-based first-match position, 0 when absent — a
    single-char pattern makes strpos the exact oracle), and global
    regexp_replace with a capture-group backreference (Spark $1 =
    DuckDB \\1 dialect)."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_substr("p_name", F.lit("[a-z]{6,}")).alias(
            "first_long"
        ),
        F.regexp_instr("p_name", F.lit("e")).alias("first_e_pos"),
        F.regexp_replace("p_name", "([aeiou])", "<$1>").alias("marked"),
    ).orderBy("p_partkey")


@query(
    "collation_compare",
    oracle="""
    SELECT c_mktsegment AS segment, count(*) AS n
    FROM customer
    WHERE lower(c_mktsegment) = lower('BuIlDiNg')
       OR lower(c_mktsegment) = lower('machinery')
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: UTF8_LCASE collated equality gives
    case-insensitive matching at the TYPE level — the predicate reads
    `col = literal` with no lower() wrapping, and (unlike
    expression-wrapped lowering) stays sargable for pushdown/stats.
    The oracle replays it with explicit lower() on both sides."""
    c = Catalog(spark, sf_dir).customer
    c.createOrReplaceTempView("coll_customer_src")
    return spark.sql(
        """
        SELECT c_mktsegment AS segment, count(*) AS n
        FROM coll_customer_src
        WHERE c_mktsegment COLLATE UTF8_LCASE IN ('BuIlDiNg',
                                                  'machinery')
        GROUP BY c_mktsegment ORDER BY segment
        """
    )


@query(
    "conv_bases",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           to_base(o_orderkey, 16) AS hex,
           to_base(o_orderkey, 2) AS bin,
           to_base(o_orderkey, 8) AS oct
    FROM orders WHERE o_orderkey < 600 AND o_orderkey > 0
    ORDER BY o_orderkey
    """,
)
def conv_bases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive conv() radix conversion (10→16/2/8) — checksum/id-encoding
    chores; DuckDB's to_base is the exact twin (both emit uppercase
    digits, no padding). Map-only."""
    o = Catalog(spark, sf_dir).orders.where(
        (F.col("o_orderkey") < 600) & (F.col("o_orderkey") > 0)
    )
    k = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.conv(k, 10, 16).alias("hex"),
        F.conv(k, 10, 2).alias("bin"),
        F.conv(k, 10, 8).alias("oct"),
    ).orderBy("o_orderkey")
