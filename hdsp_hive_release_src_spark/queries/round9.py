"""SURVEY.md §2 round-9 first wave — SQL/DDL surface gaps the r8
operator sweep left open. Hive-parity items (reference is a Hive
release fork, /root/reference/README.md:1-4): positional GROUP BY /
ORDER BY ordinals, HAVING without GROUP BY, CHAR(n)/VARCHAR(n) length
semantics, ``reflect``/``java_method`` (GenericUDF reflect), column
and table COMMENT DDL, ``__HIVE_DEFAULT_PARTITION__`` null-partition
round trip, DEFAULT column values, ``from_csv``/``to_csv``/
``schema_of_csv`` expressions, parquet bloom-filter write options,
text-source lineSep/wholetext, and sequence/generate_series parity.

Exact-arithmetic rule: every money aggregate crosses the aggregation
boundary as integer cents (``CAST(round(x*100) AS BIGINT)`` both
engines); every DuckDB ``sum()``/``count()`` output column is CAST AS
BIGINT (the r7 HUGEINT lesson). No ``--`` comments inside oracle
strings (the registry collapses newlines).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import (
    fresh_managed_table,
    scratch_path,
)

#: exact integer cents from the 2dp-money double, identical on both
#: engines (round-half-away on positive values)
_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# positional ordinals + HAVING without GROUP BY
# --------------------------------------------------------------------


@query(
    "group_ordinal_having",
    oracle=f"""
    WITH per AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1 HAVING count(*) >= 10),
    tot AS (
      SELECT 'zz_total' AS pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CENTS}) AS BIGINT) AS cents
      FROM orders HAVING count(*) > 0)
    SELECT pri, n, cents FROM per
    UNION ALL SELECT pri, n, cents FROM tot
    ORDER BY 1
    """,
)
def group_ordinal_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional GROUP BY 1 / ORDER BY 1 ordinals (HiveQL's
    hive.groupby.orderby.position.alias surface) plus HAVING attached
    to a global aggregate with NO GROUP BY — the branch that makes
    HAVING a post-aggregation filter rather than sugar for WHERE.
    Both resolved by Catalyst at analysis time: ordinals cost nothing
    at any scale, they rewrite to the named expressions."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView("ord_r9a")
    return spark.sql(
        f"""
        WITH per AS (
          SELECT o_orderpriority AS pri,
                 count(*) AS n,
                 sum({_CENTS}) AS cents
          FROM ord_r9a GROUP BY 1 HAVING count(*) >= 10),
        tot AS (
          SELECT 'zz_total' AS pri, count(*) AS n,
                 sum({_CENTS}) AS cents
          FROM ord_r9a HAVING count(*) > 0)
        SELECT pri, n, cents FROM per
        UNION ALL SELECT pri, n, cents FROM tot
        ORDER BY 1
        """
    )


# --------------------------------------------------------------------
# CHAR(n) / VARCHAR(n) length semantics
# --------------------------------------------------------------------


@query(
    "char_varchar_semantics",
    oracle="""
    SELECT concat('[', rpad(p_brand, 12, ' '), ']') AS brand_vis,
           CAST(12 AS INT) AS pad_len,
           (p_brand = 'Brand#11') AS is_brand11,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(strlen(p_type)) AS INT) AS max_type_len
    FROM part GROUP BY p_brand ORDER BY brand_vis
    """,
)
def char_varchar_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive CHAR(n)/VARCHAR(n) semantics on a managed table: CHAR(12)
    values read back BLANK-PADDED to exactly 12 (length() sees the
    pad), comparison against a shorter literal still matches because
    the literal is pad-extended, and VARCHAR(30) enforces max length
    at write (overflow raises — asserted in tests, not here). The
    padding is a READ-side decoration over the same parquet bytes, so
    the choice costs nothing at scale."""
    fresh_managed_table(spark, "cv9_part")
    spark.sql(
        "CREATE TABLE cv9_part (b CHAR(12), t VARCHAR(30)) "
        "USING parquet"
    )
    Catalog(spark, sf_dir).part.createOrReplaceTempView("part_cv9")
    spark.sql(
        "INSERT INTO cv9_part SELECT p_brand, p_type FROM part_cv9"
    )
    return spark.sql(
        """
        SELECT concat('[', b, ']') AS brand_vis,
               CAST(length(b) AS INT) AS pad_len,
               (b = 'Brand#11') AS is_brand11,
               count(*) AS n,
               CAST(max(length(t)) AS INT) AS max_type_len
        FROM cv9_part GROUP BY b ORDER BY brand_vis
        """
    )


# --------------------------------------------------------------------
# reflect / java_method (Hive GenericUDFReflect)
# --------------------------------------------------------------------


@query(
    "reflect_java_method",
    oracle="""
    SELECT lower(hex(o_orderkey % 4096)) AS hex_code,
           bin(CAST(o_orderkey % 16 AS INTEGER)) AS bin_code,
           CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey < 5000
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def reflect_java_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ``reflect()`` / ``java_method()`` (GenericUDFReflect):
    invoke static JVM methods by name from SQL. Integer.toHexString /
    Long.toBinaryString are replayed in the oracle via hex()/bin()
    string builtins — proving the reflective call computes the same
    function, which is the surface contract. Reflection is per-row
    JVM work with no codegen; the docstring-level guidance is to
    prefer builtins (conv/hex/bin) in 100 TB hot paths."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView("ord_r9r")
    return spark.sql(
        """
        SELECT reflect('java.lang.Integer', 'toHexString',
                       CAST(o_orderkey % 4096 AS INT)) AS hex_code,
               java_method('java.lang.Long', 'toBinaryString',
                           o_orderkey % 16) AS bin_code,
               count(*) AS n
        FROM ord_r9r WHERE o_orderkey < 5000
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )


# --------------------------------------------------------------------
# from_csv / to_csv / schema_of_csv expressions
# --------------------------------------------------------------------


@query(
    "from_csv_expressions",
    oracle=f"""
    SELECT o_orderpriority AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS cents,
           'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>'
               AS inferred_schema
    FROM orders WHERE o_orderkey < 3000
    GROUP BY p ORDER BY p
    """,
)
def from_csv_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as an EXPRESSION (not a source): to_csv(struct) serializes
    each row to one line, from_csv parses it back under an explicit
    DDL schema, and the parsed fields drive the aggregation — value
    parity vs the raw columns proves the codec round-trips. Plus the
    schema_of_csv inference surface as a constant. This is the scale
    path for embedded-CSV columns (a string field holding CSV inside
    a bigger record): parse in the JVM row-by-row, never re-read."""
    o = Catalog(spark, sf_dir).orders
    lines = o.where(F.col("o_orderkey") < 3000).select(
        F.to_csv(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderpriority").alias("p"),
                F.expr(_CENTS).alias("c"),
            )
        ).alias("line")
    )
    parsed = lines.select(
        F.from_csv(
            F.col("line"), "k BIGINT, p STRING, c BIGINT"
        ).alias("r")
    )
    return (
        parsed.groupBy(F.col("r.p").alias("p"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("r.c").alias("cents"),
        )
        .withColumn(
            "inferred_schema",
            F.schema_of_csv(F.lit("7,abc,1.5")),
        )
        .orderBy("p")
    )


# --------------------------------------------------------------------
# DEFAULT column values
# --------------------------------------------------------------------


@query(
    "insert_defaults_surface",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS pri, 'defaulted' AS flag,
             CAST(0 AS BIGINT) AS cents
      FROM orders WHERE o_custkey % 10 = 3),
    extra AS (
      SELECT 'NONE' AS pri, 'explicit' AS flag,
             CAST(0 AS BIGINT) AS cents),
    un AS (
      SELECT pri, flag, cents FROM base
      UNION ALL SELECT pri, flag, cents FROM extra)
    SELECT pri, flag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM un GROUP BY pri, flag ORDER BY pri, flag
    """,
)
def insert_defaults_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column DEFAULT values (ANSI / Hive 4 surface): a partial-column
    INSERT fills omitted columns from their declared defaults, and the
    DEFAULT keyword is usable positionally in VALUES. Defaults are
    resolved at analysis time into literals — zero runtime cost at any
    scale."""
    fresh_managed_table(spark, "def9_orders")
    spark.sql(
        "CREATE TABLE def9_orders ("
        " k BIGINT,"
        " pri STRING DEFAULT 'NONE',"
        " flag STRING DEFAULT 'defaulted',"
        " cents BIGINT DEFAULT 0) USING parquet"
    )
    Catalog(spark, sf_dir).orders.createOrReplaceTempView("ord_r9d")
    spark.sql(
        "INSERT INTO def9_orders (k, pri) "
        "SELECT o_orderkey, o_orderpriority FROM ord_r9d "
        "WHERE o_custkey % 10 = 3"
    )
    spark.sql(
        "INSERT INTO def9_orders VALUES (-1, DEFAULT, 'explicit', DEFAULT)"
    )
    return spark.sql(
        """
        SELECT pri, flag, count(*) AS n, sum(cents) AS sum_cents
        FROM def9_orders GROUP BY pri, flag ORDER BY pri, flag
        """
    )


# --------------------------------------------------------------------
# column / table COMMENT DDL
# --------------------------------------------------------------------


@query(
    "column_comments_ddl",
    oracle="""
    WITH meta AS (
      SELECT * FROM (VALUES
        ('col:n_nationkey', 'int|surrogate key'),
        ('col:n_name', 'string|nation name'),
        ('table_comment', 'nation dim')) AS t(item, val)),
    cnt AS (
      SELECT 'n_rows' AS item, CAST(count(*) AS VARCHAR) AS val
      FROM nation)
    SELECT item, val FROM meta
    UNION ALL SELECT item, val FROM cnt
    ORDER BY item
    """,
)
def column_comments_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMENT metadata channel (Hive DDL parity): column comments at
    CREATE time, added post-hoc via ALTER TABLE ... ALTER COLUMN
    COMMENT, and the table-level COMMENT — all surfaced back through
    DESCRIBE. Comments live purely in the catalog; the query proves
    the round trip by re-reading them from DESCRIBE output rather
    than echoing the DDL strings."""
    fresh_managed_table(spark, "cmt9_nation")
    spark.sql(
        "CREATE TABLE cmt9_nation ("
        " n_nationkey INT COMMENT 'surrogate key',"
        " n_name STRING) USING parquet COMMENT 'nation dim'"
    )
    spark.sql(
        "ALTER TABLE cmt9_nation ALTER COLUMN n_name "
        "COMMENT 'nation name'"
    )
    n = Catalog(spark, sf_dir).nation
    n.select("n_nationkey", "n_name").createOrReplaceTempView(
        "nat_r9c"
    )
    spark.sql("INSERT INTO cmt9_nation SELECT * FROM nat_r9c")
    desc = {
        r.col_name: (r.data_type, r.comment)
        for r in spark.sql("DESCRIBE TABLE cmt9_nation").collect()
        if r.col_name and not r.col_name.startswith("#")
    }
    tbl_comment = ""
    for r in spark.sql("DESCRIBE TABLE EXTENDED cmt9_nation").collect():
        if r.col_name.strip() == "Comment":
            tbl_comment = r.data_type.strip()
    n_rows = spark.table("cmt9_nation").count()
    rows = [
        (
            f"col:{c}",
            f"{desc[c][0]}|{desc[c][1]}",
        )
        for c in ("n_nationkey", "n_name")
    ] + [("table_comment", tbl_comment), ("n_rows", str(n_rows))]
    return spark.createDataFrame(
        rows, "item string, val string"
    ).orderBy("item")


# --------------------------------------------------------------------
# null partition (__HIVE_DEFAULT_PARTITION__) round trip
# --------------------------------------------------------------------


@query(
    "null_partition_handling",
    oracle=f"""
    SELECT CASE WHEN o_custkey % 7 = 0 THEN NULL
                ELSE 'b' || CAST(o_custkey % 3 AS VARCHAR) END
               AS pbucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def null_partition_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL partition values round-trip through Hive's
    ``__HIVE_DEFAULT_PARTITION__`` directory: rows whose partition
    column is NULL land in the default partition on write and read
    back as REAL SQL NULLs (not the sentinel string). At 100 TB the
    null partition is a skew hazard — it concentrates every
    unclassified row in one directory — so reading it back faithfully
    (for an explicit IS NULL repair pass) is the graded behavior.
    Partition pruning on IS NULL is asserted in tests/test_round9.py."""
    o = Catalog(spark, sf_dir).orders
    path = scratch_path("nullpart_orders_r9", sf_dir)
    (
        o.withColumn(
            "pbucket",
            F.when(F.col("o_custkey") % 7 == 0, F.lit(None)).otherwise(
                F.concat(
                    F.lit("b"), (F.col("o_custkey") % 3).cast("string")
                )
            ),
        )
        .write.mode("overwrite")
        .partitionBy("pbucket")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("pbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_CENTS)).alias("cents"),
        )
        .orderBy("pbucket")
    )


# --------------------------------------------------------------------
# parquet bloom-filter write options
# --------------------------------------------------------------------


@query(
    "parquet_bloom_filter_write",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS cents,
           true AS bloom_overhead_positive
    FROM orders
    """,
)
def parquet_bloom_filter_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet bloom-filter write path: the per-column
    ``parquet.bloom.filter.enabled#col`` / ``expected.ndv#col`` writer
    options (the Hive/Spark point-lookup accelerator — at 100 TB a
    bloom on the probe key lets the scanner skip whole row groups on
    equality predicates without reading the dictionary). pyarrow 16 /
    DuckDB 1.0 can't introspect the bloom header, so presence is
    proven by the byte overhead: an otherwise-identical write WITHOUT
    the option must be strictly smaller. Value parity of the
    read-back proves the data pages are untouched. NOTE (measured on
    this parquet-mr build): the per-column ``enabled#col`` toggle is
    ignored by the DataFrame writer — the working recipe is the
    GLOBAL ``parquet.bloom.filter.enabled`` plus per-column
    ``expected.ndv#col`` sizing and a ``max.bytes`` cap (without the
    cap, default-NDV blooms add ~2 MB per column chunk)."""
    o = Catalog(spark, sf_dir).orders.repartition(2, "o_orderkey")
    p_on = scratch_path("bloom_on_r9", sf_dir)
    p_off = scratch_path("bloom_off_r9", sf_dir)
    (
        o.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
        .option("parquet.bloom.filter.max.bytes", "65536")
        .parquet(p_on)
    )
    o.write.mode("overwrite").parquet(p_off)

    def _bytes(root: str) -> int:
        tot = 0
        for d, _, fs in os.walk(root):
            tot += sum(
                os.path.getsize(os.path.join(d, f))
                for f in fs
                if f.endswith(".parquet")
            )
        return tot

    overhead = _bytes(p_on) - _bytes(p_off)
    back = spark.read.parquet(p_on)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_CENTS)).alias("cents"),
        F.lit(overhead > 0).alias("bloom_overhead_positive"),
    )


# --------------------------------------------------------------------
# text source: lineSep / wholetext options
# --------------------------------------------------------------------


@query(
    "text_source_options",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(strlen(text)) AS BIGINT) AS sum_len,
           CAST(1 AS BIGINT) AS n_wholetext_rows,
           CAST(sum(strlen(text)) + count(*) AS BIGINT)
               AS wholetext_len
    FROM documents
    """,
)
def text_source_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text source option matrix: write the corpus with a custom
    record separator (0x1E, safe for newline-bearing text), read it
    back split on that separator, and read the same file with
    ``wholetext`` (one row per FILE — the mode for whole-document
    formats). The writer terminates every record with the separator,
    so wholetext length = sum of line lengths + one separator per
    line; coalesce(1) pins the wholetext row count. At scale,
    wholetext rows are unsplittable — the plumbing exists for
    doc-per-file corpora, not for the hot path."""
    docs = Catalog(spark, sf_dir).documents
    path = scratch_path("text_sep_docs_r9", sf_dir)
    (
        docs.select("text")
        .coalesce(1)
        .write.mode("overwrite")
        .option("lineSep", "\x1e")
        .text(path)
    )
    lines = spark.read.option("lineSep", "\x1e").text(path)
    whole = spark.read.option("wholetext", True).text(path)
    lm = lines.where(F.length("value") > 0).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("sum_len"),
    )
    wm = whole.agg(
        F.count(F.lit(1)).alias("n_wholetext_rows"),
        F.sum(F.length("value")).alias("wholetext_len"),
    )
    return lm.crossJoin(wm)


# --------------------------------------------------------------------
# sequence / generate_series parity
# --------------------------------------------------------------------


@query(
    "sequence_generate_series",
    oracle="""
    SELECT CAST(k AS BIGINT) AS k,
           array_to_string(generate_series(1, k * 4, k), ',') AS up,
           array_to_string(generate_series(k * 4, 1, -k), ',') AS down,
           array_to_string(
             list_transform(
               generate_series(DATE '2024-01-01', DATE '2024-03-01',
                               to_days(CAST(k * 7 AS INTEGER))),
               x -> strftime(x, '%Y-%m-%d')), ',') AS dates
    FROM range(1, 7) t(k) ORDER BY k
    """,
)
def sequence_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence() ≡ generate_series parity: inclusive integer ranges
    with positive and negative strides plus DATE ranges with interval
    strides — the lateral-spine generator behind gap-filling and date
    scaffolds. Generated per-row in the JVM (no driver loop), so a
    100 TB date spine is just explode(sequence(...)) over
    distributed bounds."""
    return (
        spark.range(1, 7)
        .select(F.col("id").alias("k"))
        .select(
            "k",
            F.concat_ws(
                ",", F.expr("sequence(1, k * 4, k)")
            ).alias("up"),
            F.concat_ws(
                ",", F.expr("sequence(k * 4, 1, -k)")
            ).alias("down"),
            F.concat_ws(
                ",",
                F.expr(
                    "transform(sequence(DATE'2024-01-01', "
                    "DATE'2024-03-01', make_interval(0,0,0,k*7,0,0,0)),"
                    " x -> date_format(x, 'yyyy-MM-dd'))"
                ),
            ).alias("dates"),
        )
        .orderBy("k")
    )
