"""SURVEY.md §2.2 round-7 function-coverage wave 6 — the last
builtins the registry-wide grep found unexercised:

- ``mask_funcs`` — Hive/Spark ``mask()`` data-redaction (default and
  custom replacement chars). The oracle rebuilds the masking rule
  from character-class regexes, so parity proves the rule, not an
  opaque black box.
- ``sentences_tokenize`` — the Hive ``sentences()`` UDF (sentence
  boundary split + word tokenization into array<array<string>>),
  exploded to (sentence_idx, tokens) rows over deterministically
  constructed punctuated text.
- ``binary_codec_roundtrip`` — encode/decode, base64/unbase64,
  hex/unhex/to_binary chains with DuckDB computing the same digests
  and codecs independently.
- ``xml_roundtrip`` — Spark 4 to_xml → from_xml → xpath_* over a
  struct built from real rows; DuckDB has no XML type, so the oracle
  checks the round-trip invariant (fields come back unchanged) plus
  the xpath extraction arithmetic.

All pure map-side expressions; no shuffle beyond the final orderBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "mask_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
               'g') AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#',
               'g') AS masked_custom,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS digits_only
    FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
    """,
)
def mask_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mask()`` — the Hive column-redaction builtin (upper→X,
    lower→x, digit→n by default; custom replacement chars per class;
    -1/NULL keeps a class). The oracle reconstructs each masking rule
    from character-class regexes applied in a class-safe order
    (upper, then lower, then digits — replacements never fall into a
    later class), so a semantic drift in the builtin breaks parity.
    digits_only masks digits while keeping letters (the '*' digit
    mask with upper/lower passed through)."""
    c = Catalog(spark, sf_dir).customer
    return (
        c.where(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            F.expr("mask(c_name)").alias("masked_default"),
            F.expr("mask(c_name, 'U', 'l', '#')").alias(
                "masked_custom"
            ),
            F.expr("mask(c_name, NULL, NULL, '*')").alias(
                "digits_only"
            ),
        )
        .orderBy("c_custkey")
    )


@query(
    "sentences_tokenize",
    oracle="""
    WITH src AS (
      SELECT p_partkey, p_name,
             upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2))
                 AS t2
      FROM part WHERE p_partkey < 150),
    s AS (
      SELECT p_partkey, 0 AS sentence_idx,
             string_split(p_name, ' ') AS toks FROM src
      UNION ALL
      SELECT p_partkey, 1, [t2] FROM src)
    SELECT p_partkey, sentence_idx,
           CAST(len(toks) AS INT) AS n_tokens,
           array_to_string(toks, '|') AS tokens
    FROM s ORDER BY p_partkey, sentence_idx
    """,
)
def sentences_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ``sentences()`` UDF: sentence-boundary segmentation +
    per-sentence word tokenization (array<array<string>>). Input text
    is constructed deterministically — "<p_name>. <Initcap(p_type)>!"
    (the second sentence MUST start uppercase: the underlying
    BreakIterator merges a lowercase continuation into the previous
    sentence) — so the oracle can replay the expected segmentation
    exactly: two sentences, the first splitting into p_name's words,
    the second the single type token. posexplode gives the sentence index; the
    nested array is flattened to a joined string for the gate's
    pandas canonicalizer."""
    p = Catalog(spark, sf_dir).part
    text = F.concat(
        F.col("p_name"),
        F.lit(". "),
        F.initcap(F.lower("p_type")),
        F.lit("!"),
    )
    return (
        p.where(F.col("p_partkey") < 150)
        .select(
            "p_partkey",
            F.posexplode(F.sentences(text)).alias(
                "sentence_idx", "toks"
            ),
        )
        .select(
            "p_partkey",
            "sentence_idx",
            F.size("toks").alias("n_tokens"),
            F.concat_ws("|", "toks").alias("tokens"),
        )
        .orderBy("p_partkey", "sentence_idx")
    )


@query(
    "binary_codec_roundtrip",
    oracle="""
    SELECT c_custkey,
           c_name AS utf8_roundtrip,
           hex(CAST(c_name AS BLOB)) AS hex_str,
           c_name AS unhex_roundtrip,
           base64(CAST(c_name AS BLOB)) AS b64,
           CAST(strlen(c_name) AS BIGINT) AS n_bytes
    FROM customer WHERE c_custkey < 150 ORDER BY c_custkey
    """,
)
def binary_codec_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary codec chains: encode/decode (UTF-8), hex with DuckDB
    computing the same hex independently, unhex(hex(x)) → original,
    base64 cross-checked against DuckDB's encoder, and octet length.
    to_binary(…, 'hex') exercises the Spark-4 entry point of the
    unhex path. ASCII input keeps byte length == char length, which
    n_bytes pins."""
    c = Catalog(spark, sf_dir).customer
    name_bin = F.encode("c_name", "UTF-8")
    return (
        c.where(F.col("c_custkey") < 150)
        .select(
            "c_custkey",
            F.decode(F.encode("c_name", "UTF-8"), "UTF-8").alias(
                "utf8_roundtrip"
            ),
            F.hex(name_bin).alias("hex_str"),
            F.expr(
                "cast(to_binary(hex(encode(c_name, 'UTF-8')), 'hex')"
                " as string)"
            ).alias("unhex_roundtrip"),
            F.base64(name_bin).alias("b64"),
            F.octet_length("c_name").cast("long").alias("n_bytes"),
        )
        .orderBy("c_custkey")
    )


@query(
    "xml_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_back,
           CAST(o_custkey AS BIGINT) AS custkey_back,
           CAST(o_custkey AS BIGINT) AS xpath_custkey,
           upper(o_orderstatus) = o_orderstatus AS status_is_upper
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 XML functions: to_xml serializes a struct of real
    row fields, from_xml parses it back with an explicit schema, and
    xpath_long re-extracts a field from the raw XML string. DuckDB
    has no XML support, so the oracle checks the invariant — every
    field survives the round-trip unchanged and the xpath extraction
    equals the source column. Map-side only."""
    o = Catalog(spark, sf_dir).orders
    xml = F.to_xml(
        F.struct(
            F.col("o_orderstatus").alias("st"),
            F.col("o_custkey").alias("ck"),
        )
    )
    parsed = F.from_xml(xml, "st STRING, ck BIGINT")
    return (
        o.where(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            parsed.getField("st").alias("status_back"),
            parsed.getField("ck").cast("long").alias("custkey_back"),
            F.expr(
                "xpath_long(to_xml(struct(o_orderstatus AS st,"
                " o_custkey AS ck)), '/ROW/ck')"
            )
            .cast("long")
            .alias("xpath_custkey"),
            (F.upper(parsed.getField("st")) == parsed.getField("st"))
            .alias("status_is_upper"),
        )
        .orderBy("o_orderkey")
    )
