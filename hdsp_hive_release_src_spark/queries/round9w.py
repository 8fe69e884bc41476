"""SURVEY.md §2 round-9 twenty-third wave (queued for the r10 window)
— completing the regression-aggregate family and the residual
string/bit/JSON builtin surface:

- ``regr_full_family`` — the five regr_ aggregates the r6 wave left
  uncovered (regr_avgx / regr_avgy / regr_sxx / regr_syy /
  regr_sxy) on a float-order-SAFE sample: both variables are
  integer-valued and the mod-bounded sample keeps every sum of
  squares far below 2^53, so double accumulation is exact in any
  order — the r5 dsir float-order defect class cannot occur.
- ``string_bit_misc_matrix`` — sha1 / crc32 / bit_get /
  shiftrightunsigned (the int64 >>> semantics probed on a negative
  input, replayed via HUGEINT arithmetic) / btrim /
  character_length / ceiling / ucase / json_array_length /
  json_object_keys / map_contains_key on a literal grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: sample modulus: ≈3k lineitem rows at sf0.1 — dollars ≤ 1e5 squared
#: times 3e3 rows ≈ 3e13 < 2^53, so the regr_ sums stay exact-integer
#: doubles at every test scale (order-independent accumulation).
REGR_MOD = 199

_REGR_ORACLE = f"""
WITH s AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 100
              AS DOUBLE) AS y
  FROM lineitem WHERE l_orderkey % {REGR_MOD} = 0)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(regr_avgx(y, x), 4) AS avgx,
       round(regr_avgy(y, x), 4) AS avgy,
       round(regr_sxx(y, x), 2) AS sxx,
       round(regr_syy(y, x), 2) AS syy,
       round(regr_sxy(y, x), 2) AS sxy
FROM s
"""


@query("regr_full_family", oracle=_REGR_ORACLE)
def regr_full_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining SQL:2003 linear-regression aggregates —
    regr_avgx/avgy (means over non-null pairs) and the centered
    second moments regr_sxx/syy/sxy the slope and r² derive from —
    on quantity (x) vs whole-dollar price (y). Float-order safety by
    construction: both variables are integer-valued and the
    mod-{REGR_MOD} sample bounds every sum of squares below 2^53,
    so the double sums are exact integers regardless of partition
    order (the defect class the rounding audit fuzzes). DuckDB ships
    the same aggregates natively — the oracle calls them verbatim."""
    li = Catalog(spark, sf_dir).lineitem
    s = li.where(F.col("l_orderkey") % REGR_MOD == 0).select(
        F.col("l_quantity").cast("double").alias("x"),
        F.expr(
            "cast(cast(round(l_extendedprice * 100) as bigint) div 100"
            " as double)"
        ).alias("y"),
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("regr_avgx(y, x)"), 4).alias("avgx"),
        F.round(F.expr("regr_avgy(y, x)"), 4).alias("avgy"),
        F.round(F.expr("regr_sxx(y, x)"), 2).alias("sxx"),
        F.round(F.expr("regr_syy(y, x)"), 2).alias("syy"),
        F.round(F.expr("regr_sxy(y, x)"), 2).alias("sxy"),
    )


_MISC_ORACLE = """
SELECT 'a9993e364706816aba3e25717850c26c9cd0d89d' AS sha1_abc,
       CAST(891568578 AS BIGINT) AS crc32_abc,
       CAST(1 AS BIGINT) AS bit2_of_13,
       CAST(0 AS BIGINT) AS bit1_of_13,
       CAST(((CAST(-8 AS HUGEINT) + 18446744073709551616) >> 60)
            AS BIGINT) AS sru_neg8_60,
       'hi' AS btrimmed,
       CAST(5 AS BIGINT) AS charlen_accented,
       CAST(5 AS BIGINT) AS ceil_42,
       'AB' AS ucased,
       CAST(json_array_length('[1,2,3]') AS BIGINT) AS jarr_len,
       array_to_string(json_keys('{"a":1,"b":2}'), ',') AS jobj_keys,
       true AS map_has_key,
       false AS map_lacks_key
"""


@query("string_bit_misc_matrix", oracle=_MISC_ORACLE)
def string_bit_misc_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The residual builtin odds-and-ends: sha1 (DuckDB lacks it —
    the RFC 3174 digest of 'abc' is pinned literally), crc32,
    bit_get at set and unset positions, shiftrightunsigned probed on
    a NEGATIVE int64 (the >>> semantics: the oracle replays it as
    (x + 2^64) >> n in HUGEINT), btrim, character_length on an
    accented string (codepoints, not bytes), ceiling, ucase,
    json_array_length / json_object_keys (DuckDB: json_keys), and
    map_contains_key both ways. Constant-folded literal grid."""
    return spark.sql(
        """
        SELECT sha1('abc') AS sha1_abc,
               CAST(crc32('abc') AS BIGINT) AS crc32_abc,
               CAST(bit_get(13, 2) AS BIGINT) AS bit2_of_13,
               CAST(bit_get(13, 1) AS BIGINT) AS bit1_of_13,
               CAST(shiftrightunsigned(CAST(-8 AS BIGINT), 60)
                    AS BIGINT) AS sru_neg8_60,
               btrim('  hi  ') AS btrimmed,
               CAST(character_length('héllo') AS BIGINT)
                   AS charlen_accented,
               CAST(ceiling(4.2) AS BIGINT) AS ceil_42,
               ucase('ab') AS ucased,
               CAST(json_array_length('[1,2,3]') AS BIGINT)
                   AS jarr_len,
               concat_ws(',', json_object_keys('{"a":1,"b":2}'))
                   AS jobj_keys,
               map_contains_key(map(1, 'x'), 1) AS map_has_key,
               map_contains_key(map(1, 'x'), 2) AS map_lacks_key
        """
    )
