"""SURVEY.md §2 round-9 twenty-second wave (queued for the r10
window) — the remaining ANSI error-safe conversion surface:

- ``try_conversion_matrix`` — try_to_date / try_to_number / try_mod
  / try_parse_url / try_url_decode / try_to_binary NULL-on-error
  semantics, the UTF-8 validation family (is_valid_utf8 /
  make_valid_utf8), the null-dispatch shorthands (equal_null, nvl2,
  ifnull, nullifzero, zeroifnull) and typeof — probed on a fixed
  good/bad input grid; the oracle replays every cell with computed
  or literal expectations (DuckDB lacks parse_url/make_valid_utf8,
  so those cells pin Spark against the documented value — the NULL
  pattern and repairs ARE the verified output). The all-NULL typed
  DATE probe is emitted as IS NULL: a NULL date renders None from
  Spark but NaT from DuckDB pandas, which the driver canon treats
  as different cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.registry import query

_TRYCONV_ORACLE = """
SELECT
  true AS bad_date_is_null,
  TRY_CAST('2024-02-29' AS DATE) AS ok_date,
  CAST(TRY_CAST(replace('12,345', ',', '') AS BIGINT) AS BIGINT)
      AS ok_num,
  CAST(NULL AS BIGINT) AS bad_num,
  CAST(NULL AS BIGINT) AS mod_zero,
  CAST(10 % 3 AS BIGINT) AS mod_three,
  'spark.apache.org' AS url_host,
  '/path' AS url_path,
  CAST(NULL AS VARCHAR) AS bad_url_host,
  'a b!' AS url_decoded,
  CAST(NULL AS VARCHAR) AS bad_url_decoded,
  'deadbeef' AS hex_roundtrip,
  CAST(NULL AS VARCHAR) AS bad_hex,
  true AS utf8_valid,
  false AS utf8_invalid,
  'A' || chr(65533) || 'B' AS utf8_repaired,
  true AS eq_null_both,
  false AS eq_null_one,
  'a' AS nvl2_notnull,
  'b' AS nvl2_null,
  CAST(7 AS BIGINT) AS ifnull_v,
  CAST(NULL AS BIGINT) AS nullifzero_v,
  CAST(0 AS BIGINT) AS zeroifnull_v,
  'array<int>' AS typeof_arr
"""


@query("try_conversion_matrix", oracle=_TRYCONV_ORACLE)
def try_conversion_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The error-safe conversion matrix: every ``try_`` conversion
    builtin outside arithmetic (date, number-with-format, mod,
    parse_url, url_decode, to_binary) probed with one good and one
    bad input — NULL-on-error instead of job failure is the single
    most load-bearing semantic for 100 TB ingest (one malformed row
    must never kill a 1000-executor job) — plus the UTF-8 validation
    family (is_valid_utf8 / make_valid_utf8 repairs a broken byte to
    U+FFFD — the text-pipeline pre-clean), the null-dispatch
    shorthands (equal_null / nvl2 / ifnull / nullifzero /
    zeroifnull) and typeof. Constant-folded literal grid; no scan."""
    return spark.sql(
        """
        SELECT
          try_to_date('2024-02-30') IS NULL AS bad_date_is_null,
          try_to_date('2024-02-29') AS ok_date,
          CAST(try_to_number('12,345', '99,999') AS BIGINT)
              AS ok_num,
          CAST(try_to_number('x', '999') AS BIGINT) AS bad_num,
          CAST(try_mod(10, 0) AS BIGINT) AS mod_zero,
          CAST(try_mod(10, 3) AS BIGINT) AS mod_three,
          try_parse_url('https://spark.apache.org/path?q=1', 'HOST')
              AS url_host,
          try_parse_url('https://spark.apache.org/path?q=1', 'PATH')
              AS url_path,
          try_parse_url('not a url', 'HOST') AS bad_url_host,
          try_url_decode('a%20b%21') AS url_decoded,
          try_url_decode('%zz') AS bad_url_decoded,
          lower(hex(try_to_binary('deadbeef', 'hex')))
              AS hex_roundtrip,
          CAST(try_to_binary('xyz!', 'hex') AS STRING) AS bad_hex,
          is_valid_utf8(x'C3A9') AS utf8_valid,
          is_valid_utf8(x'FF') AS utf8_invalid,
          make_valid_utf8(x'41FF42') AS utf8_repaired,
          equal_null(NULL, NULL) AS eq_null_both,
          equal_null(1, NULL) AS eq_null_one,
          nvl2(1, 'a', 'b') AS nvl2_notnull,
          nvl2(NULL, 'a', 'b') AS nvl2_null,
          CAST(ifnull(NULL, 7) AS BIGINT) AS ifnull_v,
          CAST(nullifzero(0) AS BIGINT) AS nullifzero_v,
          CAST(zeroifnull(NULL) AS BIGINT) AS zeroifnull_v,
          typeof(array(1)) AS typeof_arr
        """
    )
