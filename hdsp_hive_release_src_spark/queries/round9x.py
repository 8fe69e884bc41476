"""SURVEY.md §2 round-9 twenty-fourth wave (queued for the r10
window) — the hyperbolic / reciprocal trig builtin family:

- ``hyperbolic_trig_matrix`` — sinh / cosh / tanh / asinh / acosh /
  atanh / atan / atan2 / csc / sec over the fixed 50-value quantity
  grid; DuckDB ships none of the hyperbolics, so the oracle replays
  them through their exp/log identities (agreement far inside the
  6-dp rounding on this bounded domain), and a cosh²−sinh² column
  pins the fundamental identity per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

_HYP_ORACLE = """
WITH g AS (
  SELECT DISTINCT CAST(l_quantity AS DOUBLE) / 10.0 AS x
  FROM lineitem)
SELECT round(x, 1) AS x,
       round((exp(x) - exp(-x)) / 2, 6) AS sinh_v,
       round((exp(x) + exp(-x)) / 2, 6) AS cosh_v,
       round((exp(x) - exp(-x)) / (exp(x) + exp(-x)), 6) AS tanh_v,
       round(ln(x + sqrt(x * x + 1)), 6) AS asinh_v,
       round(ln(x + 1 + sqrt((x + 1) * (x + 1) - 1)), 6) AS acosh_v,
       round(0.5 * ln((1 + 1 / (x + 1)) / (1 - 1 / (x + 1))), 6)
           AS atanh_v,
       round(atan(x), 6) AS atan_v,
       round(atan2(x, 2.0), 6) AS atan2_v,
       round(1 / sin(x), 6) AS csc_v,
       round(1 / cos(x), 6) AS sec_v,
       round(((exp(x) + exp(-x)) / 2) * ((exp(x) + exp(-x)) / 2)
             - ((exp(x) - exp(-x)) / 2) * ((exp(x) - exp(-x)) / 2),
             6) AS identity_v
FROM g ORDER BY x
"""


@query("hyperbolic_trig_matrix", oracle=_HYP_ORACLE)
def hyperbolic_trig_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hyperbolic and reciprocal trig builtins over the fixed
    quantity grid x ∈ {0.1 … 5.0}: sinh/cosh/tanh, the inverse
    hyperbolics (asinh on x, acosh on x+1 ≥ 1.1, atanh on
    1/(x+1) ≤ 0.91 — each probed safely inside its domain), atan,
    two-argument atan2, and csc/sec. DuckDB has none of the
    hyperbolics, so the oracle replays the exp/log identities —
    agreement to 6 dp on this bounded domain is a genuine libm
    cross-check (the same discipline math_funcs_wave2 set with cot).
    The cosh²−sinh² column must round to exactly 1.0 on every row —
    the fundamental identity carried in-band. One distinct over the
    bounded quantity domain; everything else constant-folds
    per-row."""
    li = Catalog(spark, sf_dir).lineitem
    g = li.select(
        (F.col("l_quantity").cast("double") / 10.0).alias("x")
    ).distinct()
    return g.select(
        F.round("x", 1).alias("x"),
        F.round(F.expr("sinh(x)"), 6).alias("sinh_v"),
        F.round(F.expr("cosh(x)"), 6).alias("cosh_v"),
        F.round(F.expr("tanh(x)"), 6).alias("tanh_v"),
        F.round(F.expr("asinh(x)"), 6).alias("asinh_v"),
        F.round(F.expr("acosh(x + 1)"), 6).alias("acosh_v"),
        F.round(F.expr("atanh(1 / (x + 1))"), 6).alias("atanh_v"),
        F.round(F.expr("atan(x)"), 6).alias("atan_v"),
        F.round(F.expr("atan2(x, 2.0d)"), 6).alias("atan2_v"),
        F.round(F.expr("csc(x)"), 6).alias("csc_v"),
        F.round(F.expr("sec(x)"), 6).alias("sec_v"),
        F.round(
            F.expr("cosh(x) * cosh(x) - sinh(x) * sinh(x)"), 6
        ).alias("identity_v"),
    ).orderBy("x")
