"""SURVEY.md §2 round-9 seventh wave (queued for the r10 window):
warehouse calendar / allocation / selection operators plus two
detector-style scans:

- ``fiscal_calendar_445`` — 4-4-5 fiscal calendar mapping (Feb-start
  FY) in pure integer date arithmetic; revenue per fiscal period.
- ``largest_remainder_allocation`` — integer proportional allocation
  (Hamilton's method): parts sum EXACTLY to the budget, remainders
  ranked deterministically.
- ``skyline_pareto_front`` — 2-D skyline (non-dominated points) per
  brand via the sort + running-min formulation: O(n log n), no pair
  join anywhere.
- ``budget_greedy_selection`` — training-data selection under a token
  budget: rank by quality, take while the cumulative token count
  fits — the knapsack-greedy every data-mixture pipeline runs.
- ``creditcard_luhn_scan`` — PII detector for card numbers with Luhn
  validation (regex candidates → checksum verdict), injected
  deterministically with both valid and corrupted numbers.
- ``winsorized_stats_clip`` — winsorized mean per group with EXACT
  integer clipping bounds (rank-based order statistics, not
  interpolated quantiles), so the clipped sum is order-independent.
- ``histogram2d_bins`` — 2-D histogram (price × size cells) — the
  joint-distribution profile behind the 1-D histogram family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# 4-4-5 fiscal calendar
# --------------------------------------------------------------------

_FISCAL_ORACLE = f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS od, {_CENTS} AS cents
  FROM orders),
fy AS (
  SELECT od, cents,
         CASE WHEN month(od) >= 2 THEN year(od) + 1
              ELSE year(od) END AS fyear
  FROM d),
wk AS (
  SELECT fyear, cents,
         CAST(od - make_date(fyear - 1, 2, 1) AS BIGINT) // 7 AS w
  FROM fy),
per AS (
  SELECT fyear, cents,
         CASE WHEN w >= 52 THEN 12
              ELSE (w // 13) * 3
                   + CASE WHEN w % 13 < 4 THEN 1
                          WHEN w % 13 < 8 THEN 2 ELSE 3 END
         END AS period
  FROM wk)
SELECT fyear, CAST(period AS BIGINT) AS period,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents
FROM per GROUP BY fyear, period ORDER BY fyear, period
"""


@query("fiscal_calendar_445", oracle=_FISCAL_ORACLE)
def fiscal_calendar_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar (retail standard): fiscal year starts
    Feb 1, each quarter is 4+4+5 weeks, week 53 folds into period 12.
    The whole mapping is integer date arithmetic (days since FY
    start div 7, then the 4-4-5 CASE) — no calendar UDF, so it
    stays inside codegen and pushes through to any engine. Revenue
    rolled up per fiscal period."""
    o = Catalog(spark, sf_dir).orders
    d = o.select(
        F.to_date("o_orderdate").alias("od"),
        F.expr(_CENTS).alias("cents"),
    )
    fy = d.select(
        "od",
        "cents",
        F.expr(
            "CASE WHEN month(od) >= 2 THEN year(od) + 1"
            " ELSE year(od) END"
        ).alias("fyear"),
    )
    wk = fy.select(
        "fyear",
        "cents",
        F.expr(
            "CAST(datediff(od, make_date(fyear - 1, 2, 1)) AS BIGINT)"
            " div 7"
        ).alias("w"),
    )
    per = wk.select(
        "fyear",
        "cents",
        F.expr(
            "CAST(CASE WHEN w >= 52 THEN 12"
            " ELSE (w div 13) * 3"
            "      + CASE WHEN w % 13 < 4 THEN 1"
            "             WHEN w % 13 < 8 THEN 2 ELSE 3 END"
            " END AS BIGINT)"
        ).alias("period"),
    )
    return (
        per.groupBy("fyear", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("fyear", "period")
    )


# --------------------------------------------------------------------
# largest-remainder integer allocation
# --------------------------------------------------------------------

_ALLOC_BUDGET = 10000

_ALLOC_ORACLE = f"""
WITH g AS (
  SELECT o_orderpriority AS pri,
         CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY pri),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM g),
quota AS (
  SELECT pri, cents,
         cents * {_ALLOC_BUDGET} // tot.t AS base,
         cents * {_ALLOC_BUDGET} % tot.t AS rem
  FROM g, tot),
leftover AS (
  SELECT CAST({_ALLOC_BUDGET} - sum(base) AS BIGINT) AS k FROM quota),
ranked AS (
  SELECT pri, cents, base,
         row_number() OVER (ORDER BY rem DESC, pri) AS rr
  FROM quota)
SELECT pri, cents,
       CAST(base + CASE WHEN rr <= leftover.k THEN 1 ELSE 0 END
            AS BIGINT) AS allocation
FROM ranked, leftover ORDER BY pri
"""


@query("largest_remainder_allocation", oracle=_ALLOC_ORACLE)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder allocation: split an integer budget
    (10000 units) across groups proportional to revenue so the parts
    sum EXACTLY to the budget (floor quotas + one extra unit to the
    largest remainders, deterministic tiebreak). The float way
    (round(share·B)) neither sums to B nor replays across engines;
    this is the integer idiom ETL uses for invoice/prorate splits.
    All quotas and remainders exact int64."""
    o = Catalog(spark, sf_dir).orders
    # r12 scan-count fix: the total, leftover and ranked branches each
    # re-ran the priority rollup from parquet (4 scans measured); the
    # 5-row group table is checkpointed once
    g = (
        o.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
        .localCheckpoint()
    )
    tot = g.agg(F.sum("cents").cast("long").alias("t"))
    # r13 subtree-sweep fix: leftover and ranked both re-derived the
    # quota rows (re-broadcasting the total). Five rows — checkpoint.
    quota = g.crossJoin(B(tot)).select(
        "pri",
        "cents",
        F.expr(f"cents * {_ALLOC_BUDGET} div t").alias("base"),
        F.expr(f"cents * {_ALLOC_BUDGET} % t").alias("rem"),
    ).localCheckpoint()
    leftover = quota.agg(
        F.expr(
            f"CAST({_ALLOC_BUDGET} - sum(base) AS BIGINT)"
        ).alias("k")
    )
    ranked = quota.select(
        "pri",
        "cents",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("pri")))
        .alias("rr"),
    )
    return (
        ranked.crossJoin(B(leftover))
        .select(
            "pri",
            "cents",
            F.expr(
                "CAST(base + CASE WHEN rr <= k THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("allocation"),
        )
        .orderBy("pri")
    )


# --------------------------------------------------------------------
# 2-D skyline (Pareto front)
# --------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT p_brand, CAST(p_size AS BIGINT) AS size,
         CAST(round(min(p_retailprice) * 100) AS BIGINT) AS cents
  FROM part GROUP BY p_brand, p_size),
runmin AS (
  SELECT p_brand, size, cents,
         min(cents) OVER (PARTITION BY p_brand ORDER BY size
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_min
  FROM pts)
SELECT p_brand, size, cents
FROM runmin
WHERE prev_min IS NULL OR cents < prev_min
ORDER BY p_brand, size
"""


@query("skyline_pareto_front", oracle=_SKYLINE_ORACLE)
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto-front operator (minimize size AND price, per
    brand): a point survives iff nothing else is ≤ on both axes with
    one strict. In 2-D the quadratic dominance join collapses to
    sort + running-min — keep the cheapest point per size, then keep
    sizes whose price beats every smaller size's minimum (a window
    over the per-(brand,size) rollup). O(n log n) with no pair join:
    THE scale formulation; the naive anti-join is rows² and dies at
    100 TB. Exact integer cents, deterministic everywhere."""
    p = Catalog(spark, sf_dir).part
    pts = p.groupBy(
        "p_brand", F.col("p_size").cast("long").alias("size")
    ).agg(
        F.expr(
            "CAST(round(min(p_retailprice) * 100) AS BIGINT)"
        ).alias("cents")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("size")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runmin = pts.select(
        "p_brand", "size", "cents", F.min("cents").over(w).alias("pm")
    )
    return (
        runmin.where(F.col("pm").isNull() | (F.col("cents") < F.col("pm")))
        .select("p_brand", "size", "cents")
        .orderBy("p_brand", "size")
    )


# --------------------------------------------------------------------
# token-budget greedy selection
# --------------------------------------------------------------------

_BUDGET_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS toks,
         len(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> '')))
           * 1000
           // len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS score
  FROM documents),
tot AS (SELECT CAST(sum(toks) AS BIGINT) AS t FROM scored),
ranked AS (
  SELECT doc_id, lang, toks, score,
         sum(toks) OVER (ORDER BY score DESC, doc_id) AS cum
  FROM scored),
sel AS (
  SELECT lang, toks, score
  FROM ranked, tot WHERE cum * 2 <= tot.t)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(toks) AS BIGINT) AS tokens_selected,
       CAST(min(score) AS BIGINT) AS min_score_admitted
FROM sel GROUP BY lang ORDER BY lang
"""


@query("budget_greedy_selection", oracle=_BUDGET_ORACLE)
def budget_greedy_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data selection under a token budget (half the corpus):
    rank documents by a quality score (distinct-token ratio in exact
    permille), admit greedily while the cumulative token count stays
    within budget — the knapsack-greedy every mixture pipeline runs
    before training. The admission predicate is exact integer
    (cum·2 ≤ total: never a float budget fraction), the ranking
    totally ordered by (score, doc_id), and the cumulative sum one
    window over per-document rollups."""
    d = Catalog(spark, sf_dir).documents
    toks = F.expr("filter(split(text, ' '), x -> x != '')")
    scored = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("toks"),
        (
            F.size(F.array_distinct(toks)).cast("long") * 1000
        ).alias("_num"),
    ).withColumn(
        "score", F.expr("_num div toks")
    )
    tot = scored.agg(F.sum("toks").cast("long").alias("t"))
    ranked = scored.select(
        "doc_id",
        "lang",
        "toks",
        "score",
        F.sum("toks")
        .over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        )
        .alias("cum"),
    )
    sel = ranked.crossJoin(B(tot)).where(
        F.col("cum") * 2 <= F.col("t")
    )
    return (
        sel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.sum("toks").cast("long").alias("tokens_selected"),
            F.min("score").cast("long").alias("min_score_admitted"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------
# credit-card Luhn scan
# --------------------------------------------------------------------

_CC_ORACLE = """
WITH base AS (
  SELECT doc_id, source, text,
         '4' || lpad(CAST(doc_id * 37 % 100000000000000 AS VARCHAR),
                     14, '0') AS b15
  FROM documents),
luhn AS (
  SELECT doc_id, source, text, b15,
         CAST(
           list_reduce(
             list_transform(
               string_split(reverse(b15), ''),
               (c, i) -> CASE WHEN i % 2 = 1
                 THEN CASE WHEN CAST(c AS INT) * 2 > 9
                           THEN CAST(c AS INT) * 2 - 9
                           ELSE CAST(c AS INT) * 2 END
                 ELSE CAST(c AS INT) END),
             (a, b) -> a + b) AS BIGINT) AS s
  FROM base),
injected AS (
  SELECT source,
         CASE WHEN doc_id % 5 = 0
                THEN text || ' card ' || b15
                     || CAST((10 - s % 10) % 10 AS VARCHAR)
              WHEN doc_id % 5 = 1
                THEN text || ' card ' || b15
                     || CAST(((10 - s % 10) % 10 + 5) % 10 AS VARCHAR)
              ELSE text END AS t2
  FROM luhn),
scanned AS (
  SELECT source, t2,
         regexp_extract(t2, '4[0-9]{15}') AS cand
  FROM injected),
verd AS (
  SELECT source,
         CASE WHEN cand <> '' THEN 1 ELSE 0 END AS found,
         CASE WHEN cand <> '' AND
           list_reduce(
             list_transform(
               string_split(reverse(cand), ''),
               (c, i) -> CASE WHEN i % 2 = 0
                 THEN CASE WHEN CAST(c AS INT) * 2 > 9
                           THEN CAST(c AS INT) * 2 - 9
                           ELSE CAST(c AS INT) * 2 END
                 ELSE CAST(c AS INT) END),
             (a, b) -> a + b) % 10 = 0
          THEN 1 ELSE 0 END AS valid
  FROM scanned)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(found) AS BIGINT) AS n_candidates,
       CAST(sum(valid) AS BIGINT) AS n_luhn_valid
FROM verd GROUP BY source ORDER BY source
"""


@query("creditcard_luhn_scan", oracle=_CC_ORACLE)
def creditcard_luhn_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan for card numbers: regex candidates ('4' + 15 digits)
    validated with the Luhn checksum — the validation step is what
    separates a card detector from a number detector (phone/ID
    digit runs fail Luhn 90% of the time). The corpus carries none,
    so numbers are INJECTED deterministically: every 5th doc gets a
    VALID card (check digit computed from the Luhn fold), the next
    5th gets the same number with the check digit shifted by 5
    (never valid). Spark validates with the luhn_check builtin; the
    oracle replays the fold with list_reduce — indices 1-based in
    DuckDB, so the doubled positions flip between the b15 fold
    (building, odd i) and the 16-digit fold (validating, even i)."""
    d = Catalog(spark, sf_dir).documents
    base = d.select(
        "doc_id",
        "source",
        "text",
        F.expr(
            "concat('4', lpad(CAST(doc_id * 37 % 100000000000000"
            " AS STRING), 14, '0'))"
        ).alias("b15"),
    )
    # Luhn sum of the 15-digit base, doubling from the rightmost
    # digit (position 1 of the reversed string)
    luhn_sum_b15 = (
        "aggregate(transform(split(reverse(b15), ''),"
        " (c, i) -> CASE WHEN i % 2 = 0"
        "   THEN CASE WHEN CAST(c AS INT) * 2 > 9"
        "        THEN CAST(c AS INT) * 2 - 9"
        "        ELSE CAST(c AS INT) * 2 END"
        "   ELSE CAST(c AS INT) END),"
        " 0, (a, b) -> a + b)"
    )
    injected = base.select(
        "source",
        F.expr(
            f"CASE WHEN doc_id % 5 = 0"
            f" THEN concat(text, ' card ', b15,"
            f"   CAST((10 - {luhn_sum_b15} % 10) % 10 AS STRING))"
            f" WHEN doc_id % 5 = 1"
            f" THEN concat(text, ' card ', b15,"
            f"   CAST(((10 - {luhn_sum_b15} % 10) % 10 + 5) % 10"
            f"        AS STRING))"
            f" ELSE text END"
        ).alias("t2"),
    )
    scanned = injected.select(
        "source",
        F.regexp_extract("t2", "4[0-9]{15}", 0).alias("cand"),
    )
    verd = scanned.select(
        "source",
        F.when(F.col("cand") != "", 1).otherwise(0).alias("found"),
        F.when(
            (F.col("cand") != "") & F.expr("luhn_check(cand)"), 1
        )
        .otherwise(0)
        .alias("valid"),
    )
    return (
        verd.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("found").cast("long").alias("n_candidates"),
            F.sum("valid").cast("long").alias("n_luhn_valid"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------
# exact winsorized stats
# --------------------------------------------------------------------

_WINSOR_ORACLE = f"""
WITH v AS (
  SELECT o_orderpriority AS pri, {_CENTS} AS cents FROM orders),
r AS (
  SELECT pri, cents,
         row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn,
         CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n
  FROM v),
bounds AS (
  SELECT pri,
         max(CASE WHEN rn * 20 <= n THEN cents END) AS lo_cand,
         min(CASE WHEN (n - rn + 1) * 20 <= n THEN cents END)
             AS hi_cand,
         min(cents) AS mn, max(cents) AS mx
  FROM r GROUP BY pri),
b2 AS (
  SELECT pri, coalesce(lo_cand, mn) AS lo, coalesce(hi_cand, mx) AS hi
  FROM bounds),
clipped AS (
  SELECT v.pri,
         CASE WHEN cents < lo THEN lo
              WHEN cents > hi THEN hi ELSE cents END AS c
  FROM v JOIN b2 ON v.pri = b2.pri)
SELECT pri, CAST(count(*) AS BIGINT) AS n,
       CAST(min(c) AS BIGINT) AS lo_bound,
       CAST(max(c) AS BIGINT) AS hi_bound,
       CAST(sum(c) * 1000 // count(*) AS BIGINT)
           AS winsor_mean_milli
FROM clipped GROUP BY pri ORDER BY pri
"""


@query("winsorized_stats_clip", oracle=_WINSOR_ORACLE)
def winsorized_stats_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group with EXACT bounds: the clip levels
    are rank-based order statistics (the largest value in the bottom
    5% by count, the smallest in the top 5%) — actual members, never
    interpolated floats — so the clipped values stay integers and
    the winsorized mean is an exact integer ratio with no float
    accumulation (the failure mode of clip-at-interpolated-quantile
    implementations). One window pass for ranks, one broadcast-bound
    join, one aggregation."""
    o = Catalog(spark, sf_dir).orders
    v = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.expr(_CENTS).alias("cents"),
    )
    r = v.select(
        "pri",
        "cents",
        F.row_number()
        .over(Window.partitionBy("pri").orderBy("cents"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("pri"))
        .cast("long")
        .alias("n"),
    )
    bounds = r.groupBy("pri").agg(
        F.max(
            F.when(F.col("rn") * 20 <= F.col("n"), F.col("cents"))
        ).alias("lo_cand"),
        F.min(
            F.when(
                (F.col("n") - F.col("rn") + 1) * 20 <= F.col("n"),
                F.col("cents"),
            )
        ).alias("hi_cand"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    )
    b2 = bounds.select(
        "pri",
        F.coalesce("lo_cand", "mn").alias("lo"),
        F.coalesce("hi_cand", "mx").alias("hi"),
    )
    clipped = v.join(B(b2), "pri").select(
        "pri",
        F.expr(
            "CASE WHEN cents < lo THEN lo"
            " WHEN cents > hi THEN hi ELSE cents END"
        ).alias("c"),
    )
    return (
        clipped.groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("c").cast("long").alias("lo_bound"),
            F.max("c").cast("long").alias("hi_bound"),
            F.expr(
                "CAST(sum(c) * 1000 div count(*) AS BIGINT)"
            ).alias("winsor_mean_milli"),
        )
        .orderBy("pri")
    )


# --------------------------------------------------------------------
# 2-D histogram
# --------------------------------------------------------------------

_H2D_ORACLE = """
WITH b AS (
  SELECT CAST(CAST(round(p_retailprice * 100) AS BIGINT)
              // 20000 AS BIGINT) AS price_bin,
         CAST((p_size - 1) // 10 AS BIGINT) AS size_bin
  FROM part)
SELECT price_bin, size_bin,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY price_bin, size_bin
ORDER BY price_bin, size_bin
"""


@query("histogram2d_bins", oracle=_H2D_ORACLE)
def histogram2d_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram of (price, size) — the joint-distribution grid
    behind scatter-density plots and independence checks; bins are
    integer divisions of exact cents / sizes (200-dollar × 10-size
    cells), one aggregation, cell count bounded by the grid."""
    p = Catalog(spark, sf_dir).part
    b = p.select(
        F.expr(
            "CAST(CAST(round(p_retailprice * 100) AS BIGINT)"
            " div 20000 AS BIGINT)"
        ).alias("price_bin"),
        F.expr("CAST((p_size - 1) div 10 AS BIGINT)").alias(
            "size_bin"
        ),
    )
    return (
        b.groupBy("price_bin", "size_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("price_bin", "size_bin")
    )
