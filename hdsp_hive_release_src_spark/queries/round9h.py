"""SURVEY.md §2 round-9 eighth wave (queued for the r10 window) —
BI / warehouse depth operators:

- ``mom_waterfall_contribution`` — month-over-month revenue delta
  decomposed into per-segment contributions (the waterfall chart's
  data), exact cents.
- ``iso_week_boundaries`` — ISO week/year semantics across year
  boundaries (the Dec-29..Jan-4 trap), weekofyear parity matrix.
- ``interval_union_coverage`` — sweep-line union of overlapping
  intervals: total covered time per user from raw event spans —
  O(n log n) with a running-max window, no interval pair join.
- ``tiered_commission_brackets`` — marginal bracket calculation
  (tax-style tiers) in exact cents via clamped per-bracket spans.
- ``two_hop_reach`` — distinct two-hop neighborhood size per node on
  the trade graph (friend-of-friend reach, self and direct
  neighbors excluded).
- ``neyman_allocation_sampling`` — optimal (Neyman) sample-size
  allocation across strata ∝ n_h·σ_h, integerized with the
  largest-remainder rule so the total sample is exact.
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
# month-over-month waterfall
# --------------------------------------------------------------------

_WF_ORACLE = f"""
WITH m AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
         o_orderpriority AS seg,
         CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2),
lagged AS (
  SELECT mon, seg, cents,
         lag(cents) OVER (PARTITION BY seg ORDER BY mon) AS prev
  FROM m),
delta AS (
  SELECT mon, seg, cents, prev,
         cents - prev AS contribution
  FROM lagged WHERE prev IS NOT NULL),
tot AS (
  SELECT mon, CAST(sum(contribution) AS BIGINT) AS total_delta
  FROM delta GROUP BY mon)
SELECT CAST(delta.mon AS DATE) AS mon, seg,
       CAST(contribution AS BIGINT) AS contribution,
       tot.total_delta
FROM delta JOIN tot ON delta.mon = tot.mon
WHERE year(delta.mon) = 1998
ORDER BY mon, seg
"""


@query("mom_waterfall_contribution", oracle=_WF_ORACLE)
def mom_waterfall_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta decomposed into per-segment
    contributions — the waterfall chart's exact data contract: the
    segment contributions of a month sum to that month's total delta
    (emitted alongside, so the invariant is visible in the output).
    Exact integer cents end to end; one monthly rollup, one lag
    window per segment, restricted to one year to keep the output
    review-sized."""
    o = Catalog(spark, sf_dir).orders
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon_ts"),
        F.col("o_orderpriority").alias("seg"),
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    lagged = m.select(
        F.to_date("mon_ts").alias("mon"),
        "seg",
        "cents",
        F.lag("cents")
        .over(Window.partitionBy("seg").orderBy("mon_ts"))
        .alias("prev"),
    )
    delta = lagged.where(F.col("prev").isNotNull()).select(
        "mon",
        "seg",
        (F.col("cents") - F.col("prev")).alias("contribution"),
    )
    # r13 subtree-sweep fix: the month total was a second aggregate
    # joined back, re-running the rollup + lag window. A
    # month-partitioned window computes it in the same pass.
    return (
        delta.withColumn(
            "total_delta",
            F.sum("contribution")
            .over(Window.partitionBy("mon"))
            .cast("long"),
        )
        .where(F.year("mon") == 1998)
        .select(
            "mon",
            "seg",
            F.col("contribution").cast("long").alias("contribution"),
            "total_delta",
        )
        .orderBy("mon", "seg")
    )


# --------------------------------------------------------------------
# ISO week boundaries
# --------------------------------------------------------------------


@query(
    "iso_week_boundaries",
    oracle="""
    WITH spine AS (
      SELECT CAST(x AS DATE) AS d
      FROM unnest(generate_series(DATE '1996-12-26',
                                  DATE '1997-01-08',
                                  to_days(1))) AS u(x)
      UNION ALL
      SELECT CAST(x AS DATE) AS d
      FROM unnest(generate_series(DATE '1999-12-26',
                                  DATE '2000-01-08',
                                  to_days(1))) AS u(x)
    )
    SELECT d, CAST(weekofyear(d) AS BIGINT) AS iso_week,
           CAST(CASE WHEN month(d) = 1 AND weekofyear(d) > 50
                     THEN year(d) - 1
                     WHEN month(d) = 12 AND weekofyear(d) = 1
                     THEN year(d) + 1
                     ELSE year(d) END AS BIGINT) AS iso_year,
           CAST(isodow(d) AS BIGINT) AS iso_dow
    FROM spine ORDER BY d
    """,
)
def iso_week_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week semantics across year boundaries — the calendar
    trap where Dec 29 can be week 1 of NEXT year and Jan 2 week 53
    of the PREVIOUS one. A fixed two-window date spine (a week-53
    year and a week-52 year) pins weekofyear, the derived ISO year
    (Spark has no yearofweek-with-ISO-semantics builtin — the
    month/week CASE is the standard derivation, mirrored in the
    oracle), and the ISO day-of-week (Monday=1; Spark dayofweek is
    Sunday=1, so the shift formula is part of the surface)."""
    spine = spark.sql(
        """
        SELECT explode(sequence(DATE'1996-12-26', DATE'1997-01-08',
                                interval 1 day)) AS d
        UNION ALL
        SELECT explode(sequence(DATE'1999-12-26', DATE'2000-01-08',
                                interval 1 day)) AS d
        """
    )
    return spine.select(
        "d",
        F.weekofyear("d").cast("long").alias("iso_week"),
        F.expr(
            "CAST(CASE WHEN month(d) = 1 AND weekofyear(d) > 50"
            " THEN year(d) - 1"
            " WHEN month(d) = 12 AND weekofyear(d) = 1"
            " THEN year(d) + 1"
            " ELSE year(d) END AS BIGINT)"
        ).alias("iso_year"),
        F.expr(
            "CAST(((dayofweek(d) + 5) % 7) + 1 AS BIGINT)"
        ).alias("iso_dow"),
    ).orderBy("d")


# --------------------------------------------------------------------
# interval union coverage (sweep line)
# --------------------------------------------------------------------

_COVER_ORACLE = """
WITH spans AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e
  FROM events),
swept AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM spans),
segs AS (
  SELECT user_id,
         CASE WHEN prev_max IS NULL OR prev_max < s
              THEN e - s
              WHEN e > prev_max THEN e - prev_max
              ELSE 0 END AS covered_us,
         CASE WHEN prev_max IS NULL OR prev_max < s
              THEN 1 ELSE 0 END AS new_island
  FROM swept)
SELECT user_id,
       CAST(sum(covered_us) AS BIGINT) AS covered_us,
       CAST(sum(new_island) AS BIGINT) AS n_islands
FROM segs GROUP BY user_id ORDER BY user_id
"""


@query("interval_union_coverage", oracle=_COVER_ORACLE)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of overlapping intervals per user (each event
    opens a 10-minute activity span): the sweep-line formulation —
    sort by start, running max of ends, count only the part of each
    span past the previous maximum. O(n log n) in the user
    partition; the interval PAIR join (interval_overlap_join's
    shape) would be quadratic in the overlap degree and is the
    wrong tool for coverage. Island count falls out of the same
    sweep for free. Exact integer microseconds."""
    e = Catalog(spark, sf_dir).events
    spans = e.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("s"),
        F.expr("unix_micros(ts) + 600000000").alias("e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = spans.select(
        "user_id", "s", "e", F.max("e").over(w).alias("prev_max")
    )
    segs = swept.select(
        "user_id",
        F.expr(
            "CASE WHEN prev_max IS NULL OR prev_max < s THEN e - s"
            " WHEN e > prev_max THEN e - prev_max ELSE 0 END"
        ).alias("covered_us"),
        F.expr(
            "CASE WHEN prev_max IS NULL OR prev_max < s"
            " THEN 1 ELSE 0 END"
        ).alias("new_island"),
    )
    return (
        segs.groupBy("user_id")
        .agg(
            F.sum("covered_us").cast("long").alias("covered_us"),
            F.sum("new_island").cast("long").alias("n_islands"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# tiered marginal commission
# --------------------------------------------------------------------

_TIER_ORACLE = f"""
WITH v AS (SELECT o_orderpriority AS pri, {_CENTS} AS c FROM orders),
per AS (
  SELECT pri, c,
         (CASE WHEN c > 10000000 THEN 10000000 ELSE c END) * 10
         + (CASE WHEN c > 30000000 THEN 20000000
                 WHEN c > 10000000 THEN c - 10000000
                 ELSE 0 END) * 25
         + (CASE WHEN c > 30000000 THEN c - 30000000 ELSE 0 END) * 40
             AS comm_permille
  FROM v)
SELECT pri, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS cents,
       CAST(sum(comm_permille) // 1000 AS BIGINT) AS commission_cents
FROM per GROUP BY pri ORDER BY pri
"""


@query("tiered_commission_brackets", oracle=_TIER_ORACLE)
def tiered_commission_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal bracket calculation (tax-style tiers: 1.0% below
    $100k, 2.5% to $300k, 4.0% above — rates held as integer
    permille): each order's commission is the sum of clamped
    per-bracket spans times the bracket rate, all exact integer
    arithmetic, floored to cents only at the aggregate. The clamp
    formulation (min(c,hi)−lo)⁺ is branch-light codegen — the naive
    rate-lookup-then-multiply computes an AVERAGE rate and gets
    marginal tiers wrong."""
    o = Catalog(spark, sf_dir).orders
    v = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.expr(_CENTS).alias("c"),
    )
    per = v.select(
        "pri",
        "c",
        F.expr(
            "(CASE WHEN c > 10000000 THEN 10000000 ELSE c END) * 10"
            " + (CASE WHEN c > 30000000 THEN 20000000"
            "         WHEN c > 10000000 THEN c - 10000000"
            "         ELSE 0 END) * 25"
            " + (CASE WHEN c > 30000000 THEN c - 30000000"
            "    ELSE 0 END) * 40"
        ).alias("comm_permille"),
    )
    return (
        per.groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("cents"),
            F.expr(
                "CAST(sum(comm_permille) div 1000 AS BIGINT)"
            ).alias("commission_cents"),
        )
        .orderBy("pri")
    )


# --------------------------------------------------------------------
# two-hop reach
# --------------------------------------------------------------------

_HOP_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey < 60),
hop2 AS (
  SELECT a.c AS src, b.c AS reach
  FROM pairs a JOIN pairs b ON a.s = b.s
  WHERE a.c <> b.c)
SELECT src AS custkey,
       CAST(count(DISTINCT reach) AS BIGINT) AS two_hop_reach
FROM hop2 GROUP BY src ORDER BY custkey
"""


@query("two_hop_reach", oracle=_HOP_ORACLE)
def two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop neighborhood size on the bipartite trade graph: how
    many OTHER customers share at least one supplier (the
    friend-of-friend reach that collaborative filtering and risk
    propagation key on). One self-join of the deduplicated edge
    list on the shared supplier + a distinct count — at scale the
    join key (supplier) is the skew hazard, so the edge list is
    distinct-ed BEFORE the join and hub suppliers cap the fan-out."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.orders.where(F.col("o_custkey") < 60)
        .join(cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        # r13 subtree-sweep fix: both self-join sides re-ran the fact
        # join + distinct from parquet. Edge-sized — checkpoint once.
        .localCheckpoint()
    )
    a = pairs.alias("a")
    b = pairs.alias("b")
    hop2 = a.join(
        b,
        (F.col("a.s") == F.col("b.s")) & (F.col("a.c") != F.col("b.c")),
    ).select(F.col("a.c").alias("src"), F.col("b.c").alias("reach"))
    return (
        hop2.groupBy(F.col("src").alias("custkey"))
        .agg(F.countDistinct("reach").cast("long").alias("two_hop_reach"))
        .orderBy("custkey")
    )


# --------------------------------------------------------------------
# Neyman allocation
# --------------------------------------------------------------------

_NEYMAN_TOTAL = 1000

_NEYMAN_ORACLE = f"""
WITH s AS (
  SELECT o_orderpriority AS pri,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CENTS}) AS BIGINT) AS sm,
         sum(CAST({_CENTS} AS HUGEINT) * {_CENTS}) AS sq
  FROM orders GROUP BY pri),
w AS (
  SELECT pri, n,
         n * sqrt((CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n)
                  / (n - 1)) AS weight
  FROM s),
tw AS (
  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_sort(list(weight))),
                     (a, b) -> a + b) AS t
  FROM w),
quota AS (
  SELECT pri, n, weight,
         floor(weight * {_NEYMAN_TOTAL} / tw.t) AS base,
         weight * {_NEYMAN_TOTAL} / tw.t
           - floor(weight * {_NEYMAN_TOTAL} / tw.t) AS rem
  FROM w, tw),
leftover AS (
  SELECT CAST({_NEYMAN_TOTAL} - sum(base) AS BIGINT) AS k FROM quota),
ranked AS (
  SELECT pri, n, base,
         row_number() OVER (ORDER BY rem DESC, pri) AS rr
  FROM quota)
SELECT pri, n AS stratum_n,
       CAST(base + CASE WHEN rr <= leftover.k THEN 1 ELSE 0 END
            AS BIGINT) AS sample_size
FROM ranked, leftover ORDER BY pri
"""


@query("neyman_allocation_sampling", oracle=_NEYMAN_ORACLE)
def neyman_allocation_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) sample allocation: stratum sample sizes
    proportional to n_h·σ_h, which minimizes the estimator variance
    at fixed total n — the statistically-correct upgrade over
    proportional allocation when strata differ in spread. σ_h comes
    from exact integer (n, Σx, Σx²) so both engines derive
    IDENTICAL doubles; the weight total is folded over a SORTED list
    (deterministic order — a bare float sum() could accumulate in
    different orders across engines, the dsir defect class);
    integerization reuses the largest-remainder rule, so the sizes
    sum exactly to the budget of 1000."""
    o = Catalog(spark, sf_dir).orders
    # r12 scan-count fix: the weight total, quota, leftover and rank
    # branches each re-ran the stratum rollup from parquet (4 scans
    # measured); the 5-row stratum table is checkpointed once
    s = (
        o.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr(_CENTS)).cast("long").alias("sm"),
            F.sum(
                (
                    F.expr(_CENTS).cast("decimal(38,0)")
                    * F.expr(_CENTS)
                )
            ).alias("sq"),
        )
        .localCheckpoint()
    )
    w = s.select(
        "pri",
        "n",
        F.expr(
            "n * sqrt((CAST(sq AS DOUBLE)"
            " - CAST(sm AS DOUBLE) * sm / n) / (n - 1))"
        ).alias("weight"),
    )
    tw = w.agg(
        F.expr(
            "aggregate(sort_array(collect_list(weight)),"
            " CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("t")
    )
    # r13 subtree-sweep fix: leftover and ranked both re-derived the
    # quota rows (re-broadcasting the weight total). Five rows —
    # checkpoint (same fix as largest_remainder_allocation).
    quota = w.crossJoin(B(tw)).select(
        "pri",
        "n",
        F.expr(f"floor(weight * {_NEYMAN_TOTAL} / t)").alias("base"),
        F.expr(
            f"weight * {_NEYMAN_TOTAL} / t"
            f" - floor(weight * {_NEYMAN_TOTAL} / t)"
        ).alias("rem"),
    ).localCheckpoint()
    leftover = quota.agg(
        F.expr(f"CAST({_NEYMAN_TOTAL} - sum(base) AS BIGINT)").alias(
            "k"
        )
    )
    ranked = quota.select(
        "pri",
        "n",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("pri")))
        .alias("rr"),
    )
    return (
        ranked.crossJoin(B(leftover))
        .select(
            "pri",
            F.col("n").alias("stratum_n"),
            F.expr(
                "CAST(base + CASE WHEN rr <= k THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("sample_size"),
        )
        .orderBy("pri")
    )
