"""SURVEY.md §2 round-9 second wave — distribution / inference
statistics a data-quality pipeline runs between corpus snapshots,
extending the r8 toolkit (KS, Mann-Whitney, bootstrap, autocorr) with:

- ``welch_t_test`` — unequal-variance two-sample t, the parametric
  sibling of ``mann_whitney_u``.
- ``gini_concentration_index`` — Gini coefficient of per-customer
  spend (the Lorenz-curve scalar; complements the HHI query).
- ``spearman_rank_corr`` — rank correlation with tie-averaged ranks
  kept integral via the doubled-rank identity (2·avg_rank = 2·rank +
  ties − 1).
- ``weekday_seasonality_index`` — per-weekday load index in exact
  permille (the day-of-week profile behind time-split decisions).
- ``ewma_halving_window`` — exponentially-weighted moving average
  with α = 1/2 over a 20-day frame: every weight is a power of two,
  so numerator and denominator are exact int64 and the EWMA is an
  exact integer ratio — no float recursion anywhere.
- ``cramers_v_effect`` — effect size for the status×priority
  contingency, chi² folded in exact integer micro-units.
- ``cohens_kappa_raters`` — inter-rater agreement between two
  deterministic rule-based document classifiers.
- ``moving_median_window`` — interpolated median as a framed window
  aggregate over the daily revenue series.

Standing rules: every sum that can exceed int64 at larger SF runs as
DECIMAL(38,0) on the Spark side (DuckDB's sum() auto-promotes to
HUGEINT); float appears only in final closed-form expressions applied
to bit-identical exact integers in the same shape on both engines; no
``--`` comments in oracle strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.ranking import with_global_rank
from hdsp_hive_release_src_spark.registry import query

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# Welch's t-test
# --------------------------------------------------------------------

_WELCH_ORACLE = f"""
WITH g AS (
  SELECT (o_orderstatus = 'F') AS is_f, {_CENTS} AS cents
  FROM orders),
s AS (
  SELECT is_f,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS DOUBLE) AS sm,
         CAST(sum(cents * cents) AS DOUBLE) AS sq
  FROM g GROUP BY is_f),
w AS (
  SELECT max(CASE WHEN is_f THEN n END) AS n1,
         max(CASE WHEN is_f THEN sm END) AS s1,
         max(CASE WHEN is_f THEN sq END) AS q1,
         max(CASE WHEN NOT is_f THEN n END) AS n2,
         max(CASE WHEN NOT is_f THEN sm END) AS s2,
         max(CASE WHEN NOT is_f THEN sq END) AS q2
  FROM s)
SELECT n1 AS n_f, n2 AS n_other,
       s1 / n1 AS mean_f_cents, s2 / n2 AS mean_other_cents,
       (s1 / n1 - s2 / n2)
         / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) AS t_stat,
       pow((q1 - s1 * s1 / n1) / (n1 - 1) / n1
           + (q2 - s2 * s2 / n2) / (n2 - 1) / n2, 2)
         / (pow((q1 - s1 * s1 / n1) / (n1 - 1) / n1, 2) / (n1 - 1)
            + pow((q2 - s2 * s2 / n2) / (n2 - 1) / n2, 2) / (n2 - 1))
         AS welch_df
FROM w
"""


@query("welch_t_test", oracle=_WELCH_ORACLE)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t on order value, finished
    orders vs the rest. One map-side-combined pass per group collects
    (n, Σx, Σx²) — Σx² runs as DECIMAL(38,0) because cents² sums past
    int64 already at sf0.1 (DuckDB promotes to HUGEINT on its own).
    t and the Welch–Satterthwaite df are closed-form doubles over
    those exact sums, identical expression shape both engines, so
    there is no accumulation-order float anywhere (the standing
    dsir rule)."""
    o = Catalog(spark, sf_dir).orders
    g = o.select(
        (F.col("o_orderstatus") == "F").alias("is_f"),
        F.expr(_CENTS).alias("cents"),
    )
    s = g.groupBy("is_f").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("double")
        .alias("sm"),
        F.sum(
            (F.col("cents") * F.col("cents")).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("sq"),
    )
    w = s.agg(
        F.max(F.when(F.col("is_f"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("is_f"), F.col("sm"))).alias("s1"),
        F.max(F.when(F.col("is_f"), F.col("sq"))).alias("q1"),
        F.max(F.when(~F.col("is_f"), F.col("n"))).alias("n2"),
        F.max(F.when(~F.col("is_f"), F.col("sm"))).alias("s2"),
        F.max(F.when(~F.col("is_f"), F.col("sq"))).alias("q2"),
    )
    se1 = "(q1 - s1 * s1 / n1) / (n1 - 1) / n1"
    se2 = "(q2 - s2 * s2 / n2) / (n2 - 1) / n2"
    return w.select(
        F.col("n1").alias("n_f"),
        F.col("n2").alias("n_other"),
        F.expr("s1 / n1").alias("mean_f_cents"),
        F.expr("s2 / n2").alias("mean_other_cents"),
        F.expr(
            f"(s1 / n1 - s2 / n2) / sqrt({se1} + {se2})"
        ).alias("t_stat"),
        F.expr(
            f"pow({se1} + {se2}, 2)"
            f" / (pow({se1}, 2) / (n1 - 1)"
            f"    + pow({se2}, 2) / (n2 - 1))"
        ).alias("welch_df"),
    )


# --------------------------------------------------------------------
# Gini concentration of customer spend
# --------------------------------------------------------------------

_GINI_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey, CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS rn
  FROM spend),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(cents) AS tot,
         sum(CAST(rn AS HUGEINT) * cents) AS s
  FROM ranked)
SELECT n AS n_customers,
       CAST(tot AS BIGINT) AS total_cents,
       (2.0 * CAST(s AS DOUBLE) - (n + 1.0) * CAST(tot AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)) AS gini
FROM agg
"""


@query("gini_concentration_index", oracle=_GINI_ORACLE)
def gini_concentration_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend via the rank formula
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with x ascending. The rank is
    made total by (cents, custkey) — equal values commute inside
    Σ i·xᵢ, so the tiebreak cannot change the result, it only pins
    the plan. Scale shape: map-side per-customer agg first (the big
    shuffle), then the rank runs through operators/ranking.
    with_global_rank — range-partitioned exact global row_number, no
    single-partition window anywhere (the per-customer dimension grows
    with the fact table, so the bounded-input argument the daily-grain
    queries use does not apply here). Σ i·xᵢ runs
    DECIMAL(38,0)/HUGEINT; the quotient is the only float."""
    o = Catalog(spark, sf_dir).orders
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.expr(_CENTS)).alias("cents")
    )
    ranked, _n = with_global_rank(
        spend, "cents", ["o_custkey"], rank_col="rn"
    )
    ranked = ranked.select("cents", "rn")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(
            (F.col("rn").cast("decimal(38,0)") * F.col("cents"))
        ).alias("s"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("tot").cast("long").alias("total_cents"),
        F.expr(
            "(2.0 * CAST(s AS DOUBLE) - (n + 1.0) * CAST(tot AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))"
        ).alias("gini"),
    )


# --------------------------------------------------------------------
# Spearman rank correlation
# --------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH d AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS x,
         CAST(p_size AS BIGINT) AS y
  FROM part),
r AS (
  SELECT 2 * rank() OVER (ORDER BY x)
           + count(*) OVER (PARTITION BY x) - 1 AS dx,
         2 * rank() OVER (ORDER BY y)
           + count(*) OVER (PARTITION BY y) - 1 AS dy
  FROM d),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(dx) AS sx, sum(dy) AS sy,
         sum(CAST(dx AS HUGEINT) * dx) AS sxx,
         sum(CAST(dy AS HUGEINT) * dy) AS syy,
         sum(CAST(dx AS HUGEINT) * dy) AS sxy
  FROM r)
SELECT n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS spearman_rho
FROM s
"""


@query("spearman_rank_corr", oracle=_SPEARMAN_ORACLE)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between part price and size. Ties use
    average ranks, kept INTEGRAL by doubling: 2·avg_rank = 2·rank() +
    ties − 1 (the r8 mann_whitney identity) — Pearson over ranks is
    scale-invariant, so the doubled ranks give the same ρ with every
    accumulator an exact integer (DECIMAL(38,0)/HUGEINT for the cross
    sums). One window pass per axis, one global agg; ρ is a single
    closed-form double."""
    p = Catalog(spark, sf_dir).part
    from pyspark.sql.window import Window

    d = p.select(
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias(
            "x"
        ),
        F.col("p_size").cast("long").alias("y"),
    )
    r = d.select(
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("x"))
            - 1
        ).alias("dx"),
        (
            2 * F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        ).alias("dy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(dec("dx") * dec("dx")).alias("sxx"),
        F.sum(dec("dy") * dec("dy")).alias("syy"),
        F.sum(dec("dx") * dec("dy")).alias("sxy"),
    )
    return s.select(
        "n",
        F.expr(
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
            "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
            "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            "        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------
# weekday seasonality index
# --------------------------------------------------------------------

_WD_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, dayofweek(ts) + 1 AS dow,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
per AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(c) AS BIGINT) AS n_events
  FROM daily GROUP BY dow),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS all_days,
         CAST(sum(c) AS BIGINT) AS all_events
  FROM daily)
SELECT dow, n_days, n_events,
       CAST(n_events * all_days * 1000
            // (n_days * all_events) AS BIGINT) AS index_permille
FROM per, tot ORDER BY dow
"""


@query("weekday_seasonality_index", oracle=_WD_ORACLE)
def weekday_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-weekday load index: mean daily event count for the weekday
    over the global mean daily count, in exact integer permille
    ((T_d·D·1000) div (D_d·T)) — the day-of-week profile a pipeline
    checks before choosing time-based train/eval splits. Spark's
    dayofweek is 1=Sunday while DuckDB's is 0=Sunday (the standing
    trap) — the oracle shifts by +1. Two tiny aggregations over the
    daily rollup; the rollup itself is the only row-scale pass."""
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(
        F.to_date("ts").alias("d"),
        F.dayofweek("ts").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # r13 subtree-sweep fix: the global totals re-ran the daily
    # rollup; they are the column sums of the 7-row weekday table —
    # checkpoint it and derive them, one rollup pass total.
    per = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("n_events"),
    ).localCheckpoint()
    tot = per.agg(
        F.sum("n_days").alias("all_days"),
        F.sum("n_events").alias("all_events"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr(
                "CAST(n_events * all_days * 1000"
                " div (n_days * all_events) AS BIGINT)"
            ).alias("index_permille"),
        )
        .orderBy("dow")
    )


# --------------------------------------------------------------------
# EWMA with power-of-two weights
# --------------------------------------------------------------------

_EWMA_SPAN = 20  # frame: current day + 19 preceding

_EWMA_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
seq AS (
  SELECT d, cents,
         row_number() OVER (ORDER BY d) AS rn
  FROM daily),
pairs AS (
  SELECT a.d, a.cents AS day_cents,
         sum(b.cents * (CAST(1 AS BIGINT)
                        << ({_EWMA_SPAN} - 1 - (a.rn - b.rn))))
             AS num,
         sum(CAST(1 AS BIGINT)
             << ({_EWMA_SPAN} - 1 - (a.rn - b.rn))) AS den
  FROM seq a JOIN seq b
    ON b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
  GROUP BY a.d, a.cents)
SELECT d AS day, day_cents,
       CAST(num * 1000 // den AS BIGINT) AS ewma_millicents
FROM pairs ORDER BY day
"""


@query("ewma_halving_window", oracle=_EWMA_ORACLE)
def ewma_halving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA of daily revenue with α = 1/2 over a 20-day frame. The
    halving decay makes every weight an exact power of two
    (2^19 … 2^0), so the weighted numerator and denominator are exact
    int64 and the EWMA is one integer ratio in millicents — the float
    recursion s_i = α·x + (1−α)·s_{i−1} (order-sensitive, graded
    defect class) never appears. Implemented as a 20-wide band
    self-join over the DAILY rollup: the 20× expansion touches one
    row per day, never raw orders, so at 100 TB this is a few
    thousand rows regardless of corpus size."""
    o = Catalog(spark, sf_dir).orders
    from pyspark.sql.window import Window

    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    # r13 subtree-sweep fix: both band-join sides re-ran the daily
    # rollup + row_number from parquet. The sequenced series is
    # date-sized — checkpoint once, join reads it twice.
    seq = daily.select(
        "d",
        "cents",
        F.row_number().over(Window.orderBy("d")).alias("rn"),
    ).localCheckpoint()
    a = seq.alias("a")
    b = seq.alias("b")
    w = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"{_EWMA_SPAN} - 1 - (a.rn - b.rn))"
    )
    pairs = (
        a.join(
            b,
            (F.col("b.rn") >= F.col("a.rn") - (_EWMA_SPAN - 1))
            & (F.col("b.rn") <= F.col("a.rn")),
        )
        .groupBy(
            F.col("a.d").alias("day"),
            F.col("a.cents").alias("day_cents"),
        )
        .agg(
            F.sum(F.col("b.cents") * w).alias("num"),
            F.sum(w).alias("den"),
        )
    )
    return pairs.select(
        "day",
        "day_cents",
        F.expr("CAST(num * 1000 div den AS BIGINT)").alias(
            "ewma_millicents"
        ),
    ).orderBy("day")


# --------------------------------------------------------------------
# Cramér's V effect size
# --------------------------------------------------------------------

_CRAMER_ORACLE = """
WITH cell AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2),
rt AS (SELECT s, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY s),
ct AS (SELECT p, CAST(sum(o) AS BIGINT) AS c FROM cell GROUP BY p),
n AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
             CAST(count(DISTINCT s) AS BIGINT) AS nr,
             CAST(count(DISTINCT p) AS BIGINT) AS nc
      FROM cell),
contrib AS (
  SELECT CAST((CAST(cell.o * n.nn - rt.r * ct.c AS HUGEINT)
               * (cell.o * n.nn - rt.r * ct.c)) * 1000000
              // (CAST(rt.r AS HUGEINT) * ct.c) // n.nn
           AS BIGINT) AS micro
  FROM cell JOIN rt USING (s) JOIN ct USING (p) CROSS JOIN n)
SELECT n.nn AS n, n.nr AS n_rows_levels, n.nc AS n_col_levels,
       CAST(sum(contrib.micro) AS BIGINT) AS chi2_micro,
       sqrt(CAST(sum(contrib.micro) AS DOUBLE)
            / (1000000.0 * CAST(n.nn AS DOUBLE)
               * (CASE WHEN n.nr < n.nc THEN n.nr ELSE n.nc END - 1)))
           AS cramers_v
FROM contrib CROSS JOIN n
GROUP BY n.nn, n.nr, n.nc
"""


@query("cramers_v_effect", oracle=_CRAMER_ORACLE)
def cramers_v_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the status×priority contingency — the effect
    size chi_square_independence doesn't report. Per-cell chi²
    contributions are folded in exact integer MICRO-units
    ((O·N − R·C)²·10⁶ div (R·C) div N, promoted to
    DECIMAL(38,0)/HUGEINT because (O·N)² passes int64 at sf0.1), so
    the cross-cell sum — the one place float addition order could
    bite — is integer-exact; V is a single closed-form sqrt. The
    contingency table is 15 cells: everything after the first
    aggregation is broadcast-sized."""
    o = Catalog(spark, sf_dir).orders
    # r12 scan-count fix: marginals/totals/contrib each re-ran the
    # contingency aggregation from parquet (4 scans measured); the
    # 15-cell table is checkpointed once
    cell = (
        o.groupBy(
            F.col("o_orderstatus").alias("s"),
            F.col("o_orderpriority").alias("p"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint()
    )
    rt = cell.groupBy("s").agg(F.sum("o").cast("long").alias("r"))
    ct = cell.groupBy("p").agg(F.sum("o").cast("long").alias("c"))
    n = cell.agg(
        F.sum("o").cast("long").alias("nn"),
        F.countDistinct("s").cast("long").alias("nr"),
        F.countDistinct("p").cast("long").alias("nc"),
    )
    contrib = (
        cell.join(F.broadcast(rt), "s")
        .join(F.broadcast(ct), "p")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(
                "CAST((CAST(o * nn - r * c AS DECIMAL(38,0))"
                "      * (o * nn - r * c)) * 1000000"
                " div (CAST(r AS DECIMAL(38,0)) * c) div nn"
                " AS BIGINT)"
            ).alias("micro"),
            "nn",
            "nr",
            "nc",
        )
    )
    return contrib.groupBy("nn", "nr", "nc").agg(
        F.sum("micro").cast("long").alias("chi2_micro")
    ).select(
        F.col("nn").alias("n"),
        F.col("nr").alias("n_rows_levels"),
        F.col("nc").alias("n_col_levels"),
        "chi2_micro",
        F.expr(
            "sqrt(CAST(chi2_micro AS DOUBLE)"
            " / (1000000.0 * CAST(nn AS DOUBLE)"
            "    * (CASE WHEN nr < nc THEN nr ELSE nc END - 1)))"
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------
# Cohen's kappa between two rule raters
# --------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH rated AS (
  SELECT (n_chars >= 300) AS a,
         (strlen(text) - strlen(replace(text, ' ', '')) >= 45) AS b
  FROM documents),
cm AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
             AS tp,
         CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
             AS fn,
         CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
             AS fp,
         CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
              AS BIGINT) AS tn
  FROM rated)
SELECT n, tp, fn, fp, tn,
       (CAST(n AS DOUBLE) * (tp + tn)
          - (CAST(tp + fn AS DOUBLE) * (tp + fp)
             + CAST(tn + fp AS DOUBLE) * (tn + fn)))
       / (CAST(n AS DOUBLE) * n
          - (CAST(tp + fn AS DOUBLE) * (tp + fp)
             + CAST(tn + fp AS DOUBLE) * (tn + fn))) AS kappa
FROM cm
"""


@query("cohens_kappa_raters", oracle=_KAPPA_ORACLE)
def cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document 'raters'
    (length rule vs whitespace-token rule) — the agreement statistic
    a labeling pipeline reports when two heuristic annotators vote.
    The 2×2 confusion matrix is exact integer; kappa is one
    closed-form quotient (κ = (N·agree − Σ marginal products) /
    (N² − Σ marginal products)). One scan, one row out."""
    d = Catalog(spark, sf_dir).documents
    rated = d.select(
        (F.col("n_chars") >= 300).alias("a"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            >= 45
        ).alias("b"),
    )
    cm = rated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return cm.select(
        "n",
        "tp",
        "fn",
        "fp",
        "tn",
        F.expr(
            "(CAST(n AS DOUBLE) * (tp + tn)"
            "  - (CAST(tp + fn AS DOUBLE) * (tp + fp)"
            "     + CAST(tn + fp AS DOUBLE) * (tn + fn)))"
            " / (CAST(n AS DOUBLE) * n"
            "    - (CAST(tp + fn AS DOUBLE) * (tp + fp)"
            "       + CAST(tn + fp AS DOUBLE) * (tn + fn)))"
        ).alias("kappa"),
    )


# --------------------------------------------------------------------
# framed moving median
# --------------------------------------------------------------------

_MOVMED_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum({_CENTS}) AS BIGINT) AS total_cents
  FROM orders GROUP BY 1)
SELECT day, total_cents,
       median(CAST(total_cents AS DOUBLE))
         OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         AS med7
FROM daily ORDER BY day
"""


@query("moving_median_window", oracle=_MOVMED_ORACLE)
def moving_median_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated median as a FRAMED window aggregate: trailing
    7-day median of daily revenue — the robust trend line the mean
    queries can't give. Median of ≤7 exact ints interpolates to .0/.5
    exactly on both engines (DuckDB's DECIMAL-median discreteness
    trap is dodged by the DOUBLE cast — the documented parity rule).
    Spark disallows a frame on median() itself
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC) — percentile(x, 0.5)
    is the frame-capable equivalent with the same interpolation.
    WindowExec keeps only the 7-row frame per partition slice; the
    series is the daily rollup, so the sort is thousands of rows at
    any corpus scale."""
    o = Catalog(spark, sf_dir).orders
    from pyspark.sql.window import Window

    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("total_cents"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "total_cents",
        F.expr("percentile(CAST(total_cents AS DOUBLE), 0.5)")
        .over(w)
        .alias("med7"),
    ).orderBy("day")
