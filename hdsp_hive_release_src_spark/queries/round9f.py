"""SURVEY.md §2 round-9 sixth wave (queued for the r10 window):
experimentation + robustness statistics and two source-option
surfaces:

- ``abtest_proportions_ztest`` — two-proportion z-test on user
  conversion between hash buckets (the A/B readout).
- ``burstiness_fano_factor`` — variance-to-mean of daily event
  counts per type (Fano factor: >1 bursty, ≈1 Poisson).
- ``seasonal_decompose_additive`` — additive decomposition of daily
  revenue: centered 7-day-MA trend and per-weekday effects, all in
  exact integer millicents.
- ``tukey_fences_grouped`` — IQR outlier fences per group (the
  quantile sibling of mad_outliers / zscore_outliers).
- ``fleiss_kappa_raters`` — multi-rater agreement (3 deterministic
  rule raters), generalizing cohens_kappa_raters.
- ``theil_index_inequality`` — Theil T entropy index of spend
  concentration (decomposable counterpart of the Gini).
- ``csv_write_quote_escape_matrix`` — CSV writer quoting/escape
  round trip on adversarial strings (embedded delimiter, quote,
  newline, backslash).
- ``json_lines_gzip_roundtrip`` — compressed JSON-lines sink/source
  round trip (codec option).

Float rules as the earlier waves: exact integer accumulators
everywhere; Theil's per-term ln() follows the fuzz-validated
kl_divergence_drift shape (round 6 on a sum of doubles over exact
integer inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import scratch_path

B = F.broadcast

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# two-proportion z-test
# --------------------------------------------------------------------

_AB_ORACLE = """
WITH per_user AS (
  SELECT user_id, user_id % 2 AS grp,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) * 5 > count(*)
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS x
  FROM per_user GROUP BY grp),
w AS (
  SELECT max(CASE WHEN grp = 0 THEN n END) AS na,
         max(CASE WHEN grp = 0 THEN x END) AS xa,
         max(CASE WHEN grp = 1 THEN n END) AS nb,
         max(CASE WHEN grp = 1 THEN x END) AS xb
  FROM g)
SELECT na, xa, nb, xb,
       (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
       / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
              * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
              * (1.0 / na + 1.0 / nb)) AS z_stat
FROM w
"""


@query("abtest_proportions_ztest", oracle=_AB_ORACLE)
def abtest_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between A/B buckets (user_id parity —
    stand-in for the experiment hash): conversion = the user's
    purchase SHARE exceeds the uniform-mix expectation (count·5 >
    total, an exact integer predicate) — scale-free, so both arms
    keep a non-degenerate rate at every SF (an any-purchase rule
    saturates to p=1 and zeroes the pooled variance). Counts are
    exact integers from one per-user rollup; the pooled-proportion z
    is a single closed-form double. The per-user pre-aggregation is
    what keeps the test user-level (event-level counting would
    overweight heavy users — the classic A/B mistake)."""
    e = Catalog(spark, sf_dir).events
    per_user = e.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(
                    0
                )
            )
            * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("grp"), "converted"
    )
    g = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("x"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == 0, F.col("x"))).alias("xa"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == 1, F.col("x"))).alias("xb"),
    )
    return w.select(
        "na",
        "xa",
        "nb",
        "xb",
        F.expr(
            "(CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)"
            " / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))"
            "        * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))"
            "        * (1.0 / na + 1.0 / nb))"
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------
# Fano factor burstiness
# --------------------------------------------------------------------

_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM daily GROUP BY event_type)
SELECT event_type, nd AS n_days, sc AS n_events,
       ((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / nd)
        / (nd - 1)) / (CAST(sc AS DOUBLE) / nd) AS fano_factor
FROM s ORDER BY event_type
"""


@query("burstiness_fano_factor", oracle=_FANO_ORACLE)
def burstiness_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (sample variance / mean) of the daily event-count
    series per type — the burstiness dial: ≈1 is Poisson-like
    arrivals, >1 means bursts (and a skew hazard for
    time-partitioned ingestion). One rollup to days×types, exact
    (n, Σc, Σc²) integers, one closed-form double."""
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    return s.select(
        "event_type",
        F.col("nd").alias("n_days"),
        F.col("sc").alias("n_events"),
        F.expr(
            "((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / nd)"
            " / (nd - 1)) / (CAST(sc AS DOUBLE) / nd)"
        ).alias("fano_factor"),
    ).orderBy("event_type")


# --------------------------------------------------------------------
# additive seasonal decomposition
# --------------------------------------------------------------------

_SEAS_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         dayofweek(o_orderdate) + 1 AS dow,
         CAST(sum({_CENTS}) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
seq AS (
  SELECT d, dow, c, row_number() OVER (ORDER BY d) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS nd
  FROM daily),
tr AS (
  SELECT a.d, a.dow, a.c,
         CAST(sum(b.c) * 1000 // 7 AS BIGINT) AS trend_milli
  FROM seq a JOIN seq b ON b.rn BETWEEN a.rn - 3 AND a.rn + 3
  WHERE a.rn >= 4 AND a.rn <= a.nd - 3
  GROUP BY a.d, a.dow, a.c),
eff AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(c * 1000 - trend_milli)
              // count(*) AS BIGINT) AS effect_millicents
  FROM tr GROUP BY dow)
SELECT dow, n_days, effect_millicents FROM eff ORDER BY dow
"""


@query("seasonal_decompose_additive", oracle=_SEAS_ORACLE)
def seasonal_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue: trend =
    centered 7-day moving average (only days with a FULL window —
    edge days are excluded, not padded), weekday effect = mean
    detrended value per day-of-week. Everything is exact integer
    millicents (the MA is sum·1000 div 7), so the decomposition is
    replayable to the last unit; the band self-join runs on the
    daily rollup. The weekday effects are what a pipeline subtracts
    before comparing corpus snapshots taken on different
    weekdays."""
    o = Catalog(spark, sf_dir).orders
    from pyspark.sql.window import Window

    # r12 scan-count fix: the row-number sequence, both band-join
    # sides and the day count each re-ran the daily rollup from
    # parquet (4 scans measured); the days-sized rollup is
    # checkpointed once
    daily = (
        o.groupBy(
            F.to_date("o_orderdate").alias("d"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .agg(F.sum(F.expr(_CENTS)).cast("long").alias("c"))
        .localCheckpoint()
    )
    seq = daily.select(
        "d",
        "dow",
        "c",
        F.row_number().over(Window.orderBy("d")).alias("rn"),
    ).crossJoin(
        B(daily.agg(F.count(F.lit(1)).cast("long").alias("nd")))
    )
    a = seq.alias("a")
    b = seq.alias("b")
    tr = (
        a.join(
            b,
            (F.col("b.rn") >= F.col("a.rn") - 3)
            & (F.col("b.rn") <= F.col("a.rn") + 3),
        )
        .where(
            (F.col("a.rn") >= 4) & (F.col("a.rn") <= F.col("a.nd") - 3)
        )
        .groupBy(
            F.col("a.d").alias("d"),
            F.col("a.dow").alias("dow"),
            F.col("a.c").alias("c"),
        )
        .agg(
            F.expr("CAST(sum(b.c) * 1000 div 7 AS BIGINT)").alias(
                "trend_milli"
            )
        )
    )
    return (
        tr.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr(
                "CAST(sum(c * 1000 - trend_milli) div count(*)"
                " AS BIGINT)"
            ).alias("effect_millicents"),
        )
        .orderBy("dow")
    )


# --------------------------------------------------------------------
# Tukey IQR fences per group
# --------------------------------------------------------------------

_TUKEY_ORACLE = f"""
WITH v AS (
  SELECT o_orderpriority AS pri, {_CENTS} AS cents FROM orders),
q AS (
  SELECT pri,
         quantile_cont(CAST(cents AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(cents AS DOUBLE), 0.75) AS q3,
         CAST(count(*) AS BIGINT) AS n
  FROM v GROUP BY pri)
SELECT q.pri, q.n, round(q1, 6) AS q1, round(q3, 6) AS q3,
       CAST(sum(CASE WHEN v.cents < q1 - 1.5 * (q3 - q1)
                       OR v.cents > q3 + 1.5 * (q3 - q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM v JOIN q ON v.pri = q.pri
GROUP BY q.pri, q.n, q1, q3 ORDER BY q.pri
"""


@query("tukey_fences_grouped", oracle=_TUKEY_ORACLE)
def tukey_fences_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences per order priority — the quantile
    member of the outlier family (zscore_outliers assumes normality,
    mad_outliers robustness; Tukey is the boxplot rule). Quartiles
    interpolate over exact integer cents cast DOUBLE (identical on
    both engines); the fences are closed-form doubles from those
    quartiles, and the outlier count is an exact integer comparison
    against them. Two passes over the group: quantile state +
    broadcast fence join."""
    o = Catalog(spark, sf_dir).orders
    v = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.expr(_CENTS).alias("cents"),
    )
    q = v.groupBy("pri").agg(
        F.expr("percentile(CAST(cents AS DOUBLE), 0.25)").alias("q1"),
        F.expr("percentile(CAST(cents AS DOUBLE), 0.75)").alias("q3"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        v.join(B(q), "pri")
        .groupBy("pri", "n", "q1", "q3")
        .agg(
            F.sum(
                F.when(
                    (F.col("cents") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
                    | (
                        F.col("cents")
                        > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "pri",
            "n",
            F.round("q1", 6).alias("q1"),
            F.round("q3", 6).alias("q3"),
            "n_outliers",
        )
        .orderBy("pri")
    )


# --------------------------------------------------------------------
# Fleiss kappa (3 rule raters)
# --------------------------------------------------------------------

_FLEISS_ORACLE = """
WITH rated AS (
  SELECT (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
         + (CASE WHEN strlen(text) - strlen(replace(text, ' ', ''))
                      >= 45 THEN 1 ELSE 0 END)
         + (CASE WHEN strlen(text) >= 250 THEN 1 ELSE 0 END) AS k
  FROM documents),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(k) AS BIGINT) AS sum_true,
         CAST(sum(k * k + (3 - k) * (3 - k)) AS BIGINT) AS sum_sq
  FROM rated)
SELECT n_items, sum_true,
       (CAST(sum_sq - 3 * n_items AS DOUBLE) / (n_items * 6)
        - (CAST(sum_true AS DOUBLE) / (3 * n_items)
             * (CAST(sum_true AS DOUBLE) / (3 * n_items))
           + (1 - CAST(sum_true AS DOUBLE) / (3 * n_items))
             * (1 - CAST(sum_true AS DOUBLE) / (3 * n_items))))
       / (1 - (CAST(sum_true AS DOUBLE) / (3 * n_items)
                 * (CAST(sum_true AS DOUBLE) / (3 * n_items))
               + (1 - CAST(sum_true AS DOUBLE) / (3 * n_items))
                 * (1 - CAST(sum_true AS DOUBLE) / (3 * n_items))))
         AS fleiss_kappa
FROM s
"""


@query("fleiss_kappa_raters", oracle=_FLEISS_ORACLE)
def fleiss_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over THREE deterministic binary raters (char
    length, whitespace tokens, byte length) — the multi-annotator
    generalization of cohens_kappa_raters. With n=3 raters and 2
    categories, each item's agreement reduces to k²+(3−k)² where k =
    votes for TRUE, so the whole statistic folds to two exact integer
    sums; P̄ and P̄e are closed-form doubles over them. One scan, one
    row."""
    d = Catalog(spark, sf_dir).documents
    rated = d.select(
        (
            F.when(F.col("n_chars") >= 300, 1).otherwise(0)
            + F.when(
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
                >= 45,
                1,
            ).otherwise(0)
            + F.when(F.length("text") >= 250, 1).otherwise(0)
        ).alias("k")
    )
    s = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("k").cast("long").alias("sum_true"),
        F.sum(
            F.col("k") * F.col("k")
            + (3 - F.col("k")) * (3 - F.col("k"))
        )
        .cast("long")
        .alias("sum_sq"),
    )
    pbar_e = (
        "(CAST(sum_true AS DOUBLE) / (3 * n_items)"
        "   * (CAST(sum_true AS DOUBLE) / (3 * n_items))"
        " + (1 - CAST(sum_true AS DOUBLE) / (3 * n_items))"
        "   * (1 - CAST(sum_true AS DOUBLE) / (3 * n_items)))"
    )
    return s.select(
        "n_items",
        "sum_true",
        F.expr(
            f"(CAST(sum_sq - 3 * n_items AS DOUBLE) / (n_items * 6)"
            f" - {pbar_e}) / (1 - {pbar_e})"
        ).alias("fleiss_kappa"),
    )


# --------------------------------------------------------------------
# Theil T index
# --------------------------------------------------------------------

_THEIL_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey, CAST(sum({_CENTS}) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey),
n AS (SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(sum(x) AS BIGINT) AS tot
      FROM spend)
SELECT nc AS n_customers,
       round(sum((CAST(x AS DOUBLE) * nc / tot)
                 * ln(CAST(x AS DOUBLE) * nc / tot)) / nc, 6)
           AS theil_t
FROM spend, n GROUP BY nc
"""


@query("theil_index_inequality", oracle=_THEIL_ORACLE)
def theil_index_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T entropy index of spend concentration — unlike Gini it
    decomposes additively across subgroups, which is why mixture
    audits prefer it. Per-customer ratios are doubles over exact
    integers (x·n/total); the ln-weighted sum follows the
    fuzz-validated kl_divergence_drift float shape (sum of
    per-term doubles, round 6)."""
    o = Catalog(spark, sf_dir).orders
    # r13 subtree-sweep fix: the totals and the entropy fold both
    # re-ran the per-customer rollup from parquet. Dimension-sized —
    # checkpoint once.
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.expr(_CENTS)).cast("long").alias("x")
    ).localCheckpoint()
    n = spend.agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("x").cast("long").alias("tot"),
    )
    return (
        spend.crossJoin(B(n))
        .groupBy("nc")
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "(CAST(x AS DOUBLE) * nc / tot)"
                        " * ln(CAST(x AS DOUBLE) * nc / tot)"
                    )
                )
                / F.col("nc"),
                6,
            ).alias("theil_t")
        )
        .select(F.col("nc").alias("n_customers"), "theil_t")
    )


# --------------------------------------------------------------------
# CSV quoting/escape round trip
# --------------------------------------------------------------------


@query(
    "csv_write_quote_escape_matrix",
    oracle="""
    WITH adv AS (
      SELECT p_partkey,
             p_name || ',"q' || chr(10) || 'line\\' AS s
      FROM part)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(strlen(s)) AS BIGINT) AS sum_len,
           CAST(count(DISTINCT s) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN contains(s, chr(10))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline
    FROM adv
    """,
)
def csv_write_quote_escape_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV writer quoting/escape contract on ADVERSARIAL content:
    every row embeds the delimiter, a double quote, a newline, and a
    backslash. Written with quoteAll + doubled-quote escaping, read
    back with multiLine=true (quoted newlines span physical lines) —
    the checksum (count, total length, distincts, embedded-newline
    count) must survive the round trip exactly. multiLine=true makes
    a file unsplittable, which is the price of newline-bearing CSV
    at scale — the docstring-level guidance is to prefer parquet for
    such columns and reserve this path for ingest of third-party
    dumps."""
    p = Catalog(spark, sf_dir).part
    adv = p.select(
        "p_partkey",
        F.concat(
            F.col("p_name"), F.lit(',"q\nline\\')
        ).alias("s"),
    )
    path = scratch_path("csv_adv_r9", sf_dir)
    (
        adv.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )
    back = (
        spark.read.schema("p_partkey long, s string")
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("s")).cast("long").alias("sum_len"),
        F.countDistinct("s").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("s").contains("\n"), 1).otherwise(0))
        .cast("long")
        .alias("n_multiline"),
    )


# --------------------------------------------------------------------
# gzip JSON-lines round trip
# --------------------------------------------------------------------


@query(
    "json_lines_gzip_roundtrip",
    oracle=f"""
    SELECT o_orderpriority AS pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS cents
    FROM orders GROUP BY pri ORDER BY pri
    """,
)
def json_lines_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source with gzip codec: the compression option
    must be transparent to the reader (Spark decompresses by
    extension). Value parity against the ORIGINAL parquet proves the
    round trip lossless through both the JSON codec and gzip. Note
    for 100 TB: gzip text is NOT splittable — one file = one task —
    so the pipeline guidance is many medium files (the write fan-out
    here) rather than one large one."""
    o = Catalog(spark, sf_dir).orders
    path = scratch_path("json_gz_r9", sf_dir)
    (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.expr(_CENTS).alias("cents"),
        )
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(path)
    )
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, cents long"
    ).json(path)
    return (
        back.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("pri")
    )
