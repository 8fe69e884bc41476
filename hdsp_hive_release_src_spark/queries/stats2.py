"""SURVEY.md §2.2 continued — statistics wave 2: higher moments
(skewness/kurtosis), weighted median, tie-broken deterministic mode,
and distribution entropy/Gini — the distribution-audit toolkit a
data-quality or training-mixture report runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.materialize import (
    checkpoint_reduced_and_release,
    persist_fact_rows,
)
from hdsp_hive_release_src_spark.registry import query


@query(
    "skewness_kurtosis_moments",
    oracle="""
    WITH mu AS (
      SELECT l_returnflag AS grp, avg(l_extendedprice) AS m
      FROM lineitem GROUP BY l_returnflag),
    moments AS (
      SELECT grp,
             avg(pow(l_extendedprice - m, 2)) AS m2,
             avg(pow(l_extendedprice - m, 3)) AS m3,
             avg(pow(l_extendedprice - m, 4)) AS m4
      FROM lineitem JOIN mu ON l_returnflag = grp GROUP BY grp)
    SELECT grp,
           round(m3 / pow(m2, 1.5), 6) AS skew,
           round(m4 / pow(m2, 2) - 3, 6) AS kurt
    FROM moments ORDER BY grp
    """,
)
def skewness_kurtosis_moments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """skewness() / kurtosis() — the shape moments a distribution
    audit reads (price skew flags long-tail segments). Spark's
    builtins are POPULATION moments while DuckDB's are
    sample-corrected, so the oracle recomputes Spark's definition from
    explicit central moments — itself a worthwhile parity pin: the
    correction-factor difference silently shifts every ported report."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.round(F.skewness("l_extendedprice"), 6).alias("skew"),
            F.round(F.kurtosis("l_extendedprice"), 6).alias("kurt"),
        )
        .orderBy("grp")
    )


@query(
    "weighted_median",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority AS grp, o_totalprice AS v,
             CAST(o_orderkey % 5 + 1 AS BIGINT) AS wt,
             o_orderkey
      FROM orders WHERE o_orderkey < 5000),
    cum AS (
      SELECT grp, v, o_orderkey,
             sum(wt) OVER (PARTITION BY grp ORDER BY v, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY grp) AS tw
      FROM w)
    SELECT grp, round(min(v), 2) AS weighted_median
    FROM cum WHERE cw * 2 >= tw GROUP BY grp ORDER BY grp
    """,
)
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (no builtin anywhere): the first value whose
    cumulative weight reaches half the total, per group — the
    survey-statistics / cost-model primitive. One value-ordered window
    cumsum per partition; weights derive deterministically from the
    key so the oracle replays them."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 5000)
    w = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 5 + 1).cast("long").alias("wt"),
        "o_orderkey",
    )
    wp = Window.partitionBy("grp")
    wo = wp.orderBy("v", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = w.select(
        "grp",
        "v",
        F.sum("wt").over(wo).alias("cw"),
        F.sum("wt").over(wp).alias("tw"),
    )
    return (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("grp")
        .agg(F.round(F.min("v"), 2).alias("weighted_median"))
        .orderBy("grp")
    )


@query(
    "mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY n DESC, c_nationkey) AS rn
      FROM counts)
    SELECT c_mktsegment,
           CAST(c_nationkey AS BIGINT) AS mode_nation,
           CAST(n AS BIGINT) AS mode_count
    FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
    """,
)
def mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the builtin mode() returns an ARBITRARY
    value on tied frequencies (a cross-engine parity trap), so the
    engine provides the tie-broken form — count per value, then
    max_by on (count, -value): highest frequency, lowest value wins
    ties, reproducibly on every engine."""
    c = Catalog(spark, sf_dir).customer
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.groupBy("c_mktsegment")
        .agg(
            F.max_by(
                "c_nationkey",
                F.struct(F.col("n"), (-F.col("c_nationkey")).alias("k")),
            )
            .cast("long")
            .alias("mode_nation"),
            F.max("n").cast("long").alias("mode_count"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "distribution_entropy",
    oracle="""
    WITH p AS (
      SELECT lang,
             count(*) * 1.0 / sum(count(*)) OVER () AS prob
      FROM documents GROUP BY lang)
    SELECT round(-sum(prob * ln(prob)) / ln(2), 6) AS entropy_bits,
           round(1 - sum(prob * prob), 6) AS gini,
           CAST(count(*) AS BIGINT) AS n_classes
    FROM p
    """,
)
def distribution_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) + Gini impurity of the corpus language
    distribution — the one-number diversity audits a training-mixture
    report tracks round over round (entropy collapse = a source
    drowned the mix). Class probabilities come from one aggregation;
    the entropy sum runs over the class-count result (tiny)."""
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    p = counts.select(
        (F.col("n") / F.sum("n").over(w)).alias("prob")
    )
    return p.agg(
        F.round(
            -F.sum(F.col("prob") * F.log(F.col("prob"))) / F.log(F.lit(2.0)),
            6,
        ).alias("entropy_bits"),
        F.round(1 - F.sum(F.col("prob") * F.col("prob")), 6).alias("gini"),
        F.count(F.lit(1)).alias("n_classes"),
    )


@query(
    "chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type AS r, user_id % 4 AS c, count(*) AS o
      FROM events GROUP BY r, c),
    rt AS (SELECT r, sum(o) AS rn FROM obs GROUP BY r),
    ct AS (SELECT c, sum(o) AS cn FROM obs GROUP BY c),
    n AS (SELECT sum(o) AS total FROM obs),
    cells AS (
      SELECT obs.r, obs.c, obs.o,
             rt.rn * ct.cn * 1.0 / n.total AS e
      FROM obs JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN n)
    SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2,
           CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1)
                AS BIGINT) AS dof
    FROM cells
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a user
    bucket (user_id mod 4): observed vs expected contingency counts,
    Σ(O−E)²/E with the (r−1)(c−1) degrees of freedom — the drift /
    A-B sanity test a feature pipeline runs before trusting a split.
    One shuffle builds the contingency cells; marginals are
    aggregate-sized and broadcast back, so the fact table is scanned
    once regardless of table size."""
    ev = Catalog(spark, sf_dir).events
    # r12 scan-count fix: the marginals and total each re-ran the
    # contingency aggregation from parquet (4 scans measured); the
    # cell table is rows x cols values — checkpoint it once
    obs = (
        ev.groupBy(
            F.col("event_type").alias("r"),
            (F.col("user_id") % 4).alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint()
    )
    rt = obs.groupBy("r").agg(F.sum("o").alias("rn"))
    ct = obs.groupBy("c").agg(F.sum("o").alias("cn"))
    n = obs.agg(F.sum("o").alias("total"))
    cells = (
        obs.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .join(F.broadcast(n))
        .withColumn(
            "e", F.col("rn") * F.col("cn") / F.col("total")
        )
    )
    return cells.agg(
        F.round(
            F.sum(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            ),
            4,
        ).alias("chi2"),
        (
            (F.count_distinct("r") - 1) * (F.count_distinct("c") - 1)
        ).cast("long").alias("dof"),
    )


@query(
    "benford_distribution",
    oracle="""
    WITH digits AS (
      SELECT CAST(floor(o_totalprice
             / power(10, floor(log10(o_totalprice)))) AS INTEGER) AS d
      FROM orders WHERE o_totalprice > 0),
    agg AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS total FROM agg)
    SELECT d AS digit, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / total, 6) AS observed_freq,
           round(log10(1 + 1.0 / d), 6) AS benford_freq,
           round(abs(n * 1.0 / total - log10(1 + 1.0 / d)), 6)
               AS abs_dev
    FROM agg CROSS JOIN tot ORDER BY digit
    """,
)
def benford_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: the leading-significant-digit distribution
    of order totals vs the log10(1+1/d) expectation — the classic
    fabricated-numbers detector (synthetic uniform-ish TPC-H prices
    deviate from Benford, and the per-digit abs_dev column SHOWS it;
    a detector that can't fire proves nothing). Map-side digit
    extraction via floor(x/10^floor(log10 x)) — no string formatting,
    so both engines derive the digit from the same float arithmetic —
    then a 9-row aggregation."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(10, F.floor(F.log10("o_totalprice")))
    ).cast("int")
    # r13 subtree-sweep fix: the 9-row digit table fed both the total
    # and the output join, re-running the fact scan twice. Checkpoint
    # the 9 rows; the total reads them.
    agg = (
        o.select(digit.alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = agg.agg(F.sum("n").alias("total"))
    return (
        agg.join(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias(
                "observed_freq"
            ),
            F.round(F.log10(1 + 1.0 / F.col("d")), 6).alias(
                "benford_freq"
            ),
            F.round(
                F.abs(
                    F.col("n") / F.col("total")
                    - F.log10(1 + 1.0 / F.col("d"))
                ),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(CAST(value AS DOUBLE)) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, abs(e.value - med.med) AS adev, med.med
      FROM events e JOIN med ON e.event_type = med.event_type),
    mad AS (
      SELECT event_type, median(CAST(adev AS DOUBLE)) AS mad
      FROM dev GROUP BY event_type)
    SELECT dev.event_type,
           round(max(dev.med), 4) AS median_value,
           round(max(mad.mad), 4) AS mad,
           CAST(sum(CASE WHEN dev.adev > 3 * 1.4826 * mad.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type ORDER BY dev.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type —
    the ROBUST alternative to z-scores (zscore_outliers): one extreme
    value drags a mean/stddev fence toward itself, while medians
    don't move, so MAD fences survive exactly the contamination
    they're hunting. Two exact-median passes (per-group medians are
    bounded-group sorts), each group's median broadcast back; the
    3×1.4826 factor scales MAD to σ-equivalents under normality."""
    ev = Catalog(spark, sf_dir).events
    # r12 scan-count fix: the MAD pass and the final fence count each
    # re-ran the median pass + join from parquet (4 scans measured);
    # materializing the group medians and the deviation table caps the
    # query at its two documented median passes. The medians are
    # reduced (one row per event type) -> localCheckpoint; dev is
    # events-ROW-sized, so DISK_ONLY persist, never localCheckpoint —
    # fact-row data on non-reliable local storage dies with its
    # executor (operators/materialize.py).
    med = (
        ev.groupBy("event_type")
        .agg(F.median("value").alias("med"))
        .localCheckpoint()
    )
    dev = persist_fact_rows(
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "med",
            F.abs(F.col("value") - F.col("med")).alias("adev"),
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.median("adev").alias("mad")
    )
    # r14 hygiene: the per-type result is checkpointed off the cache
    # and the events-row persist released — no session-lifetime cache
    return checkpoint_reduced_and_release(
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("median_value"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(
                (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("int")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type"),
        dev,
    )


@query(
    "quantile_normalize",
    oracle="""
    WITH r AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                 AS rnk,
             count(*) OVER () AS n
      FROM orders WHERE o_orderkey < 4000)
    SELECT o_orderkey, round((rnk - 0.5) / n, 6) AS qnorm
    FROM r ORDER BY o_orderkey
    """,
)
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization ((rank − 0.5)/n — the rankit
    transform ML preprocessing applies to heavy-tailed features):
    built on the DISTRIBUTED exact-rank operator
    (operators/ranking.py), so unlike the oracle's global
    row_number() window there is no single-partition sort anywhere in
    the plan — the same values at any scale. The ntile queries share
    this machinery; this is its continuous-valued use."""
    from hdsp_hive_release_src_spark.operators.ranking import (
        with_global_rank,
    )

    o = Catalog(spark, sf_dir).orders.where(
        F.col("o_orderkey") < 4000
    ).select("o_orderkey", "o_totalprice")
    ranked, total = with_global_rank(
        o, "o_totalprice", ["o_orderkey"], rank_col="__rank"
    )
    return (
        ranked.select(
            "o_orderkey",
            F.round((F.col("__rank") - 0.5) / total, 6).alias("qnorm"),
        )
        .orderBy("o_orderkey")
    )
