"""SURVEY.md §2 round-9 twenty-eighth wave (queued for the r10
window) — privacy risk and marketing attribution depth:

- ``k_anonymity_audit`` — the re-identification risk report: group
  the table by its quasi-identifiers, histogram the group sizes
  (capped at 5+), and per size bucket count the groups that are also
  l-diversity-1 on a sensitive attribute (homogeneous groups leak
  the attribute even when k is met) — the audit run before any
  "anonymized" data share.
- ``touch_attribution`` — first-touch vs last-touch revenue
  attribution: every purchase's cents credited once to the user's
  FIRST event type and once to the LAST non-purchase type seen
  before the purchase (running last_value … IGNORE NULLS — one
  sessionization-shaped window), aggregated per channel. The two
  models' totals must both equal total purchase revenue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

#: k threshold and the acctbal band width (dollars) of the third
#: quasi-identifier.
KANON_K = 5
KANON_BAND = 2000

_KANON_ORACLE = f"""
WITH q AS (
  SELECT c_nationkey AS n, c_mktsegment AS m,
         CAST(round(c_acctbal * 100) AS BIGINT) // {KANON_BAND * 100}
             AS band,
         CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS sensitive
  FROM customer),
g AS (
  SELECT n, m, band, CAST(count(*) AS BIGINT) AS sz,
         CAST(count(DISTINCT sensitive) AS BIGINT) AS l_div
  FROM q GROUP BY n, m, band)
SELECT CAST(least(sz, {KANON_K}) AS BIGINT) AS size_bucket,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END)
            AS BIGINT) AS rows_at_risk,
       CAST(sum(CASE WHEN l_div = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS homogeneous_groups
FROM g GROUP BY 1 ORDER BY size_bucket
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the customer table: the
    quasi-identifier is (nation, segment, ${KANON_BAND}-dollar
    balance band) — the combination an adversary can look up — and
    the sensitive attribute is the negative-balance flag. Per
    group-size bucket (sizes capped at {KANON_K}+): group count,
    covered rows, rows in groups below k (re-identifiable), and
    groups with l-diversity 1 (every member shares the sensitive
    value, so even a k-anonymous group leaks it). One groupBy at the
    quasi-id grain, one bounded rollup — the shape scales to any
    table width."""
    c = Catalog(spark, sf_dir).customer
    q = c.select(
        F.col("c_nationkey").alias("n"),
        F.col("c_mktsegment").alias("m"),
        F.expr(
            f"cast(round(c_acctbal * 100) as bigint)"
            f" div {KANON_BAND * 100}"
        ).alias("band"),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias(
            "sensitive"
        ),
    )
    g = q.groupBy("n", "m", "band").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct("sensitive").cast("long").alias("l_div"),
    )
    return (
        g.groupBy(
            F.least(F.col("sz"), F.lit(KANON_K))
            .cast("long")
            .alias("size_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("sz").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("sz") < KANON_K, F.col("sz")).otherwise(0)
            )
            .cast("long")
            .alias("rows_at_risk"),
            F.sum(F.when(F.col("l_div") == 1, 1).otherwise(0))
            .cast("long")
            .alias("homogeneous_groups"),
        )
        .orderBy("size_bucket")
    )


_TOUCH_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         first_value(event_type) OVER w AS first_touch,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
             OVER w AS last_touch
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)),
p AS (
  SELECT coalesce(first_touch, 'none') AS ft,
         coalesce(last_touch, 'none') AS lt, cents
  FROM seq WHERE event_type = 'purchase'),
channels AS (
  SELECT ft AS channel FROM p UNION SELECT lt FROM p)
SELECT channel,
       CAST(coalesce(sum(CASE WHEN p.ft = channel THEN cents END), 0)
            AS BIGINT) AS first_touch_cents,
       CAST(coalesce(sum(CASE WHEN p.lt = channel THEN cents END), 0)
            AS BIGINT) AS last_touch_cents
FROM channels LEFT JOIN p ON p.ft = channel OR p.lt = channel
GROUP BY channel ORDER BY channel
"""


@query("touch_attribution", oracle=_TOUCH_ORACLE)
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution, first-touch vs last-touch side by side:
    each purchase's cents are credited to the user's FIRST-ever event
    type and to the LAST non-purchase type preceding the purchase
    (running last_value with IGNORE NULLS over the one (user, time)
    window sessionization already pays for; a purchase with no prior
    touch lands in 'none'). Per channel, the two models' revenue —
    each column independently sums to total purchase revenue, so the
    report shows exactly how much credit MOVES between channels when
    the model changes. Window + bounded channel aggregate."""
    ev = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.first("event_type").over(w).alias("first_touch"),
        F.last(
            F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_touch"),
    )
    p = seq.where(F.col("event_type") == "purchase").select(
        F.coalesce("first_touch", F.lit("none")).alias("ft"),
        F.coalesce("last_touch", F.lit("none")).alias("lt"),
        "cents",
    )
    ft = p.groupBy(F.col("ft").alias("channel")).agg(
        F.sum("cents").cast("long").alias("first_touch_cents")
    )
    lt = p.groupBy(F.col("lt").alias("channel")).agg(
        F.sum("cents").cast("long").alias("last_touch_cents")
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("first_touch_cents", F.lit(0))
            .cast("long")
            .alias("first_touch_cents"),
            F.coalesce("last_touch_cents", F.lit(0))
            .cast("long")
            .alias("last_touch_cents"),
        )
        .orderBy("channel")
    )
