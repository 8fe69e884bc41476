"""SURVEY.md §2.2/§2.3 round-7 — classic warehouse product analytics:

- ``rfm_segmentation`` — recency/frequency/monetary quartile scoring
  (the standard CRM segmentation). Monetary is exact integer cents;
  every quartile is an ntile over a TOTAL order (metric, user_id), so
  assignment is deterministic in both engines.
- ``trending_items_daily`` — per-day top-3 items by event count (the
  trending-now rollup); rank over (count desc, item) is total-ordered.
- ``kmv_distinct_estimate`` — K-Minimum-Values distinct-count
  estimation with the same int64-exact affine hashing as the CMS /
  Bloom family: the k-th smallest hash over the distinct stream gives
  est = (k-1)·P / h_k; output pins estimate vs exact with integer
  permille error. The k-smallest selection is a distributed
  TakeOrdered (per-partition partial top-k), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.queries.llm10 import CMS_P
from hdsp_hive_release_src_spark.registry import query


@query(
    "rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx
                    FROM events),
    base AS (
      SELECT user_id,
             date_diff('day',
                       CAST(max(CAST(ts AS TIMESTAMP)) AS DATE),
                       CAST(anchor.mx AS DATE)) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM events CROSS JOIN anchor
      GROUP BY user_id, anchor.mx),
    scored AS (
      SELECT *,
             ntile(4) OVER (ORDER BY recency_days ASC, user_id)
                 AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
             ntile(4) OVER (ORDER BY monetary_cents DESC, user_id)
                 AS m_q
      FROM base)
    SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary_cents,
           r_q, f_q, m_q,
           CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
    FROM scored ORDER BY user_id
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation —
    the standard CRM cut. Recency anchors on the corpus max
    timestamp (1-row broadcast, so the query is reproducible instead
    of wall-clock dependent); monetary is exact integer cents (the
    cents idiom — a float sum would be accumulation-order noise);
    each quartile is ntile(4) over a TOTAL order with user_id
    tie-break, making assignment deterministic cross-engine. The
    three quartile assignments run through the distributed
    exact-ntile operator (operators/ranking.py: approx-percentile
    range split + per-range rank + exact offsets — bit-identical to
    the SQL window by the operator's property tests), so there is NO
    single-partition global window: the user dimension grows with
    the fact table, and a partitionless ntile would be a one-task
    sort at 100 TB. The oracle stays the plain ntile(4) windows."""
    ev = Catalog(spark, sf_dir).events
    # r13 subtree-audit fix: the corpus-max anchor was its own events
    # pass; the global max equals the max over per-user maxes, so one
    # user-grain rollup (checkpointed — three ntile calls consume it)
    # carries everything and events is scanned ONCE (was 14 before the
    # exact_ntile input-materialization fix, 2 after, 1 now).
    # r15: checkpoint_reduced (not raw localCheckpoint) so the three
    # exact_ntile calls' verified tier classifier recognizes this
    # user-grain rollup as a proven reduced materialization and keeps
    # the cheap checkpoint tier for their input materializations.
    from hdsp_hive_release_src_spark.operators.materialize import (
        checkpoint_reduced,
    )

    per_user = checkpoint_reduced(
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    anchor = per_user.agg(F.max("last_d").alias("mx"))
    base = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("mx"), F.col("last_d")).alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    from hdsp_hive_release_src_spark.operators.ranking import (
        exact_ntile,
    )

    scored = base.select(
        "user_id",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary_cents",
    )
    scored = exact_ntile(
        scored, "recency_days", ["user_id"], 4, bucket_col="r_q"
    )
    scored = exact_ntile(
        scored,
        "frequency",
        ["user_id"],
        4,
        descending=True,
        bucket_col="f_q",
    )
    scored = exact_ntile(
        scored,
        "monetary_cents",
        ["user_id"],
        4,
        descending=True,
        bucket_col="m_q",
    )
    return (
        scored.withColumn(
            "rfm_code",
            (
                F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")
            ).cast("int"),
        )
        .orderBy("user_id")
    )


@query(
    "trending_items_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                  AS TIMESTAMP) AS day,
             CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS item,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT *, rank() OVER (PARTITION BY day
                             ORDER BY n DESC, item) AS rnk
      FROM daily)
    SELECT day, item, CAST(n AS BIGINT) AS n, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3 ORDER BY day, rnk, item
    """,
)
def trending_items_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day top-3 trending items (the "trending now" rollup): one
    (day, item) count aggregation, then a rank window PARTITIONED BY
    day — the partitioned window is the scale-safe shape (each day
    sorts independently; no global ordering anywhere). Rank ties
    break on item id in both engines."""
    ev = Catalog(spark, sf_dir).events
    daily = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.get_json_object("props", "$.k")
            .cast("long")
            .alias("item"),
        )
        .groupBy("day", "item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("n").desc(), F.col("item")
    )
    return (
        daily.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "day",
            "item",
            F.col("n").cast("long"),
            F.col("rnk").cast("int"),
        )
        .orderBy("day", "rnk", "item")
    )


#: KMV parameters: k minimum values under the affine hash (a, b) over
#: the shared prime CMS_P. k = 8 so the estimator stays defined at
#: smoke scale too (sf0.001 has only 15 distinct users; k must not
#: exceed the distinct count or the k-th minimum doesn't exist).
KMV_K = 8
KMV_A, KMV_B = 6361, 499


@query(
    "kmv_distinct_estimate",
    oracle=f"""
    WITH ids AS (SELECT DISTINCT user_id FROM events),
    hashed AS (
      SELECT user_id,
             ({KMV_A} * user_id + {KMV_B}) % {CMS_P} AS h
      FROM ids),
    kth AS (
      SELECT h FROM hashed ORDER BY h, user_id
      LIMIT 1 OFFSET {KMV_K - 1})
    SELECT CAST({KMV_K} AS INT) AS k,
           CAST(kth.h AS BIGINT) AS kth_hash,
           CAST(CAST({KMV_K} - 1 AS BIGINT) * {CMS_P} // kth.h AS BIGINT)
               AS estimated_distinct,
           CAST((SELECT count(*) FROM ids) AS BIGINT)
               AS exact_distinct,
           CAST(abs(CAST({KMV_K} - 1 AS BIGINT) * {CMS_P} // kth.h
                    - (SELECT count(*) FROM ids)) * 1000
                // (SELECT count(*) FROM ids) AS BIGINT)
               AS err_permille
    FROM kth
    """,
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct estimation: hash every distinct id
    with the int64-exact affine map, keep the k smallest hashes (a
    distributed TakeOrdered — per-partition partial top-k, no global
    sort), and estimate |D| ≈ (k-1)·P / h_(k). The mergeable-sketch
    cousin of HLL with an exactly replayable hash, so the oracle
    pins estimate AND error, not just "close enough". Integer
    division throughout."""
    ev = Catalog(spark, sf_dir).events
    # r13 subtree-sweep fix: the k-th hash probe and the exact count
    # both re-ran the distinct from parquet. The id set is
    # dimension-sized — checkpoint once.
    ids = ev.select("user_id").distinct().localCheckpoint()
    hashed = ids.select(
        "user_id",
        ((F.lit(KMV_A) * F.col("user_id") + KMV_B) % CMS_P).alias("h"),
    )
    kth = (
        hashed.orderBy("h", "user_id")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth_hash"))
    )
    exact = ids.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return (
        kth.crossJoin(F.broadcast(exact))
        .select(
            F.lit(KMV_K).cast("int").alias("k"),
            F.col("kth_hash").cast("long"),
            F.expr(f"({KMV_K} - 1) * cast({CMS_P} as bigint) div kth_hash")
            .cast("long")
            .alias("estimated_distinct"),
            F.col("exact_distinct").cast("long"),
            F.expr(
                f"abs(({KMV_K} - 1) * cast({CMS_P} as bigint)"
                " div kth_hash"
                " - exact_distinct) * 1000 div exact_distinct"
            )
            .cast("long")
            .alias("err_permille"),
        )
    )


#: rsd (relative standard deviation) settings exercised; bound factor
#: 4σ keeps the contract check deterministic-but-meaningful.
_ACD_RSDS = ("0.01", "0.05", "0.1")


def _acd_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {r} AS rsd" for r in _ACD_RSDS
    )
    return f"""
    WITH exact AS (
      SELECT count(DISTINCT user_id) AS n FROM events)
    SELECT CAST(rsd AS DOUBLE) AS rsd,
           CAST(exact.n AS BIGINT) AS exact_distinct,
           TRUE AS within_4sigma
    FROM ({rows}) CROSS JOIN exact
    ORDER BY rsd
    """


@query("approx_count_distinct_rsd", oracle=_acd_oracle())
def approx_count_distinct_rsd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """approx_count_distinct's accuracy knob: the rsd parameter
    trades sketch size for error. HLL++ register merging is
    max-based (commutative + associative), so the estimate is
    partition-order INDEPENDENT — but engine-specific, so the oracle
    pins the CONTRACT: |estimate − exact| ≤ 4·rsd·exact at every
    precision, alongside the exact count. A precision regression (or
    an rsd argument silently ignored) flips the boolean at the tight
    rsd and fails the hash."""
    ev = Catalog(spark, sf_dir).events
    # r12 scan-count fix: the exact count and each precision's sketch
    # ran as separate aggregations (4 scans measured). One wide
    # aggregate computes all of them in a single pass; the 1-row
    # result is checkpointed and reshaped to long.
    wide = ev.agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        *[
            F.approx_count_distinct("user_id", float(r)).alias(
                f"est_{i}"
            )
            for i, r in enumerate(_ACD_RSDS)
        ],
    ).localCheckpoint()
    ests = [
        wide.select(
            F.lit(float(r)).alias("rsd"),
            F.col(f"est_{i}").alias("est"),
            "exact_distinct",
        )
        for i, r in enumerate(_ACD_RSDS)
    ]
    union = ests[0]
    for e in ests[1:]:
        union = union.unionAll(e)
    return (
        union
        .select(
            "rsd",
            F.col("exact_distinct").cast("long"),
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= 4 * F.col("rsd") * F.col("exact_distinct")
            ).alias("within_4sigma"),
        )
        .orderBy("rsd")
    )
