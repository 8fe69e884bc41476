"""SURVEY.md §2 round-9 nineteenth wave (queued for the r10 window) —
ANSI WITH TIES semantics and user-journey paths:

- ``fetch_with_ties_emulation`` — ANSI ``FETCH FIRST k ROWS WITH
  TIES`` (neither Spark nor DuckDB parses it): the result set is all
  rows whose sort key ties the k-th row's key. The Spark plan is the
  SCALABLE form — a k-row TakeOrdered probe finds the threshold,
  broadcast back as a filter — while the oracle uses the textbook
  rank() formulation; both sides must agree exactly, including the
  tie overshoot past k.
- ``user_path_trigrams`` — the product-analytics "top user journeys"
  report: each user's first three events (deterministic (ts,
  event_id) order) joined into a path string, counted corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

#: WITH TIES fetch size: p_size has ~40 parts at the max size alone,
#: so the tie overshoot past k is guaranteed at every scale — the
#: semantics under test are visible in the row count.
TIES_K = 20

_TIES_ORACLE = f"""
WITH ranked AS (
  SELECT p_partkey, p_size, p_brand,
         rank() OVER (ORDER BY p_size DESC) AS rk
  FROM part)
SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_brand
FROM ranked WHERE rk <= {TIES_K}
ORDER BY p_size DESC, p_partkey
"""


@query("fetch_with_ties_emulation", oracle=_TIES_ORACLE)
def fetch_with_ties_emulation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANSI ``FETCH FIRST {TIES_K} ROWS WITH TIES`` over parts by
    size descending — every row tying the k-th row's sort key is
    kept, so the result legitimately overshoots k (≈40 parts share
    the max size alone). The Spark implementation is the plan that
    survives scale: a {TIES_K}-row TakeOrdered probe computes the
    threshold key (never a global rank window over the whole
    table — that is exactly the partitionless-sort scale-killer the
    repo bans), the threshold is broadcast, and the table is
    re-filtered with a pushable ≥ predicate. The oracle uses the
    textbook rank() formulation; agreement proves the emulation's
    tie semantics exact."""
    p = Catalog(spark, sf_dir).part
    thresh = (
        p.select("p_size")
        .orderBy(F.desc("p_size"))
        .limit(TIES_K)
        .agg(F.min("p_size").alias("cut"))
    )
    return (
        p.crossJoin(B(thresh))
        .where(F.col("p_size") >= F.col("cut"))
        .select(
            "p_partkey",
            F.col("p_size").cast("long").alias("p_size"),
            "p_brand",
        )
        .orderBy(F.desc("p_size"), "p_partkey")
    )


_PATH_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
first3 AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path,
         CAST(count(*) AS BIGINT) AS n_steps
  FROM seq WHERE rn <= 3 GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM first3 WHERE n_steps = 3
GROUP BY path ORDER BY n_users DESC, path LIMIT 15
"""


@query("user_path_trigrams", oracle=_PATH_ORACLE)
def user_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey openings: each user's FIRST THREE events
    (deterministic (ts, event_id) order — the sessionization
    tiebreak), joined into an ordered path string and counted across
    the corpus — the onboarding-funnel Sankey's input table. One
    (user, ts) window pass (row_number, early-filtered to rn ≤ 3 so
    the join-up is three rows per user), one bounded path aggregate;
    users with fewer than three events are excluded (partial paths
    would double-count prefixes). Deterministic (count, path)
    top-15."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 3)
    first3 = seq.groupBy("user_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(rn,"
                " event_type))), s -> s.event_type)"
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).cast("long").alias("n_steps"),
    )
    return (
        first3.where(F.col("n_steps") == 3)
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(15)
    )
