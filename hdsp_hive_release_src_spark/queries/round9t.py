"""SURVEY.md §2 round-9 twentieth wave (queued for the r10 window) —
the native Datasketches / bitmap aggregate tier (Spark 4.x built-ins
that did not exist in the classic Hive surface):

- ``theta_sketch_set_ops`` — Theta sketches with FULL set algebra
  (union / intersection / difference — what HLL cannot do), pinned
  to the exactness contract: below the sketch's nominal entries the
  estimates are exact, so the oracle is plain distinct-set SQL.
- ``kll_quantile_sketch_contract`` — KLL quantile sketches in exact
  mode (n ≤ k per group): get_quantile(q) returns the sorted
  element at the inclusive rank ceil(q·n)−1, replayed verbatim by
  an ordered-offset oracle — the mergeable-quantile building block,
  gated exactly.
- ``approx_top_k_merge_contract`` — the MERGEABLE approx_top_k form
  (accumulate per partition-group → combine → estimate): the
  two-level distributed aggregation shape, exact when the tracked
  budget exceeds the domain.
- ``bitmap_set_algebra`` — bitmap_construct/or/and aggregates with
  proper 32768-bit bucketing on the id domain (the roaring-style
  audience-overlap primitive), counts exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


# --------------------------------------------------------------------
# theta sketch set algebra
# --------------------------------------------------------------------

_THETA_ORACLE = """
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS est_purchasers,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS est_clickers,
       CAST((SELECT count(*) FROM (SELECT * FROM a UNION
                                   SELECT * FROM b)) AS BIGINT)
           AS est_union,
       CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT
                                   SELECT * FROM b)) AS BIGINT)
           AS est_intersection,
       CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT
                                   SELECT * FROM b)) AS BIGINT)
           AS est_difference
"""


@query("theta_sketch_set_ops", oracle=_THETA_ORACLE)
def theta_sketch_set_ops(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Datasketches THETA set algebra on the purchaser/clicker
    audience sets: union, intersection AND difference estimates from
    two sketches — the set operations HLL fundamentally cannot do,
    and the reason warehouses keep theta sketches per segment. The
    exactness contract (same idiom as hll_sketch_union /
    approx_top_k_contract): both id sets sit far below the default
    4096 nominal entries, so the sketch never samples and every
    estimate is exactly the true count — the oracle is plain
    distinct-set SQL. Sketches build in one pass each and are
    constant-size mergeable state."""
    ev = Catalog(spark, sf_dir).events
    a = ev.where(F.col("event_type") == "purchase").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    b = ev.where(F.col("event_type") == "click").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    return (
        a.select(F.col("sk").alias("ska"))
        .crossJoin(B(b.select(F.col("sk").alias("skb"))))
        .select(
            F.expr("theta_sketch_estimate(ska)")
            .cast("long")
            .alias("est_purchasers"),
            F.expr("theta_sketch_estimate(skb)")
            .cast("long")
            .alias("est_clickers"),
            F.expr("theta_sketch_estimate(theta_union(ska, skb))")
            .cast("long")
            .alias("est_union"),
            F.expr(
                "theta_sketch_estimate(theta_intersection(ska, skb))"
            )
            .cast("long")
            .alias("est_intersection"),
            F.expr(
                "theta_sketch_estimate(theta_difference(ska, skb))"
            )
            .cast("long")
            .alias("est_difference"),
        )
    )


# --------------------------------------------------------------------
# KLL quantile sketch, exact mode
# --------------------------------------------------------------------

#: sample modulus and explicit k: the per-priority sample stays well
#: under k at every test scale (sf0.1: ~150 rows/priority), so the
#: KLL sketch never compacts and get_quantile is EXACT — the sorted
#: element at the INCLUSIVE rank ceil(q·n)−1, 0-based (verified
#: empirically: n=150 q=.5 → idx 74, q=.25 → idx 37; n=15 q=.75 →
#: idx 11 — floor((n−1)q) matches the first two but NOT the third).
KLL_MOD = 199
KLL_K = 800

_KLL_ORACLE = f"""
WITH s AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders WHERE o_orderkey % {KLL_MOD} = 0),
g AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n,
         list_sort(list(c)) AS vs
  FROM s GROUP BY priority)
SELECT priority, n,
       CAST(vs[1] AS BIGINT) AS min_cents,
       CAST(vs[greatest(1, CAST(ceil(n * 0.25) AS INT))] AS BIGINT)
           AS q1_cents,
       CAST(vs[greatest(1, CAST(ceil(n * 0.5) AS INT))] AS BIGINT)
           AS med_cents,
       CAST(vs[greatest(1, CAST(ceil(n * 0.75) AS INT))] AS BIGINT)
           AS q3_cents,
       CAST(vs[CAST(n AS INT)] AS BIGINT) AS max_cents
FROM g ORDER BY priority
"""


@query("kll_quantile_sketch_contract", oracle=_KLL_ORACLE)
def kll_quantile_sketch_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Datasketches KLL quantile sketches pinned to their EXACT mode:
    per priority, a bounded price sample (n ≤ {KLL_K} = k, so the
    sketch never compacts) yields get_n plus the min/q1/median/q3/max
    quantiles; in exact mode get_quantile(q) is the sorted element at
    the inclusive rank ceil(q·n)−1, which the oracle replays with an
    ordered-list offset — sketch answers gated to the digit. This is
    the mergeable-quantile building block (constant-size state,
    two-level combinable) that replaces a full sort at 100 TB; past
    the exact regime the same query returns rank-error-bounded
    answers with an unchanged plan."""
    o = Catalog(spark, sf_dir).orders
    s = o.where(F.col("o_orderkey") % KLL_MOD == 0).select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    agg = s.groupBy("priority").agg(
        F.expr(f"kll_sketch_agg_bigint(c, {KLL_K})").alias("sk")
    )
    q = "kll_sketch_get_quantile_bigint"
    return agg.select(
        "priority",
        F.expr("kll_sketch_get_n_bigint(sk)").cast("long").alias("n"),
        F.expr(f"{q}(sk, 0.0)").cast("long").alias("min_cents"),
        F.expr(f"{q}(sk, 0.25)").cast("long").alias("q1_cents"),
        F.expr(f"{q}(sk, 0.5)").cast("long").alias("med_cents"),
        F.expr(f"{q}(sk, 0.75)").cast("long").alias("q3_cents"),
        F.expr(f"{q}(sk, 1.0)").cast("long").alias("max_cents"),
    ).orderBy("priority")


# --------------------------------------------------------------------
# mergeable approx_top_k
# --------------------------------------------------------------------

_TOPK_MERGE_ORACLE = """
SELECT lang AS item, CAST(count(*) AS BIGINT) AS cnt
FROM documents GROUP BY lang ORDER BY cnt DESC, item LIMIT 5
"""


@query("approx_top_k_merge_contract", oracle=_TOPK_MERGE_ORACLE)
def approx_top_k_merge_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MERGEABLE approx_top_k pipeline — accumulate a partial
    sketch per source group, combine the partials, estimate once —
    i.e. the two-level distributed aggregation every sketch runs at
    cluster scale (partials travel, raw rows don't). Exactness
    contract as in approx_top_k_contract: the tracked budget (100)
    dwarfs the language domain (5), so the combined estimate must
    equal a plain GROUP BY; results exploded and re-sorted
    (count desc, item) so the gate never depends on sketch tie
    order."""
    docs = Catalog(spark, sf_dir).documents
    partials = docs.groupBy("source").agg(
        F.expr("approx_top_k_accumulate(lang, 100)").alias("st")
    )
    combined = partials.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(st), 5)")
        .alias("tk")
    )
    return (
        combined.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "item")
    )


# --------------------------------------------------------------------
# bitmap aggregate set algebra
# --------------------------------------------------------------------

_BITMAP_ORACLE = """
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_purchasers,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS n_viewers,
       CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT
                                   SELECT * FROM b)) AS BIGINT)
           AS n_both,
       CAST((SELECT count(*) FROM (SELECT * FROM a UNION
                                   SELECT * FROM b)) AS BIGINT)
           AS n_either
"""


@query("bitmap_set_algebra", oracle=_BITMAP_ORACLE)
def bitmap_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via the bitmap aggregate family — the
    roaring-bitmap-style primitive: each audience becomes per-bucket
    32768-bit bitmaps (bitmap_bucket_number / bitmap_bit_position on
    user_id+1 — positions are (x−1) mod 32768, so ids are shifted
    off the 0 collision), AND/OR-agg-merged per bucket and counted
    (Spark 4.1 ships only the aggregate combinators).
    Counts are exact by construction (a bitmap is the set), and the
    bucketing means the same plan holds when the id domain outgrows
    one bitmap: the shuffle key is (bucket), state is 4 KB per
    bucket per side. Oracle: plain set SQL."""
    ev = Catalog(spark, sf_dir).events

    def bitmaps(pred):
        return (
            ev.where(pred)
            .select((F.col("user_id") + 1).alias("uid"))
            .groupBy(F.expr("bitmap_bucket_number(uid)").alias("bkt"))
            .agg(
                F.expr(
                    "bitmap_construct_agg(bitmap_bit_position(uid))"
                ).alias("bm")
            )
        )

    a = bitmaps(F.col("event_type") == "purchase").select(
        "bkt", "bm", F.lit(1).alias("side")
    )
    b = bitmaps(F.col("event_type") == "view").select(
        "bkt", "bm", F.lit(2).alias("side")
    )
    # each side contributes EXACTLY one bitmap per bucket, so per
    # bucket: or_agg = either, and_agg = both (valid only when both
    # sides are present — the n_sides guard), per-side counts by
    # conditional sum. Only *_agg bitmap combinators exist (there is
    # no scalar bitmap_and/bitmap_or in Spark 4.1).
    u = a.unionByName(b)
    per_bucket = u.groupBy("bkt").agg(
        F.sum(
            F.when(F.col("side") == 1, F.expr("bitmap_count(bm)"))
            .otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("side") == 2, F.expr("bitmap_count(bm)"))
            .otherwise(0)
        ).alias("cb"),
        F.expr("bitmap_count(bitmap_and_agg(bm))").alias("cand"),
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("ceither"),
        F.count(F.lit(1)).alias("n_sides"),
    )
    return per_bucket.select(
        "ca",
        "cb",
        F.when(F.col("n_sides") == 2, F.col("cand"))
        .otherwise(0)
        .alias("cboth"),
        "ceither",
    ).agg(
        F.sum("ca").cast("long").alias("n_purchasers"),
        F.sum("cb").cast("long").alias("n_viewers"),
        F.sum("cboth").cast("long").alias("n_both"),
        F.sum("ceither").cast("long").alias("n_either"),
    )
