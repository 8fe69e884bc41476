"""SURVEY.md §2 round-6 additions, governance + sketch-contract wave:
row-level security via parameterized secure views (the Hive/Ranger
RLS pattern expressed with Spark 4 session variables) and the
rank-error contract of approx percentiles (the guarantee that lets a
100 TB pipeline replace exact sorts with sketches)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.materialize import (
    checkpoint_reduced_and_release,
    persist_fact_rows,
)
from hdsp_hive_release_src_spark.registry import query

# percentile_approx accuracy parameter and the rank-error bound it
# guarantees: epsilon = 1/ACC relative rank error (GK/KLL contract).
ACC = 10000


@query(
    "rls_secure_view",
    oracle="""
    SELECT 'BUILDING' AS acting_segment, count(*) AS n_visible,
           CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 'MACHINERY', count(*),
           CAST(sum(o.o_orderkey) AS BIGINT)
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'MACHINERY'
    ORDER BY acting_segment
    """,
)
def rls_secure_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security as a parameterized secure VIEW: the view
    body filters on a session VARIABLE (the acting principal's
    segment), so every reader sees only their rows — the exact
    pattern Hive deploys via Ranger row-filter policies, expressed
    with Spark 4 session variables + a view (no engine fork needed).
    The query reads the SAME view under two different principals and
    returns both visibility sets; parity proves the filter is
    dynamic (re-evaluated per read), not baked in at view creation.
    Scale shape: the variable is a plan-time literal, so the
    predicate pushes into the customer scan like any constant —
    RLS costs nothing beyond the filter itself."""
    cat = Catalog(spark, sf_dir)
    cat.orders.createOrReplaceTempView("rls_orders_src")
    cat.customer.createOrReplaceTempView("rls_customer_src")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE rls_segment STRING DEFAULT ''"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW rls_orders AS
        SELECT o.o_orderkey, o.o_totalprice, c.c_mktsegment
        FROM rls_orders_src o JOIN rls_customer_src c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = rls_segment
        """
    )
    frames = []
    for segment in ("BUILDING", "MACHINERY"):
        spark.sql(f"SET VAR rls_segment = '{segment}'")
        frames.append(
            spark.table("rls_orders")
            .agg(
                F.count(F.lit(1)).alias("n_visible"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
            )
            .select(
                F.lit(segment).alias("acting_segment"),
                "n_visible",
                "key_sum",
            )
        )
    return frames[0].unionAll(frames[1]).orderBy("acting_segment")


@query(
    "approx_quantile_rank_contract",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(CAST(quantile_cont(l_extendedprice, 0.5)
                 AS DOUBLE), 4) AS exact_p50,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_quantile_rank_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sketch contract behind percentile_approx (GK/KLL): an
    approximate p-quantile's TRUE rank must lie within ε·n of p·n
    (ε = 1/accuracy). Same tolerance-oracle shape as approx_distinct
    and minhash_estimate_accuracy: the approx VALUES are
    sketch-internal (and can vary with merge order), so the output
    carries the exact interpolated median plus Spark-verified
    booleans — the oracle pins exact values and literal TRUEs. This
    bound is what lets a 100 TB pipeline cut data-skew boundaries,
    equi-depth histograms, and range-split points from one sketch
    pass instead of a full sort: the error is a contract, not a
    hope. Two scans (sketch, rank check), both fully partial-
    aggregated; the 3-row approx table is broadcast into the rank
    count."""
    li = Catalog(spark, sf_dir).lineitem
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), ACC
        ).alias("ap")
    ).select(
        "l_returnflag",
        F.col("ap")[0].alias("a50"),
        F.col("ap")[1].alias("a90"),
    )
    ranked = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("a50"), 1)
                .otherwise(0)
            ).alias("r50"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("a90"), 1)
                .otherwise(0)
            ).alias("r90"),
            F.round(
                F.expr("percentile(l_extendedprice, 0.5)"), 4
            ).alias("exact_p50"),
        )
    )
    eps_slack = F.col("n") / ACC + 1
    return ranked.select(
        "l_returnflag",
        "n",
        "exact_p50",
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= eps_slack).alias(
            "p50_rank_ok"
        ),
        (F.abs(F.col("r90") - 0.9 * F.col("n")) <= eps_slack).alias(
            "p90_rank_ok"
        ),
    ).orderBy("l_returnflag")


@query(
    "sql_scalar_macro",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2)
               AS disc_revenue
    FROM lineitem WHERE l_orderkey < 5000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_scalar_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar function (CREATE FUNCTION ... RETURNS DOUBLE RETURN
    expr, Spark 4) — the typed, server-side replacement for Hive's
    CREATE TEMPORARY MACRO: a named expression registered once and
    reused across queries. The body INLINES at plan time, so calling
    it inside an aggregate keeps whole-stage codegen and partial
    aggregation — zero overhead vs writing the expression by hand
    (unlike a Python UDF, which would serialize every row). The
    oracle inlines the same expression; parity proves the inlining
    is semantically exact. Complements `sql_table_function` (RETURNS
    TABLE) and `sql_udf_registration` (Python scalar)."""
    Catalog(spark, sf_dir).lineitem.where(
        F.col("l_orderkey") < 5000
    ).createOrReplaceTempView("macro_lineitem_src")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(
            p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1.0 - d)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               round(sum(disc_price(l_extendedprice, l_discount)), 2)
                   AS disc_revenue
        FROM macro_lineitem_src
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@query(
    "fixed_size_hash_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents ORDER BY h, doc_id LIMIT 200)
    SELECT count(*) AS k,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           round(avg(n_chars), 4) AS avg_chars,
           min(h) AS h_lo, max(h) AS h_hi
    FROM ranked
    """,
)
def fixed_size_hash_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic fixed-SIZE uniform sample: the k smallest rows by
    a keyed hash (md5 of the key) — the eval-set / debugging cut every
    pipeline needs that percent-sampling can't give (TABLESAMPLE's
    size drifts with the data; this is exactly k, reproducible on any
    engine, and stable under appends for the rows already chosen
    unless a smaller hash arrives, i.e. a consistent bottom-k sketch).
    Scale shape: ORDER BY hash LIMIT k plans as
    TakeOrderedAndProject — a per-partition top-k heap merged on the
    driver, O(k) memory, NO global sort and no single-partition
    stage (plan-asserted in tests). The oracle replays the identical
    hash ranking; the output checksums the chosen id set so a single
    membership difference breaks parity."""
    d = Catalog(spark, sf_dir).documents
    ranked = (
        d.select(
            "doc_id",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(200)
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("h").alias("h_lo"),
        F.max("h").alias("h_hi"),
    )


@query(
    "interval_overlap_join",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + 7 AS e
      FROM orders WHERE o_orderkey < 1200),
    pts AS (
      SELECT CAST(l_shipdate AS DATE) AS p FROM lineitem
      WHERE l_orderkey >= 3000 AND l_orderkey < 4500)
    SELECT iv.o_orderkey, count(pts.p) AS n_ships
    FROM iv LEFT JOIN pts ON pts.p >= iv.s AND pts.p < iv.e
    GROUP BY iv.o_orderkey ORDER BY iv.o_orderkey
    """,
)
def interval_overlap_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pure range join — point-in-interval with NO equi key (ships
    from unrelated orders counted inside each order's 7-day window).
    Naively this is a cartesian product with an inequality filter —
    the plan shape that does not complete at scale. The classic fix,
    implemented here: GRID BUCKETING. Time is cut into buckets the
    width of the interval (7 days), each interval is replicated into
    the ≤2 distinct buckets it touches (array_distinct — a
    same-bucket duplicate would double-count), each point lands in
    exactly ONE bucket, and the join becomes an EQUI-join on bucket
    id + a residual range filter. A point can meet an interval only
    in the point's own bucket, so no post-join dedup is needed.
    Cost: shuffle on bucket id with ≤2× interval replication — vs
    |iv|×|pts| for the cross join. The oracle computes the naive
    quadratic form (fine at test scale), so parity proves the
    bucketed rewrite is EXACTLY the naive semantics, zeros included
    (left join keeps empty windows). No CartesianProduct in the plan
    (test-asserted)."""
    cat = Catalog(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        cat.orders.where(F.col("o_orderkey") < 1200)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("s"),
            F.date_add(F.col("o_orderdate").cast("date"), 7).alias("e"),
        )
        .withColumn(
            "b",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.datediff(F.col("s"), epoch) / 7),
                        # last day inside [s, e) is e-1
                        F.floor(
                            F.datediff(F.date_sub(F.col("e"), 1), epoch)
                            / 7
                        ),
                    )
                )
            ),
        )
    )
    pts = (
        cat.lineitem.where(
            (F.col("l_orderkey") >= 3000) & (F.col("l_orderkey") < 4500)
        )
        .select(F.col("l_shipdate").cast("date").alias("p"))
        .withColumn("b", F.floor(F.datediff(F.col("p"), epoch) / 7))
    )
    joined = iv.join(
        pts,
        (iv["b"] == pts["b"])
        & (pts["p"] >= iv["s"])
        & (pts["p"] < iv["e"]),
        "left",
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count("p").alias("n_ships"))
        .orderBy("o_orderkey")
    )


@query(
    "json_schema_inference",
    oracle="""
    SELECT 'STRUCT<k: BIGINT>' AS inferred_schema,
           count(*) AS n_parsed,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def json_schema_inference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema inference for semi-structured columns: sample a
    document (deterministically: the min-event_id row — a bounded
    1-row driver read, the same planning-time sampling pass
    spark.read.json performs), infer its schema with schema_of_json,
    then parse the WHOLE column with the inferred schema and
    aggregate through the typed struct. Parity pins the inferred
    schema STRING itself (a type-mapping drift breaks the oracle)
    and proves the full-column parse agrees with path extraction.
    Scale: inference cost is O(sample), the parse is one map-side
    from_json over the corpus."""
    ev = Catalog(spark, sf_dir).events
    sample = (
        ev.orderBy("event_id").select("props").limit(1).collect()[0][0]
    )
    # schema_of_json over a literal Column — no hand-built SQL string,
    # so backslashes/quotes in the sampled document can't be re-parsed
    # as SQL escapes and corrupt the sample
    schema_str = (
        spark.range(1)
        .select(F.schema_of_json(F.lit(sample)).alias("s"))
        .collect()[0][0]
    )
    parsed = ev.select(
        F.from_json(F.col("props"), schema_str).alias("j")
    ).where(F.col("j.k").isNotNull())
    return parsed.agg(
        F.lit(schema_str).alias("inferred_schema"),
        F.count(F.lit(1)).alias("n_parsed"),
        F.sum("j.k").cast("long").alias("k_sum"),
    ).select("inferred_schema", "n_parsed", "k_sum")


@query(
    "trimmed_mean",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                 AS rnk,
             count(*) OVER () AS n
      FROM orders),
    mid AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM ranked
      WHERE rnk > n // 20 AND rnk <= n - n // 20)
    SELECT count(*) AS n_kept,
           CAST(sum(cents) AS BIGINT) AS cents_sum,
           round(sum(cents) / 100.0 / count(*), 4) AS trimmed_mean
    FROM mid
    """,
)
def trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of order value — the robust average every
    revenue dashboard wants (outliers clipped by RANK, not by a
    fixed threshold). Built on the distributed exact-rank operator
    (operators/ranking.py): no single-partition global window, rank
    thresholds are INTEGER (n//20), and the mean is derived from an
    exact integer cents sum with one final division — so no float
    accumulation ever crosses engines (the audit's design rule).
    DuckDB computes the same trim with a window; at test scale
    that's fine, at 100 TB only the range-decomposed rank
    survives."""
    from hdsp_hive_release_src_spark.operators.ranking import (
        with_global_rank,
    )

    o = Catalog(spark, sf_dir).orders

    # the 1-row trim aggregate runs as the operator's finalize so the
    # fact-row DISK_ONLY input cache is released before returning
    # (kmeans-style hygiene, r14) at the pinned 1 executed orders scan
    def trim(ranked: DataFrame, total: int) -> DataFrame:
        cut = total // 20
        mid = ranked.where(
            (F.col("rnk") > cut) & (F.col("rnk") <= total - cut)
        ).select(
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents")
        )
        return mid.agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.round(
                F.sum("cents") / 100.0 / F.count(F.lit(1)), 4
            ).alias("trimmed_mean"),
        )

    out, _total = with_global_rank(
        o.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        ["o_orderkey"],
        rank_col="rnk",
        finalize=trim,
    )
    return out


@query(
    "asof_join_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts
      FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, event_id AS view_event_id,
             CAST(ts AS TIMESTAMP) ts
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN v.ts >= p.ts - INTERVAL 30 MINUTE
                THEN v.view_event_id END AS fresh_view_id,
           CASE WHEN v.ts >= p.ts - INTERVAL 30 MINUTE
                THEN CAST(epoch_us(v.ts) AS BIGINT) END AS fresh_view_us
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join WITH a staleness tolerance (pandas
    merge_asof's `tolerance=`): each purchase gets the user's most
    recent prior view ONLY if it happened within the last 30 minutes
    — a quote/lookup older than the tolerance is stale and must NOT
    be carried (the difference between "the last known price" and
    "a price still valid"). Implemented as the same
    union+carry-forward window operator (operators/asof.py) carrying
    the right-side timestamp, with the tolerance applied as a
    post-carry mask — zero extra shuffles vs the unbounded as-of.
    DuckDB's native ASOF JOIN + the same mask is the oracle."""
    from hdsp_hive_release_src_spark.operators.asof import asof_join

    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join(
        purchases,
        views,
        left_on="ts",
        right_on="view_ts",
        by_left="user_id",
        by_right="user_id",
        value_cols=["view_event_id", "view_ts"],
        suffix="",
    )
    fresh = F.col("view_ts") >= F.col("ts") - F.expr(
        "INTERVAL 30 MINUTES"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("view_event_id")).alias("fresh_view_id"),
        F.when(fresh, F.unix_micros("view_ts").cast("long")).alias(
            "fresh_view_us"
        ),
    ).orderBy("event_id")


@query(
    "not_in_null_semantics",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders WHERE o_orderkey < 1000))
          AS not_in_clean,
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderkey = 999 THEN NULL
                          ELSE o_custkey END
              FROM orders WHERE o_orderkey < 1000))
          AS not_in_with_null,
      (SELECT count(*) FROM customer c
       WHERE NOT EXISTS
             (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderkey < 1000))
          AS not_exists
    """,
)
def not_in_null_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The NOT IN null trap, tri-valued logic made visible: NOT IN
    against a subquery that CONTAINS a NULL returns zero rows (x <>
    NULL is UNKNOWN, so no row can ever pass), while the same
    predicate without the NULL — and the NOT EXISTS form, which is
    null-immune — return the real anti-join count. Spark plans the
    nullable variant as a NullAwareAntiJoin (plan-asserted in
    tests); engines that get this wrong silently return wrong
    answers on any nullable FK. All three counts in one row so
    parity proves the semantics, not just one happy path."""
    cat = Catalog(spark, sf_dir)
    cat.customer.createOrReplaceTempView("nin_customer")
    cat.orders.createOrReplaceTempView("nin_orders")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM nin_customer
           WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM nin_orders
                  WHERE o_orderkey < 1000)) AS not_in_clean,
          (SELECT count(*) FROM nin_customer
           WHERE c_custkey NOT IN
                 (SELECT CASE WHEN o_orderkey = 999 THEN NULL
                              ELSE o_custkey END
                  FROM nin_orders WHERE o_orderkey < 1000))
              AS not_in_with_null,
          (SELECT count(*) FROM nin_customer c
           WHERE NOT EXISTS
                 (SELECT 1 FROM nin_orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderkey < 1000)) AS not_exists
        """
    )


@query(
    "funnel_windowed_strict",
    oracle="""
    WITH v AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS s2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND CAST(e.ts AS TIMESTAMP) > v.s1
        AND CAST(e.ts AS TIMESTAMP) <= v.s1 + INTERVAL 1 HOUR
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS s3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(e.ts AS TIMESTAMP) > c.s2
        AND CAST(e.ts AS TIMESTAMP) <= c.s2 + INTERVAL 1 HOUR
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_1h,
           (SELECT count(*) FROM p) AS n_purchased_1h
    """,
)
def funnel_windowed_strict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Strict sequential funnel with per-step deadlines: view →
    click within 1h OF THE VIEW → purchase within 1h OF THAT CLICK.
    Each stage RE-ANCHORS on the previous stage's qualifying event
    (min qualifying ts), which is what separates a conversion-window
    funnel from `funnel_counts`' first-occurrence ordering — a click
    that happens 3 days after the view must not advance the funnel
    even if it is the user's first click. Scale shape: one
    aggregation + equi-join per stage, all keyed on user_id — the
    same exchange reused down the chain; no windows, no inequality
    joins (the deadline rides as a join-filter residual)."""
    ev = Catalog(spark, sf_dir).events
    # r12 scan-count fix: each stage plus each final count re-ran the
    # events scan (6 measured). One scan materializes the three event
    # types; the per-user stage anchors v and c are checkpointed too
    # (user-sized, reduced) because each is consumed by both the next
    # stage and its funnel count. base is events-ROW-sized, so
    # DISK_ONLY persist, never localCheckpoint (materialize.py: fact
    # rows on non-reliable local storage die with their executor).
    base = persist_fact_rows(
        ev.where(
            F.col("event_type").isin("view", "click", "purchase")
        ).select("event_type", "user_id", "ts")
    )
    v = (
        base.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s1"))
        .localCheckpoint()
    )
    c = (
        base.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("s1"))
            & (F.col("ts") <= F.col("s1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("s2"))
        .localCheckpoint()
    )
    p = (
        base.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("s2"))
            & (F.col("ts") <= F.col("s2") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("s3"))
    )
    # r14 hygiene: the 1-row funnel summary is checkpointed off the
    # cache and the events-row persist released — no session cache
    return checkpoint_reduced_and_release(
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .join(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_clicked_1h"))))
        .join(
            F.broadcast(
                p.agg(F.count(F.lit(1)).alias("n_purchased_1h"))
            )
        ),
        base,
    )


@query(
    "cusum_drift_detection",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    params AS (
      SELECT event_type,
             (11 * sum(n)) // (10 * count(*)) AS k
      FROM daily GROUP BY event_type),
    c AS (
      SELECT daily.event_type, d, n, k,
             sum(n - k) OVER (PARTITION BY daily.event_type
                              ORDER BY d) AS cum
      FROM daily JOIN params ON daily.event_type = params.event_type),
    s AS (
      SELECT event_type, d, k,
             cum - least(0, min(cum) OVER (PARTITION BY event_type
                             ORDER BY d)) AS cusum
      FROM c)
    SELECT event_type, CAST(max(k) AS BIGINT) AS k,
           CAST(max(cusum) AS BIGINT) AS max_cusum,
           CAST(count(CASE WHEN cusum > 3 * k THEN 1 END) AS BIGINT)
               AS n_alert_days
    FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def cusum_drift_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-sided CUSUM drift detection over daily event volumes — the
    classic sequential change detector (Page 1954): S_t =
    max(0, S_{t-1} + x_t - k) alarms when the cumulated exceedance
    over the allowance k passes a threshold. The recursion is not
    window-expressible directly, but the closed form is:
    S_t = C_t - min(0, min_{i≤t} C_i) with C the running sum of
    (x - k) — a cumsum and a running min over the SAME
    partition/order, so both windows share one exchange and one
    sort. Everything is integer (daily counts, integer-division
    allowance k = ⌈1.1·mean⌉-ish, threshold 3k), so there is no
    float boundary anywhere. At 100 TB the input to the windows is
    the DAILY aggregate — window length = days, not events."""
    ev = Catalog(spark, sf_dir).events
    # r13 subtree-sweep fix: the allowance params and the window input
    # both re-ran the daily rollup from parquet. Day-grain table —
    # checkpoint once.
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint()
    params = daily.groupBy("event_type").agg(
        F.expr("(11 * sum(n)) div (10 * count(*))").alias("k")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    c = (
        daily.join(params, "event_type")
        .withColumn("cum", F.sum(F.col("n") - F.col("k")).over(w))
        .withColumn(
            "cusum",
            F.col("cum") - F.least(F.lit(0), F.min("cum").over(w)),
        )
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.max("k").cast("long").alias("k"),
            F.max("cusum").cast("long").alias("max_cusum"),
            F.count(
                F.when(F.col("cusum") > 3 * F.col("k"), F.lit(1))
            ).cast("long").alias("n_alert_days"),
        )
        .orderBy("event_type")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
                 AS next_type,
             lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_ts
      FROM events),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type
      FROM ordered
      WHERE next_type IS NOT NULL
        AND next_ts <= CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE)
    SELECT from_type, to_type, count(*) AS n,
           round(count(*) * 1.0 / sum(count(*))
                 OVER (PARTITION BY from_type), 6) AS p
    FROM trans GROUP BY from_type, to_type
    ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order behavioral transition matrix: for every
    consecutive event pair of the same user within a 30-minute
    session bound, count from→to transitions and the row-normalized
    transition probability — the Markov input for journey analysis,
    next-action prediction, and bot detection (a near-deterministic
    row is a script). One window over (user_id, ts) — the same
    single shuffle sessionization uses — then a 25-cell aggregate;
    the probability is one division of exact counts per cell (no
    accumulation). Deterministic tie-break on event_id."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    ).where(
        F.col("next_type").isNotNull()
        & (
            F.col("next_ts")
            <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")
        )
    )
    counts = ordered.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(wrow), 6)
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "survivorship_golden_record",
    oracle="""
    WITH src AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_type <> 'error' THEN event_type END
                 AS last_action,
             CASE WHEN value > 100 THEN value END AS big_value
      FROM events),
    base AS (
      SELECT user_id, max(ts) AS last_seen, count(*) AS n_sources
      FROM src GROUP BY user_id),
    la AS (
      SELECT user_id, last_action FROM (
        SELECT user_id, last_action,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM src WHERE last_action IS NOT NULL) WHERE rn = 1),
    bv AS (
      SELECT user_id, big_value FROM (
        SELECT user_id, big_value,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM src WHERE big_value IS NOT NULL) WHERE rn = 1)
    SELECT base.user_id,
           CAST(epoch_us(last_seen) AS BIGINT) AS last_seen_us,
           la.last_action,
           round(coalesce(bv.big_value, 0), 2) AS last_big_value,
           n_sources
    FROM base LEFT JOIN la USING (user_id)
              LEFT JOIN bv USING (user_id)
    ORDER BY base.user_id
    """,
)
def survivorship_golden_record(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MDM survivorship: the golden record merges fields from
    DIFFERENT source rows per entity — each attribute independently
    takes its most recent NON-NULL value (most-recent-wins per
    field), which `dedup_keep_best`'s pick-one-row cannot express
    (the freshest action and the freshest large transaction may live
    on different rows). Implemented as one aggregation with
    per-field max_by over null-filtered values (deterministic
    (ts, event_id) recency key); DuckDB's arg_max FILTER is the
    twin. One shuffle on the entity key, partial-aggregated —
    survivorship at 100 TB is exactly one exchange."""
    ev = Catalog(spark, sf_dir).events
    src = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") != "error", F.col("event_type")
        ).alias("last_action"),
        F.when(F.col("value") > 100, F.col("value")).alias("big_value"),
    )
    recency = F.struct(F.col("ts"), F.col("event_id"))
    golden = src.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.max_by(
            "last_action",
            F.when(F.col("last_action").isNotNull(), recency),
        ).alias("last_action"),
        F.max_by(
            "big_value",
            F.when(F.col("big_value").isNotNull(), recency),
        ).alias("big_value"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return golden.select(
        "user_id",
        F.unix_micros("last_seen").cast("long").alias("last_seen_us"),
        "last_action",
        F.round(F.coalesce(F.col("big_value"), F.lit(0.0)), 2).alias(
            "last_big_value"
        ),
        "n_sources",
    ).orderBy("user_id")


# value brackets for the range-dimension lookup (lo inclusive, hi
# exclusive; covers the full o_totalprice domain)
_BRACKETS = (
    ("B1_small", 0, 50000),
    ("B2_mid", 50000, 150000),
    ("B3_large", 150000, 300000),
    ("B4_jumbo", 300000, 10**9),
)


def _brackets_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{n}' AS bracket, {lo} AS lo, {hi} AS hi"
        for n, lo, hi in _BRACKETS
    )
    return f"""
    WITH dim AS ({rows})
    SELECT dim.bracket, count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(round(o.o_totalprice * 100)
                AS BIGINT)), 0) AS BIGINT) AS total_cents
    FROM dim LEFT JOIN orders o
      ON o.o_totalprice >= dim.lo AND o.o_totalprice < dim.hi
    GROUP BY dim.bracket ORDER BY dim.bracket
    """


@query("range_dimension_lookup", oracle=_brackets_oracle())
def range_dimension_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range-dimension lookup: classify every fact row against a
    TINY dimension of [lo, hi) brackets with a non-equi join — the
    tax-bracket / rate-card / SLA-tier pattern. There is no equi
    key, so the correct plan is a BroadcastNestedLoopJoin — usually
    an anti-pattern, but with a 4-row broadcast side it is one scan
    with 4 comparisons per row, strictly better than exploding the
    fact table onto a grid. (The inverse at scale: when the dim
    grows, switch to the grid bucketing of `interval_overlap_join`.)
    LEFT join from the dim keeps empty brackets at zero; money rides
    as exact integer cents."""
    cat = Catalog(spark, sf_dir)
    dim = spark.createDataFrame(
        list(_BRACKETS), "bracket string, lo long, hi long"
    )
    o = cat.orders.select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    joined = F.broadcast(dim).join(
        o,
        (o["o_totalprice"] >= dim["lo"])
        & (o["o_totalprice"] < dim["hi"]),
        "left",
    )
    return (
        joined.groupBy("bracket")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("bracket")
    )
