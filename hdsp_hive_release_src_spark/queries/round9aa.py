"""SURVEY.md §2 round-9 twenty-seventh wave (queued for the r10
window) — incremental maintenance and compliance depth:

- ``ivm_delta_aggregate`` — incremental view maintenance of an
  algebraic aggregate: the materialized (sum, count) state built
  from the base partition is MERGED with a delta batch's partial
  state — never recomputed from raw rows — and the result must equal
  the full recompute (which is exactly what the oracle does). The
  contract behind every streaming upsert sink and nightly MV
  refresh: avg is not mergeable, (sum, count) is.
- ``cascading_erasure_audit`` — the GDPR right-to-erasure dry run:
  for a deterministic subject set, the rows that must disappear from
  every table in the foreign-key cascade (customer → orders →
  lineitem), plus the untouched-row counts — the audit report a
  deletion job signs before running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

#: the "already materialized" base = orders before this date; the
#: delta batch = orders on/after it (≈ the last TPC-H year).
IVM_CUTOFF = "1998-01-01"

_IVM_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            // count(*) AS BIGINT) AS avg_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


@query("ivm_delta_aggregate", oracle=_IVM_ORACLE)
def ivm_delta_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a per-priority revenue
    aggregate: the pre-{IVM_CUTOFF} partition plays the MATERIALIZED
    state (sum_cents, n_orders per priority — the algebraic form; a
    materialized avg would be unmergeable), the on/after partition is
    the delta batch reduced to the same partial state, and the
    refresh is a full-outer MERGE of two bounded state tables —
    coalesce + add, never a rescan of the base rows. The oracle
    recomputes from scratch: merge ≡ recompute is exactly the IVM
    correctness contract, and the final avg divides once after the
    merge. At 100 TB the base state is a few rows per group; the
    delta scan is the only data-sized work per refresh."""
    o = Catalog(spark, sf_dir).orders
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def state(df):
        return df.groupBy(
            F.col("o_orderpriority").alias("priority")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("s"),
        )

    base = state(o.where(F.col("o_orderdate") < IVM_CUTOFF)).select(
        "priority", F.col("n").alias("n0"), F.col("s").alias("s0")
    )
    delta = state(o.where(F.col("o_orderdate") >= IVM_CUTOFF)).select(
        "priority", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    merged = base.join(delta, "priority", "full_outer").select(
        "priority",
        (
            F.coalesce(F.col("n0"), F.lit(0))
            + F.coalesce(F.col("n1"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
        (
            F.coalesce(F.col("s0"), F.lit(0))
            + F.coalesce(F.col("s1"), F.lit(0))
        )
        .cast("long")
        .alias("sum_cents"),
    )
    return merged.select(
        "priority",
        "n_orders",
        "sum_cents",
        F.expr("cast(sum_cents div n_orders as bigint)").alias(
            "avg_cents"
        ),
    ).orderBy("priority")


#: deterministic erasure-subject selection: every 17th customer key.
ERASE_MOD = 17

_ERASE_ORACLE = f"""
WITH subj AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0),
o AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM subj)
              THEN 1 ELSE 0 END AS hit
  FROM orders),
l AS (
  SELECT CASE WHEN o.hit = 1 THEN 1 ELSE 0 END AS hit
  FROM lineitem li JOIN o ON li.l_orderkey = o.o_orderkey)
SELECT 'customer' AS tbl,
       CAST((SELECT count(*) FROM subj) AS BIGINT) AS rows_to_erase,
       CAST((SELECT count(*) FROM customer)
            - (SELECT count(*) FROM subj) AS BIGINT) AS rows_kept
UNION ALL
SELECT 'orders',
       CAST((SELECT sum(hit) FROM o) AS BIGINT),
       CAST((SELECT count(*) - sum(hit) FROM o) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT sum(hit) FROM l) AS BIGINT),
       CAST((SELECT count(*) - sum(hit) FROM l) AS BIGINT)
ORDER BY tbl
"""


@query("cascading_erasure_audit", oracle=_ERASE_ORACLE)
def cascading_erasure_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Right-to-erasure dry run across the FK cascade: a
    deterministic subject set (every {ERASE_MOD}th customer) is
    traced through customer → orders → lineitem, reporting per table
    the rows the deletion job must remove and the rows it must NOT
    touch — the pre-flight audit that catches both under-deletion
    (orphaned PII in child tables) and over-deletion before any data
    moves. The subject set is broadcast onto orders; the order-key
    hit set rides the existing orders⋈lineitem key join — no extra
    shuffle beyond the joins the cascade itself defines."""
    cat = Catalog(spark, sf_dir)
    subj = cat.customer.where(
        F.col("c_custkey") % ERASE_MOD == 0
    ).select("c_custkey")
    o = cat.orders.join(
        B(subj), cat.orders.o_custkey == subj.c_custkey, "left"
    ).select(
        "o_orderkey",
        F.when(F.col("c_custkey").isNotNull(), 1)
        .otherwise(0)
        .alias("hit"),
    )
    li = cat.lineitem.join(
        o, cat.lineitem.l_orderkey == o.o_orderkey
    ).select("hit")

    def counts(df, hit_col, name):
        return df.agg(
            F.lit(name).alias("tbl"),
            F.sum(hit_col).cast("long").alias("rows_to_erase"),
            (F.count(F.lit(1)) - F.sum(hit_col))
            .cast("long")
            .alias("rows_kept"),
        )

    cust = cat.customer.select(
        F.when(F.col("c_custkey") % ERASE_MOD == 0, 1)
        .otherwise(0)
        .alias("hit")
    )
    return (
        counts(cust, F.col("hit"), "customer")
        .unionByName(counts(o, F.col("hit"), "orders"))
        .unionByName(counts(li, F.col("hit"), "lineitem"))
        .orderBy("tbl")
    )
