"""SURVEY.md §2 round-9 fourteenth wave (queued for the r10 window) —
Spark 4.x API surface: DataFrame.transpose, approx_top_k, SQL
scripting:

- ``dataframe_transpose`` — the Spark 4.0 ``DataFrame.transpose()``
  API: a keyed measure table flipped so measures become rows and key
  values become columns (the presentation shape every BI export
  wants); oracle rebuilds the transposed grid with conditional
  aggregation.
- ``approx_top_k_contract`` — the Spark 4.0 ``approx_top_k`` sketch
  aggregate, pinned by the same contract idiom as
  ``approx_count_distinct_rsd`` / ``histogram_numeric_contract``:
  with maxItemsTracked far above the column's distinct count the
  sketch is EXACT, so the oracle is a plain GROUP BY.
- ``sql_scripting_block`` — Spark 4.0 SQL scripting (BEGIN … END
  with DECLARE / SET / WHILE): a scripted block computes a scalar
  into a session variable, loops a deterministic accumulator, and
  returns a result set parameterized by both — the procedural-SQL
  surface Hive users script in HPL/SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


# --------------------------------------------------------------------
# DataFrame.transpose
# --------------------------------------------------------------------

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"

_TRANSPOSE_ORACLE = f"""
WITH m AS (
  SELECT o_orderstatus AS st,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum({_CENTS}) AS BIGINT) AS rev_cents,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
  FROM orders GROUP BY 1)
SELECT 'n_orders' AS key,
       (SELECT n_orders FROM m WHERE st = 'F') AS F,
       (SELECT n_orders FROM m WHERE st = 'O') AS O,
       (SELECT n_orders FROM m WHERE st = 'P') AS P
UNION ALL
SELECT 'rev_cents',
       (SELECT rev_cents FROM m WHERE st = 'F'),
       (SELECT rev_cents FROM m WHERE st = 'O'),
       (SELECT rev_cents FROM m WHERE st = 'P')
UNION ALL
SELECT 'n_custs',
       (SELECT n_custs FROM m WHERE st = 'F'),
       (SELECT n_custs FROM m WHERE st = 'O'),
       (SELECT n_custs FROM m WHERE st = 'P')
ORDER BY key
"""


@query("dataframe_transpose", oracle=_TRANSPOSE_ORACLE)
def dataframe_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4.0 ``DataFrame.transpose()`` API: a 3-row
    per-orderstatus measure table (orders / revenue cents / distinct
    customers, all BIGINT so the transposed grid has one common
    type) flipped so each measure becomes a row and each status
    value becomes a column — the BI-export presentation shape.
    Transpose collects the KEY COLUMN VALUES to name the output
    columns (bounded by the status domain, 3 — the kmeans-codebook
    collect class); the measure aggregation itself is one ordinary
    groupBy. Output re-sorted by key for determinism."""
    o = Catalog(spark, sf_dir).orders
    m = o.groupBy(F.col("o_orderstatus").alias("st")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
        F.countDistinct("o_custkey").cast("long").alias("n_custs"),
    )
    return m.transpose().orderBy("key")


# --------------------------------------------------------------------
# approx_top_k exactness contract
# --------------------------------------------------------------------

#: k requested and the tracked-item budget: the event_type domain is
#: 5 values, so a 10000-item sketch degenerates to exact counting —
#: the contract the oracle pins (same idiom as
#: approx_count_distinct_rsd: the SKETCH is under test, not the
#: estimate error).
TOPK_K = 5
TOPK_TRACKED = 10000

_TOPK_ORACLE = f"""
SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1
ORDER BY cnt DESC, item LIMIT {TOPK_K}
"""


@query("approx_top_k_contract", oracle=_TOPK_ORACLE)
def approx_top_k_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Spark 4.0 ``approx_top_k`` frequent-items sketch, pinned
    to its exactness contract: with maxItemsTracked ({TOPK_TRACKED})
    far above the column's distinct count (5 event types) the sketch
    tracks every item exactly, so the returned (item, count) pairs
    must equal a plain GROUP BY — any sketch regression (eviction,
    merge, count drift) turns this row red. The struct array is
    exploded and re-sorted (count desc, item) so the gate never
    depends on the sketch's internal tie order. One partial-agg pass;
    the sketch state is O(maxItemsTracked), mergeable — the
    distributed heavy-hitters shape."""
    ev = Catalog(spark, sf_dir).events
    tk = ev.agg(
        F.expr(
            f"approx_top_k(event_type, {TOPK_K}, {TOPK_TRACKED})"
        ).alias("tk")
    )
    return (
        tk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "item")
    )


# --------------------------------------------------------------------
# SQL scripting block
# --------------------------------------------------------------------

#: WHILE-loop iteration count for the deterministic accumulator
#: (3^SCRIPT_LOOPS) — proves control flow executed, not just parsed.
SCRIPT_LOOPS = 5

_SCRIPT_ORACLE = f"""
WITH tot AS (
  SELECT CAST(sum({_CENTS}) AS BIGINT) AS t FROM orders)
SELECT o_orderpriority,
       CAST(sum({_CENTS}) * 1000 // tot.t AS BIGINT)
           AS share_permille,
       CAST({3 ** SCRIPT_LOOPS} AS BIGINT) AS loop_acc
FROM orders CROSS JOIN tot
GROUP BY o_orderpriority, tot.t
ORDER BY o_orderpriority
"""


@query("sql_scripting_block", oracle=_SCRIPT_ORACLE)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 SQL scripting (the HPL/SQL-style procedural surface):
    a BEGIN … END block DECLAREs session-local variables, SETs one
    from a scalar subquery over the fact table, runs a WHILE loop
    accumulating 3^{SCRIPT_LOOPS} (control flow must actually
    execute — a parser-only pass would leave the default), and
    returns a result set parameterized by both variables. The oracle
    computes the same shares with a CTE and the loop result in
    closed form. Declarations precede statements (the scripting
    grammar requires it)."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "script_orders"
    )
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    return spark.sql(
        f"""
        BEGIN
          DECLARE tot BIGINT;
          DECLARE i INT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 1;
          SET tot = (SELECT sum({cents}) FROM script_orders);
          WHILE i < {SCRIPT_LOOPS} DO
            SET acc = acc * 3;
            SET i = i + 1;
          END WHILE;
          SELECT o_orderpriority,
                 CAST(sum({cents}) * 1000 div tot AS BIGINT)
                     AS share_permille,
                 acc AS loop_acc
          FROM script_orders
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority;
        END
        """
    )
