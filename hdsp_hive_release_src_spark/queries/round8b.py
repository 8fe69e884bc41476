"""SURVEY.md §2 round-8 second wave — four depth operators the r7
verdict's "prefer depth" guidance points at:

- ``hll_manual_registers`` — a fully deterministic HyperLogLog built
  from an affine seed hash plus a two-round xorshift-multiply
  finalizer (the r7 exact-int sketch idiom shared with CMS/Bloom/KMV,
  strengthened because a bare affine map leaves sequential keys in
  arithmetic progression): every register value, the harmonic sum,
  and the raw estimate are exact int64, so DuckDB replays the sketch
  cell-for-cell instead of trusting an engine-specific
  approx_count_distinct.
- ``ks_two_sample`` — exact two-sample Kolmogorov–Smirnov statistic in
  pure integer arithmetic (max |n2·F1 − n1·F2| over the merged ECDF),
  complementing ``mann_whitney_u`` in the distribution-shift toolkit a
  training-data pipeline runs between corpus snapshots.
- ``topo_sort_layers`` — longest-path layering of a DAG by fixed-round
  BSP relaxation (the second iterative graph operator at full oracle
  parity: the DuckDB side replays the fixpoint via a recursive CTE).
- ``autocorr_daily_events`` — lag-1..7 autocorrelation of the daily
  event-count series with all cross-aggregation sums exact int64;
  the only float ops are a final scalar quotient/sqrt applied to
  identical integers on both engines.

All arithmetic that crosses an aggregation boundary is exact-integer
(the standing float-order rule); every DuckDB ``sum()`` output column
is CAST AS BIGINT (the r7 HUGEINT lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

# --------------------------------------------------------------------
# deterministic HyperLogLog
# --------------------------------------------------------------------

#: affine seed h0(x) = (A·x + C) mod 2^31 followed by TWO xorshift-
#: multiply finalizer rounds (h ^= h>>16; h = h·MIX mod 2^31, twice,
#: then a final h ^= h>>16): a bare affine map preserves arithmetic
#: progressions, so sequential custkeys gave a 90% cardinality error
#: at sf0.01 — the finalizer breaks the progression while every
#: intermediate stays exact int64 (h < 2^31, MIX < 2^27, product
#: < 2^58), so both engines still compute bit-identical registers.
#: Measured raw-estimate error with this hash: 10.7% (sf0.001),
#: 11.0% (sf0.01), 1.8% (sf0.1) — inside the m=64 ~13% envelope.
_HLL_A = 1103515245
_HLL_C = 12345
_HLL_MOD = 2147483648  # 2^31
_HLL_MIX = 73244475    # multiply constant of the 32-bit finalizer
_HLL_M = 64            # registers (2^6); bucket = h mod m
_HLL_W_BITS = 26       # h div 64 < 2^25, so rho ∈ [1, 26]
#: alpha_64 ≈ 0.709 as the exact rational 709/1000 (kept rational so
#: the estimate is an integer floor-division both engines agree on)
_HLL_ALPHA_NUM = 709
_HLL_ALPHA_DEN = 1000

_HLL_ORACLE = f"""
WITH h0 AS (
  SELECT (({_HLL_A} * o_custkey + {_HLL_C}) % {_HLL_MOD}) AS h
  FROM orders),
h1 AS (SELECT xor(h, h >> 16) AS h FROM h0),
h2 AS (SELECT (h * {_HLL_MIX}) % {_HLL_MOD} AS h FROM h1),
h3 AS (SELECT xor(h, h >> 16) AS h FROM h2),
h4 AS (SELECT (h * {_HLL_MIX}) % {_HLL_MOD} AS h FROM h3),
h AS (SELECT xor(h, h >> 16) AS hv FROM h4),
r AS (
  SELECT hv % {_HLL_M} AS j,
         CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_W_BITS}
              ELSE {_HLL_W_BITS}
                   - length(bin(CAST(hv // {_HLL_M} AS INTEGER)))
         END AS rho
  FROM h),
regs0 AS (SELECT j, max(rho) AS reg FROM r GROUP BY j),
grid AS (SELECT CAST(range AS BIGINT) AS j FROM range({_HLL_M})),
regs AS (
  SELECT grid.j, coalesce(reg, 0) AS reg
  FROM grid LEFT JOIN regs0 ON grid.j = regs0.j),
s AS (
  SELECT CAST(sum(CAST(1 AS BIGINT) << ({_HLL_W_BITS} - reg))
              AS BIGINT) AS ihs,
         CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_empty
  FROM regs),
t AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS td
      FROM orders)
SELECT CAST({_HLL_M} AS BIGINT) AS m_registers,
       ihs AS int_harmonic,
       n_empty AS n_empty_registers,
       CAST((CAST({_HLL_ALPHA_NUM} AS BIGINT) * {_HLL_M} * {_HLL_M}
             * (CAST(1 AS BIGINT) << {_HLL_W_BITS}))
            // ({_HLL_ALPHA_DEN} * ihs) AS BIGINT) AS hll_estimate,
       td AS true_distinct,
       CAST(abs((CAST({_HLL_ALPHA_NUM} AS BIGINT) * {_HLL_M} * {_HLL_M}
                 * (CAST(1 AS BIGINT) << {_HLL_W_BITS}))
                // ({_HLL_ALPHA_DEN} * ihs) - td) * 1000 // td
            AS BIGINT) AS err_permille
FROM s, t
"""


@query("hll_manual_registers", oracle=_HLL_ORACLE)
def hll_manual_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog over ``orders.o_custkey``: bucket
    j = h mod 64, rank rho = leading-zeros-plus-one of the remaining
    26-bit word, register = max(rho) per bucket. Because max() is
    idempotent the sketch needs NO pre-distinct — the whole pass is
    one 64-group max aggregation (map-side combined, the shuffle
    carries ≤ 64 rows per partition regardless of corpus size, which
    is exactly why HLL is THE 100 TB cardinality operator). The
    harmonic mean is folded over the common denominator 2^26 so the
    register sum, raw estimate (alpha as the rational 709/1000), and
    permille error vs the exact count are all int64 — DuckDB replays
    every register cell-for-cell. Low-range (linear-counting) bias
    correction is intentionally NOT folded in: n_empty_registers is
    emitted so the caller can apply m·ln(m/V) driver-side — ln() is
    the one op whose last-ulp behavior differs across libm
    implementations, so it stays out of the hashed contract.
    Measured raw-estimate error with the xorshift-multiply finalizer:
    10.7% at sf0.001, 11.0% at sf0.01, 1.8% at sf0.1 — inside the
    m=64 HLL ~13% (1σ) envelope at every test scale."""
    o = Catalog(spark, sf_dir).orders
    hashed = o.select(
        F.expr(
            f"({_HLL_A} * o_custkey + {_HLL_C}) % {_HLL_MOD}"
        ).alias("h")
    )
    for _ in range(2):
        hashed = hashed.select(
            F.expr("h ^ shiftright(h, 16)").alias("h")
        ).select(
            F.expr(f"(h * {_HLL_MIX}) % {_HLL_MOD}").alias("h")
        )
    hashed = hashed.select(
        F.expr("h ^ shiftright(h, 16)").alias("hv")
    )
    ranked = hashed.select(
        (F.col("hv") % _HLL_M).alias("j"),
        F.when(F.expr(f"hv div {_HLL_M}") == 0, F.lit(_HLL_W_BITS))
        .otherwise(
            F.lit(_HLL_W_BITS)
            - F.length(F.bin(F.expr(f"hv div {_HLL_M}")))
        )
        .alias("rho"),
    )
    regs0 = ranked.groupBy("j").agg(F.max("rho").alias("reg"))
    grid = spark.range(_HLL_M).select(F.col("id").alias("j"))
    regs = grid.join(regs0, "j", "left").select(
        "j", F.coalesce(F.col("reg"), F.lit(0)).alias("reg")
    )
    s = regs.agg(
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST({_HLL_W_BITS} - reg AS INT))"
            )
        )
        .cast("long")
        .alias("ihs"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
    )
    t = o.agg(
        F.countDistinct("o_custkey").cast("long").alias("td")
    )
    est = F.expr(
        f"(CAST({_HLL_ALPHA_NUM} AS BIGINT) * {_HLL_M} * {_HLL_M}"
        f" * shiftleft(CAST(1 AS BIGINT), {_HLL_W_BITS}))"
        f" div ({_HLL_ALPHA_DEN} * ihs)"
    )
    return (
        s.crossJoin(B(t))
        .select(
            F.lit(_HLL_M).cast("long").alias("m_registers"),
            F.col("ihs").alias("int_harmonic"),
            F.col("n_empty").alias("n_empty_registers"),
            est.cast("long").alias("hll_estimate"),
            F.col("td").alias("true_distinct"),
        )
        .withColumn(
            "err_permille",
            F.expr(
                "abs(hll_estimate - true_distinct) * 1000"
                " div true_distinct"
            ).cast("long"),
        )
    )


# --------------------------------------------------------------------
# exact two-sample Kolmogorov–Smirnov
# --------------------------------------------------------------------

_KS_ORACLE = """
WITH pts AS (
  SELECT o_totalprice AS v,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM orders GROUP BY o_totalprice),
cum AS (
  SELECT v,
         CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
         CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS f2
  FROM pts),
tot AS (
  SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM orders),
d AS (SELECT v, abs(tot.n2 * cum.f1 - tot.n1 * cum.f2) AS dn
      FROM cum, tot),
mx AS (SELECT CAST(max(dn) AS BIGINT) AS d_num FROM d)
SELECT tot.n1 AS n_a, tot.n2 AS n_b, mx.d_num AS d_num,
       CAST(mx.d_num * 1000 // (tot.n1 * tot.n2) AS BIGINT)
           AS ks_permille,
       CAST((SELECT min(v) FROM d WHERE dn = mx.d_num) AS DOUBLE)
           AS ks_at_value
FROM tot, mx
"""


@query("ks_two_sample", oracle=_KS_ORACLE)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between finished
    ('F') and all other order totalprice distributions, entirely in
    integer arithmetic: D = max |n2·F1(v) − n1·F2(v)| / (n1·n2), where
    the numerator is folded over cumulative integer counts at each
    distinct value — no float ECDF, no rounding boundary, reported as
    exact permille plus the (min) value where the max gap occurs. One
    value-keyed aggregation then a cumulative window over DISTINCT
    values: the window's ordered pass runs over the price grid (cents
    granularity — a bounded domain that does not grow with row count),
    not over rows, which is what keeps the global-order stage viable
    at 100 TB; at cluster scale the same cumsum is a two-pass
    range-partitioned prefix sum. The int64 numerator bounds n1·n2 to
    ~3e9 rows per side — beyond that, scale the permille fold to
    int128/double (documented, not silently truncated)."""
    o = Catalog(spark, sf_dir).orders
    is_a = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    # r12 scan-count fix: the gap table, its max probe, the argmax
    # probe and the group totals each re-executed the value-keyed
    # aggregation from parquet (7 fact scans measured). The price-grid
    # table is checkpointed once (bounded domain — cents granularity);
    # the totals are its column sums, and every probe reads the grid.
    pts = (
        o.select(
            F.col("o_totalprice").alias("v"),
            is_a.alias("a"),
            (1 - is_a).alias("b"),
        )
        .groupBy("v")
        .agg(
            F.sum("a").cast("long").alias("c1"),
            F.sum("b").cast("long").alias("c2"),
        )
        .localCheckpoint()
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pts.select(
        "v",
        F.sum("c1").over(w).cast("long").alias("f1"),
        F.sum("c2").over(w).cast("long").alias("f2"),
    )
    tot = pts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    # r13 subtree-sweep fix: `d` feeds the max probe AND the argmax
    # probe, and `tot` is broadcast into d and re-read by the final
    # select — the cumulative window over the price grid executed
    # twice and the totals aggregate four times. Both are grid-sized
    # (bounded cents domain), so one checkpoint each makes every
    # downstream probe a single pass over materialized data.
    tot = tot.localCheckpoint()
    d = (
        cum.crossJoin(B(tot))
        .select(
            "v",
            "n1",
            "n2",
            F.abs(
                F.col("n2") * F.col("f1") - F.col("n1") * F.col("f2")
            ).alias("dn"),
        )
        .localCheckpoint()
    )
    # mx feeds both the argmax join and the final row — 1-row
    # checkpoint so the grid aggregate runs once
    mx = d.agg(
        F.max("dn").cast("long").alias("d_num")
    ).localCheckpoint()
    at = (
        d.join(B(mx), d.dn == mx.d_num)
        .agg(F.min("v").alias("ks_at_value"))
    )
    return (
        tot.crossJoin(B(mx))
        .crossJoin(B(at))
        .select(
            F.col("n1").alias("n_a"),
            F.col("n2").alias("n_b"),
            F.col("d_num"),
            F.expr("d_num * 1000 div (n1 * n2)")
            .cast("long")
            .alias("ks_permille"),
            F.col("ks_at_value").cast("double"),
        )
    )


# --------------------------------------------------------------------
# DAG longest-path layering (topological layers)
# --------------------------------------------------------------------

#: node bound fixes the DAG depth: every edge at least doubles the
#: key, so any path from a key ≥ 1 has ≤ floor(log2(500)) = 8 edges —
#: 8 propagation rounds reach every longest path at any scale factor.
_TOPO_MAX_KEY = 500
_TOPO_ROUNDS = 8

_TOPO_ORACLE = f"""
WITH RECURSIVE nodes AS (
  SELECT p_partkey AS n FROM part
  WHERE p_partkey BETWEEN 1 AND {_TOPO_MAX_KEY}),
edges AS (
  SELECT a.n AS src, b.n AS dst
  FROM nodes a JOIN nodes b ON b.n = a.n * 2 OR b.n = a.n * 3),
paths AS (
  SELECT n, 0 AS layer FROM nodes
  UNION
  SELECT e.dst, p.layer + 1
  FROM paths p JOIN edges e ON e.src = p.n)
SELECT n AS node, CAST(max(layer) AS BIGINT) AS layer
FROM paths GROUP BY n ORDER BY node
"""


@query("topo_sort_layers", oracle=_TOPO_ORACLE)
def topo_sort_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological layering (longest path from any source) of the
    doubling/tripling DAG over part keys — the dependency-scheduling
    primitive (build graphs, lineage DAGs, staged backfills). Computed
    by frontier propagation, the exact dataflow of the oracle's
    recursive CTE: frontier₀ = all nodes at layer 0, frontierᵢ₊₁ =
    frontierᵢ ⋈ edges (layer+1), and ONE final per-node max over the
    union of all frontiers — each round is a single equi-join, the
    frontier shrinks monotonically (sinks leave), and no intermediate
    re-aggregation inflates the lineage (the naive
    relax-all-nodes-per-round variant was 10 aggs deep and 8× slower
    at gate scale). The node-key bound fixes DAG depth ≤ 8, so 8
    rounds reach every longest path at any scale factor; no
    driver-side state beyond the loop counter (at cluster scale each
    frontier would be persisted to cut lineage). The DuckDB oracle
    replays the same fixpoint as a recursive CTE with UNION-dedup, so
    every layer value is verified, not just the shape."""
    cat = Catalog(spark, sf_dir)
    # nodes feeds the two candidate-edge selects, the edge join's
    # build side and frontier-0 — checkpoint the (bounded, <= 500
    # rows) node set so part is scanned once, not four times
    nodes = (
        cat.part.where(
            (F.col("p_partkey") >= 1)
            & (F.col("p_partkey") <= _TOPO_MAX_KEY)
        )
        .select(F.col("p_partkey").alias("n"))
        .localCheckpoint()
    )
    cand = nodes.select(
        F.col("n").alias("src"), (F.col("n") * 2).alias("dst")
    ).unionByName(
        nodes.select(
            F.col("n").alias("src"), (F.col("n") * 3).alias("dst")
        )
    )
    # r13 subtree-sweep fix: `frontier` is consumed twice per round
    # (the next propagation join and the `reached` union), so the lazy
    # loop re-inlined every earlier round — the round-1 join appeared
    # 8x in the final plan and `part` was re-scanned ~28x (invisible
    # to the fact-table scan audit, which doesn't count part). The
    # edge list is checkpointed once and each (shrinking, node-sized)
    # frontier once per round: every join now executes exactly once.
    edges = (
        cand.join(nodes.withColumnRenamed("n", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint()
    )
    frontier = nodes.select(
        "n", F.lit(0).alias("layer")
    ).localCheckpoint()
    reached = frontier
    for _ in range(_TOPO_ROUNDS):
        frontier = (
            edges.join(frontier, edges.src == frontier.n)
            .select(
                F.col("dst").alias("n"),
                (F.col("layer") + 1).alias("layer"),
            )
            .localCheckpoint()
        )
        reached = reached.unionByName(frontier)
    layers = reached.groupBy("n").agg(F.max("layer").alias("layer"))
    return layers.select(
        F.col("n").alias("node"), F.col("layer").cast("long")
    ).orderBy("node")


# --------------------------------------------------------------------
# lag-k autocorrelation of the daily event-count series
# --------------------------------------------------------------------

_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
lags AS (SELECT CAST(range AS BIGINT) + 1 AS k
         FROM range({_ACF_MAX_LAG})),
pairs AS (
  SELECT l.k, a.c AS x, b.c AS y
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY k)
SELECT k AS lag, n AS n_pairs,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x_num,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y_num,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
             6) AS acf
FROM agg ORDER BY lag
"""


@query("autocorr_daily_events", oracle=_ACF_ORACLE)
def autocorr_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series — the
    seasonality probe run before choosing a training-data time split.
    All cross-aggregation accumulators (n, Σx, Σy, Σxy, Σx², Σy² per
    lag) are exact int64 (counts are integers), so the aggregation is
    order-independent under any partitioning; the Pearson quotient and
    its two sqrt() calls are the only float ops and are applied to
    bit-identical integers on both engines in the same expression
    shape (sqrt(a)·sqrt(b), NOT sqrt(a·b) — the product can overflow
    int64 first). The daily series is one date-keyed count; the
    lag join is date-equi against a 7-row literal lag grid (broadcast
    both at scale: the series has one row per day, ~36.5k rows per
    century — the join is dimension-sized no matter how large the
    event table is). Calendar-gap days drop pairs on both engines
    identically (inner date-equi join). int64 bounds the exact sums
    to ~1e9 events/day over a century — beyond that, promote the
    accumulators to double (documented)."""
    e = Catalog(spark, sf_dir).events
    # r13 subtree-sweep fix: both sides of the lag self-join re-ran
    # the daily count from parquet. The series is date-sized (one row
    # per day) — checkpoint it once; both join sides read it.
    daily = (
        e.select(F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("k")
    )
    a = daily.select(
        F.col("d").alias("da"), F.col("c").alias("x")
    )
    bseries = daily.select(
        F.col("d").alias("db"), F.col("c").alias("y")
    )
    pairs = (
        a.crossJoin(B(lags))
        .join(
            bseries,
            F.col("db")
            == F.date_add(F.col("da"), F.col("k").cast("int")),
        )
        .select("k", "x", "y")
    )
    agg = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return (
        agg.select(
            F.col("k").alias("lag"),
            F.col("n").alias("n_pairs"),
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("long")
            .alias("cov_num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("long")
            .alias("var_x_num"),
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            .cast("long")
            .alias("var_y_num"),
        )
        .withColumn(
            "acf",
            F.round(
                F.col("cov_num").cast("double")
                / (
                    F.sqrt(F.col("var_x_num").cast("double"))
                    * F.sqrt(F.col("var_y_num").cast("double"))
                ),
                6,
            ),
        )
        .orderBy("lag")
    )
