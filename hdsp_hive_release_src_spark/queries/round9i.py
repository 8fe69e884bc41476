"""SURVEY.md §2 round-9 ninth wave (queued for the r10 window) —
ranking-statistics / sequence / inventory depth:

- ``roc_auc_exact`` — exact ROC-AUC via the rank identity
  (AUC = U/(n_pos·n_neg)), folded over the distinct-score grid with
  the distributed ``range_prefix_sum`` operator — NO global window
  anywhere in the Spark plan (this query driver-gates the operator
  the M-W/KS docstrings name as their cluster-scale form).
- ``kendall_tau_b_grid`` — exact Kendall tau-b concordance over a
  bounded contingency grid (priority ordinal × order month):
  C/D/tie pair counts are integer-exact from a 60-cell grid
  self-join, never an n² row pair join.
- ``clamped_running_inventory`` — running balance with a floor at
  zero via the prefix identity  S_t = cum_t − min(0, min_{k≤t}
  cum_k)  — turns the sequential clamp recursion into two plain
  partitioned windows (no per-row iteration, no applyInPandas).
- ``funnel_pattern_match`` — MATCH_RECOGNIZE-style sequential
  pattern counts over per-user encoded event strings: strict
  contiguous funnels by replace-arithmetic, skip-allowed funnels by
  non-overlapping regex, aggregated to a bounded distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.ranking import (
    range_prefix_sum,
)
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# exact ROC-AUC
# --------------------------------------------------------------------

_AUC_ORACLE = f"""
WITH s AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         {_CENTS} AS c
  FROM orders),
g AS (
  SELECT c, CAST(sum(pos) AS BIGINT) AS np,
         CAST(count(*) AS BIGINT) AS cnt
  FROM s GROUP BY c),
cum AS (
  SELECT c, np, cnt,
         CAST(sum(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f
  FROM g),
agg AS (
  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         CAST(sum(cnt - np) AS BIGINT) AS n_neg,
         CAST(sum(np * (2 * f - cnt + 1)) AS BIGINT) AS s2p
  FROM cum)
SELECT n_pos, n_neg,
       CAST((s2p - n_pos * (n_pos + 1)) * 500
            // (n_pos * n_neg) AS BIGINT) AS auc_permille
FROM agg
"""


@query("roc_auc_exact", oracle=_AUC_ORACLE)
def roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of totalprice as a classifier for finished
    orders, via the rank identity AUC = U/(n_pos·n_neg) with
    tie-averaged ranks — the eval-pipeline scalar that tells you
    whether a quality score separates two classes. Everything stays
    integer: doubled tie-averaged rank per distinct score value is
    2·cum_cnt − cnt + 1 (integral by construction), and the permille
    fold is one integer division at the end. The cumulative count
    runs through operators/ranking.range_prefix_sum — the two-pass
    range-partitioned prefix sum, so the Spark plan has NO global
    window (this is the driver-gated composition of the operator the
    mann_whitney_u / ks_two_sample docstrings name as their
    cluster-scale swap; tests/test_prefix_sum_lockstep.py proves the
    swap bit-exact against the windowed form). Int64 bound: the
    Σ np·rank2 fold caps at 2N², safe to ~2e9 rows — beyond that
    scale the fold to decimal (documented, not silently truncated)."""
    o = Catalog(spark, sf_dir).orders
    s = o.select(
        F.when(F.col("o_orderstatus") == "F", 1)
        .otherwise(0)
        .alias("pos"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    g = s.groupBy("c").agg(
        F.sum("pos").cast("long").alias("np"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    cum = range_prefix_sum(g, "c", [], ["cnt"])
    rank2 = 2 * F.col("cum_cnt") - F.col("cnt") + 1
    agg = cum.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).cast("long").alias("n_neg"),
        F.sum(F.col("np") * rank2).cast("long").alias("s2p"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "(s2p - n_pos * (n_pos + 1)) * 500 div (n_pos * n_neg)"
        )
        .cast("long")
        .alias("auc_permille"),
    )


# --------------------------------------------------------------------
# Kendall tau-b on a bounded contingency grid
# --------------------------------------------------------------------

_TAU_ORACLE = """
WITH s AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS x,
         month(CAST(o_orderdate AS DATE)) AS y
  FROM orders),
g AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM s
      GROUP BY x, y),
pairs AS (
  SELECT
    CAST(sum(CASE WHEN b.x > a.x AND b.y > a.y
             THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_pairs,
    CAST(sum(CASE WHEN b.x > a.x AND b.y < a.y
             THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_pairs
  FROM g a CROSS JOIN g b),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(n * (n - 1)) // 2 AS BIGINT) AS tie_xy
  FROM g),
mx AS (
  SELECT CAST(sum(m * (m - 1)) // 2 AS BIGINT) AS tie_x
  FROM (SELECT CAST(sum(n) AS BIGINT) AS m FROM g GROUP BY x)),
my AS (
  SELECT CAST(sum(m * (m - 1)) // 2 AS BIGINT) AS tie_y
  FROM (SELECT CAST(sum(n) AS BIGINT) AS m FROM g GROUP BY y))
SELECT c_pairs, d_pairs, tie_x, tie_y,
       CAST(nn * (nn - 1) // 2 AS BIGINT) AS n0,
       round((c_pairs - d_pairs)
             / sqrt((nn * (nn - 1) / 2.0 - tie_x)
                    * (nn * (nn - 1) / 2.0 - tie_y)), 6) AS tau_b
FROM pairs, tot, mx, my
"""


@query("kendall_tau_b_grid", oracle=_TAU_ORACLE)
def kendall_tau_b_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall tau-b between order-priority ordinal and order
    month, computed entirely on the (x, y) CONTINGENCY grid: with 5×12
    = 60 cells, concordant/discordant pair counts fold as
    Σ n_a·n_b over strictly-ordered cell pairs — a 60×60 broadcast
    grid join, never an n² row pair join, so the shape is
    corpus-size-independent (the grid is bounded by the domain, not
    the data). All pair counts are exact int64 (n² caps at ~3e9 rows,
    the same documented bound as ks_two_sample); only the final tau_b
    normalization touches floats (sqrt of exact integers, rounded 6).
    The tie terms use the marginal counts — tau-b's correction for
    both variables being discrete."""
    o = Catalog(spark, sf_dir).orders
    s = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("x"),
        F.month("o_orderdate").alias("y"),
    )
    # r12 scan-count fix: both grid sides, the total and the two tie
    # terms each re-ran the contingency aggregation from parquet (5
    # scans measured); the 60-cell grid is checkpointed once
    g = (
        s.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    a = g.alias("a")
    b = g.alias("b")
    pairs = (
        a.crossJoin(B(b))
        .agg(
            F.sum(
                F.when(
                    (F.col("b.x") > F.col("a.x"))
                    & (F.col("b.y") > F.col("a.y")),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("c_pairs"),
            F.sum(
                F.when(
                    (F.col("b.x") > F.col("a.x"))
                    & (F.col("b.y") < F.col("a.y")),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("d_pairs"),
        )
    )
    tot = g.agg(F.sum("n").cast("long").alias("nn"))
    tie_x = (
        g.groupBy("x")
        .agg(F.sum("n").alias("m"))
        .agg(
            F.sum(F.expr("m * (m - 1) div 2"))
            .cast("long")
            .alias("tie_x")
        )
    )
    tie_y = (
        g.groupBy("y")
        .agg(F.sum("n").alias("m"))
        .agg(
            F.sum(F.expr("m * (m - 1) div 2"))
            .cast("long")
            .alias("tie_y")
        )
    )
    return (
        pairs.crossJoin(B(tot))
        .crossJoin(B(tie_x))
        .crossJoin(B(tie_y))
        .select(
            "c_pairs",
            "d_pairs",
            "tie_x",
            "tie_y",
            F.expr("nn * (nn - 1) div 2").cast("long").alias("n0"),
            F.round(
                (F.col("c_pairs") - F.col("d_pairs"))
                / F.sqrt(
                    (
                        F.col("nn") * (F.col("nn") - 1) / 2.0
                        - F.col("tie_x")
                    )
                    * (
                        F.col("nn") * (F.col("nn") - 1) / 2.0
                        - F.col("tie_y")
                    )
                ),
                6,
            ).alias("tau_b"),
        )
    )


# --------------------------------------------------------------------
# clamped running inventory (cumsum with a floor at zero)
# --------------------------------------------------------------------

_INV_ORACLE = """
WITH mv AS (
  SELECT l_partkey AS part,
         CASE WHEN l_returnflag = 'R'
              THEN CAST(l_quantity AS BIGINT)
              ELSE -CAST(l_quantity AS BIGINT) END AS delta,
         l_shipdate, l_orderkey, l_linenumber
  FROM lineitem WHERE l_partkey <= 100),
c AS (
  SELECT part, l_shipdate, l_orderkey, l_linenumber,
         CAST(sum(delta) OVER (
              PARTITION BY part
              ORDER BY l_shipdate, l_orderkey, l_linenumber
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM mv),
r AS (
  SELECT part, cum,
         CAST(min(cum) OVER (
              PARTITION BY part
              ORDER BY l_shipdate, l_orderkey, l_linenumber
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runmin
  FROM c),
bal AS (SELECT part, cum - least(runmin, 0) AS s FROM r)
SELECT part,
       CAST(count(*) AS BIGINT) AS movements,
       CAST(max(s) AS BIGINT) AS peak_balance,
       CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS stockout_points
FROM bal GROUP BY part ORDER BY part
"""


@query("clamped_running_inventory", oracle=_INV_ORACLE)
def clamped_running_inventory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Running stock balance that can never go below zero (receipts =
    returned lines, issues = everything else). The naive form is a
    sequential recursion S_t = max(0, S_{t-1} + δ_t) — per-row
    iteration that doesn't distribute. The prefix identity
    S_t = cum_t − min(0, min_{k≤t} cum_k) turns it into two stacked
    windows (cumulative sum, then running min of its clamped value),
    BOTH partitioned by part — each part's history sorts
    independently, so the plan is shuffle-bounded by the partition
    key and survives any corpus size without a single-partition
    window or applyInPandas. Output is the per-part movement count,
    peak balance, and number of floor hits (stockout points), exact
    int64 end-to-end."""
    li = Catalog(spark, sf_dir).lineitem.where(F.col("l_partkey") <= 100)
    mv = li.select(
        F.col("l_partkey").alias("part"),
        F.when(
            F.col("l_returnflag") == "R",
            F.col("l_quantity").cast("long"),
        )
        .otherwise(-F.col("l_quantity").cast("long"))
        .alias("delta"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("part")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = mv.select(
        "part",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.sum("delta").over(w).cast("long").alias("cum"),
    )
    r = c.select(
        "part",
        "cum",
        F.min("cum").over(w).cast("long").alias("runmin"),
    )
    bal = r.select(
        "part",
        (F.col("cum") - F.least(F.col("runmin"), F.lit(0))).alias("s"),
    )
    return (
        bal.groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("movements"),
            F.max("s").cast("long").alias("peak_balance"),
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
            .cast("long")
            .alias("stockout_points"),
        )
        .orderBy("part")
    )


# --------------------------------------------------------------------
# MATCH_RECOGNIZE-style funnel pattern counts
# --------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH enc AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id),
cnt AS (
  SELECT user_id,
         CAST((length(s) - length(replace(s, 'vcp', ''))) // 3
              AS BIGINT) AS strict_funnels,
         CAST(length(regexp_extract_all(s, 'v[^p]*c[^p]*p'))
              AS BIGINT) AS skip_funnels
  FROM enc)
SELECT strict_funnels, skip_funnels,
       CAST(count(*) AS BIGINT) AS users
FROM cnt GROUP BY strict_funnels, skip_funnels
ORDER BY strict_funnels, skip_funnels
"""


@query("funnel_pattern_match", oracle=_FUNNEL_ORACLE)
def funnel_pattern_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern detection (the
    view→click→purchase funnel) without a row-pattern engine: each
    user's event history collapses to an ordered initial-letter
    string (one char per event; collect bounded by per-user event
    count — the sessionization contract), then
    (a) STRICT contiguous funnels count by replace-arithmetic
        ((len − len(replace(s,'vcp',''))) / 3 — pure string math,
        zero regex-engine variance), and
    (b) skip-allowed funnels count as non-overlapping matches of
        v[^p]*c[^p]*p — the [^p] guards pin every match to end at
        the FIRST purchase after its view→click, so Java and RE2
        agree on match spans.
    Aggregated to the (strict, skip) distribution — bounded output,
    and the per-user map side never shuffles strings twice."""
    ev = Catalog(spark, sf_dir).events
    enc = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda x: x["c"]
                ),
                "",
            ).alias("s")
        )
    )
    cnt = enc.select(
        "user_id",
        (
            (F.length("s") - F.length(F.regexp_replace("s", "vcp", "")))
            / 3
        )
        .cast("long")
        .alias("strict_funnels"),
        F.size(
            F.expr("regexp_extract_all(s, 'v[^p]*c[^p]*p', 0)")
        )
        .cast("long")
        .alias("skip_funnels"),
    )
    return (
        cnt.groupBy("strict_funnels", "skip_funnels")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("strict_funnels", "skip_funnels")
    )


# --------------------------------------------------------------------
# bipartite co-supply projection
# --------------------------------------------------------------------

#: per-part supplier-degree cap for the pair projection — the same
#: posting-cap discipline as dedup_ngram_jaccard: a part supplied by
#: d suppliers contributes d(d-1)/2 pairs, so one mega-degree hub
#: part would quadratically dominate the join. TPC-H's ratio is 4
#: suppliers/part; 64 carries 16x headroom and is observable (a part
#: over the cap is EXCLUDED, not truncated, in both engines).
COSUPPLY_MAX_DEGREE = 64

_COSUPPLY_ORACLE = f"""
WITH e AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS sup
           FROM lineitem),
deg AS (SELECT part FROM e GROUP BY part
        HAVING count(*) <= {COSUPPLY_MAX_DEGREE}),
keep AS (SELECT e.part, e.sup FROM e JOIN deg USING (part)),
pairs AS (
  SELECT a.sup AS s1, b.sup AS s2, count(*) AS shared_parts
  FROM keep a JOIN keep b
    ON a.part = b.part AND a.sup < b.sup
  GROUP BY a.sup, b.sup)
SELECT s1, s2, CAST(shared_parts AS BIGINT) AS shared_parts
FROM pairs WHERE shared_parts >= 3
ORDER BY shared_parts DESC, s1, s2
"""


@query("cosupply_bipartite_projection", oracle=_COSUPPLY_ORACLE)
def cosupply_bipartite_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-mode projection of the supplier–part bipartite graph:
    supplier pairs weighted by the number of parts both supply (the
    collaboration/substitute network every procurement analysis
    starts from). Pair generation is keyed on the part — each part of
    degree d contributes d(d−1)/2 pairs — and degree-capped at
    {COSUPPLY_MAX_DEGREE} exactly like the dedup family's posting
    caps, so a hub part cannot blow the join up quadratically;
    excluded parts are dropped whole (observable), never silently
    truncated. The projection then aggregates pair weight and keeps
    pairs sharing ≥3 parts. Self-join is on the co-partitioned part
    key — at cluster scale both sides shuffle once on part and the
    pair space never materializes beyond capped-degree blocks."""
    li = Catalog(spark, sf_dir).lineitem
    # r12 scan-count fix: the degree filter and both self-join sides
    # re-ran the distinct from parquet (4 scans measured); checkpoint
    # the bipartite edge list once
    e = (
        li.select(
            F.col("l_partkey").alias("part"),
            F.col("l_suppkey").alias("sup"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.groupBy("part")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= COSUPPLY_MAX_DEGREE)
        .select("part")
    )
    # r13 subtree-sweep fix: both self-join sides re-ran the degree
    # filter join off the edge checkpoint; the capped edge list is
    # edge-sized — checkpoint it so the filter executes once.
    keep = e.join(deg, "part").localCheckpoint()
    a = keep.alias("a")
    b = keep.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.sup") < F.col("b.sup")),
        )
        .groupBy(
            F.col("a.sup").alias("s1"), F.col("b.sup").alias("s2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_parts"))
    )
    return (
        pairs.where(F.col("shared_parts") >= 3)
        .orderBy(F.desc("shared_parts"), "s1", "s2")
    )


# --------------------------------------------------------------------
# NATURAL JOIN semantics
# --------------------------------------------------------------------

_NATURAL_ORACLE = """
WITH sup AS (
  SELECT s_nationkey AS nationkey,
         CAST(count(*) AS BIGINT) AS suppliers
  FROM supplier GROUP BY s_nationkey),
cust AS (
  SELECT c_nationkey AS nationkey,
         CAST(count(*) AS BIGINT) AS customers
  FROM customer GROUP BY c_nationkey)
SELECT nationkey, suppliers, customers
FROM sup NATURAL JOIN cust
ORDER BY nationkey
"""


@query("natural_join_semantics", oracle=_NATURAL_ORACLE)
def natural_join_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NATURAL JOIN surface parity: the join condition is inferred
    from the shared column name (nationkey) and the shared column is
    emitted ONCE — the classic warehouse SQL shorthand Hive/Spark
    both support. Runs as genuine SQL (not an explicit-condition
    DataFrame join) over two temp-view aggregates so the parser path
    is the thing under test; the physical plan is the same broadcast
    hash join an explicit USING join produces (both sides are
    nation-cardinality aggregates — bounded)."""
    cat = Catalog(spark, sf_dir)
    cat.supplier.groupBy(
        F.col("s_nationkey").alias("nationkey")
    ).agg(F.count(F.lit(1)).cast("long").alias("suppliers")
    ).createOrReplaceTempView("nj_sup")
    cat.customer.groupBy(
        F.col("c_nationkey").alias("nationkey")
    ).agg(F.count(F.lit(1)).cast("long").alias("customers")
    ).createOrReplaceTempView("nj_cust")
    return spark.sql(
        """
        SELECT nationkey, suppliers, customers
        FROM nj_sup NATURAL JOIN nj_cust
        ORDER BY nationkey
        """
    )


# --------------------------------------------------------------------
# readability proxy bands
# --------------------------------------------------------------------

_READ_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(length(list_filter(string_split(text, ' '),
                                 x -> x <> '')) AS BIGINT) AS words,
         CAST(length(regexp_extract_all(lower(text), '[aeiou]+'))
              AS BIGINT) AS syll
  FROM documents),
f AS (
  SELECT doc_id, words, syll,
         greatest(1, words // 15) AS sents
  FROM m WHERE words > 0),
sc AS (
  SELECT doc_id,
         206835
         - (1015 * (words * 1000 // sents)) // 1000
         - (84600 * (syll * 1000 // words)) // 1000 AS flesch_milli
  FROM f)
SELECT CAST(flesch_milli // 10000 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(min(flesch_milli) AS BIGINT) AS min_milli,
       CAST(max(flesch_milli) AS BIGINT) AS max_milli
FROM sc GROUP BY 1 ORDER BY band
"""


@query("readability_proxy_bands", oracle=_READ_ORACLE)
def readability_proxy_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Flesch-style readability banding with a deterministic
    syllable proxy (vowel-group count — the standard
    dictionary-free approximation) and a 15-words-per-sentence
    proxy (the corpus text carries no sentence punctuation). The
    whole score pipeline is integer milli-units with explicit
    truncating division at each stage, so both engines land on the
    IDENTICAL band for every document — a float Flesch formula
    would band-flip documents sitting on a boundary. Map-side only
    until the bounded band histogram: the scale shape is one scan +
    one tiny aggregation."""
    d = Catalog(spark, sf_dir).documents
    m = d.select(
        "doc_id",
        F.size(
            F.expr("filter(split(text, ' '), x -> x != '')")
        )
        .cast("long")
        .alias("words"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiou]+', 0)")
        )
        .cast("long")
        .alias("syll"),
    )
    f = m.where(F.col("words") > 0).withColumn(
        "sents", F.greatest(F.lit(1), F.expr("words div 15"))
    )
    sc = f.select(
        "doc_id",
        F.expr(
            "206835"
            " - (1015 * (words * 1000 div sents)) div 1000"
            " - (84600 * (syll * 1000 div words)) div 1000"
        ).alias("flesch_milli"),
    )
    return (
        sc.groupBy(
            F.expr("flesch_milli div 10000")
            .cast("long")
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.min("flesch_milli").cast("long").alias("min_milli"),
            F.max("flesch_milli").cast("long").alias("max_milli"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------
# association rules (confidence / lift)
# --------------------------------------------------------------------

#: same basket-size guard as item_cooccurrence_support: users outside
#: [2, 200] distinct purchased items are excluded whole (a 10k-item
#: basket would contribute 50M pairs on its own). Support floor of 3
#: keeps the smoke scale non-vacuous (max pair support at sf0.001 is
#: 3) while still pruning the singleton-pair noise tier at the gate
#: scale (sf0.01: 2011 of 4479 pairs survive).
RULES_MIN_SUPPORT = 3

_RULES_ORACLE = f"""
WITH it AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type = 'purchase'),
keep AS (
  SELECT user_id FROM it GROUP BY user_id
  HAVING count(*) BETWEEN 2 AND 200),
basket AS (SELECT it.user_id, it.item FROM it
           JOIN keep USING (user_id)),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
      FROM basket),
isup AS (SELECT item, CAST(count(*) AS BIGINT) AS sup
         FROM basket GROUP BY item),
psup AS (
  SELECT a.item AS i1, b.item AS i2,
         CAST(count(*) AS BIGINT) AS sup_ab
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {RULES_MIN_SUPPORT})
SELECT i1, i2, sup_ab,
       s1.sup AS sup_i1, s2.sup AS sup_i2,
       CAST(sup_ab * 1000 // s1.sup AS BIGINT) AS conf_permille,
       CAST(sup_ab * n.n * 1000 // (s1.sup * s2.sup) AS BIGINT)
           AS lift_milli
FROM psup
JOIN isup s1 ON psup.i1 = s1.item
JOIN isup s2 ON psup.i2 = s2.item
CROSS JOIN n
ORDER BY lift_milli DESC, i1, i2
"""


@query("association_rules_lift", oracle=_RULES_ORACLE)
def association_rules_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Association-rule mining metrics on purchase baskets —
    confidence(i1→i2) and lift as exact integer permille/milli (a
    float sup/n ratio can straddle an ulp between engines; integer
    numerator-first division cannot). Builds on the same capped
    basket pair core as item_cooccurrence_support (basket size
    [2, 200], pairs keyed on user — never an item×item grid), then
    joins the pair support against the broadcast-size item-support
    table and the 1-row basket count. Int64 bound: the lift
    numerator sup_ab·N·1000 caps at N²·1000 — safe to ~10^7 baskets
    per the documented KS/tau bound family; scale the fold to
    decimal beyond."""
    ev = Catalog(spark, sf_dir).events
    # r12 scan-count fix: keep/basket/n/isup and both pair-join sides
    # each re-ran the JSON-extract scan (10 fact scans measured); the
    # distinct (user, item) table is checkpointed once.
    it = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k")
            .cast("long")
            .alias("item"),
        )
        .distinct()
        .localCheckpoint()
    )
    keep = (
        it.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .where(F.col("sz").between(2, 200))
        .select("user_id")
    )
    # r13 subtree-sweep fix: basket has four consumers (n, item
    # support, both pair-join sides) that each re-ran the size-filter
    # join off the checkpoint, and the item-support table fed both
    # broadcast sides. One checkpoint each: basket is bounded by the
    # distinct (user, item) table it filters, isup by the item
    # dimension.
    basket = it.join(keep, "user_id").localCheckpoint()
    n = basket.agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    isup = (
        basket.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .localCheckpoint()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    psup = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("i1"), F.col("b.item").alias("i2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("sup_ab"))
        .where(F.col("sup_ab") >= RULES_MIN_SUPPORT)
    )
    s1 = isup.select(
        F.col("item").alias("i1"), F.col("sup").alias("sup_i1")
    )
    s2 = isup.select(
        F.col("item").alias("i2"), F.col("sup").alias("sup_i2")
    )
    return (
        psup.join(B(s1), "i1")
        .join(B(s2), "i2")
        .crossJoin(B(n))
        .select(
            "i1",
            "i2",
            "sup_ab",
            "sup_i1",
            "sup_i2",
            F.expr("sup_ab * 1000 div sup_i1")
            .cast("long")
            .alias("conf_permille"),
            F.expr("sup_ab * n * 1000 div (sup_i1 * sup_i2)")
            .cast("long")
            .alias("lift_milli"),
        )
        .orderBy(F.desc("lift_milli"), "i1", "i2")
    )
