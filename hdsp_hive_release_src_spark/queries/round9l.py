"""SURVEY.md §2 round-9 twelfth wave (queued for the r10 window) —
keyword mining / ANSI try-arithmetic / survival analysis:

- ``rake_keyword_phrases`` — RAKE keyword extraction (Rose et al.
  2010): candidate phrases are maximal stopword-delimited token
  runs, word score = degree/frequency over the candidate corpus,
  phrase score = Σ word scores — all in exact integer milli units
  so both engines rank identical phrases identically.
- ``try_arith_family`` — the ANSI ``try_``-prefixed arithmetic
  surface (try_add / try_subtract / try_multiply / try_divide /
  try_cast / try_element_at): overflow, div-by-zero, bad casts and
  out-of-range indexes all become NULL instead of runtime errors;
  the oracle replays the same semantics with HUGEINT range guards.
- ``km_survival_hazard`` — Kaplan-Meier-style survival table for
  time-to-first-high-value-purchase: per duration day the risk set,
  deaths, censored count and the exact integer hazard — the
  censoring-aware way to measure conversion latency (a naive
  mean-days-to-purchase is biased by users who never converted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.materialize import (
    checkpoint_reduced_and_release,
    persist_fact_rows,
)
from hdsp_hive_release_src_spark.functions.text import (
    STOPWORDS_EN,
    sql_in_list,
)
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


# --------------------------------------------------------------------
# RAKE keyword extraction
# --------------------------------------------------------------------

#: RAKE candidate-phrase length band (the classic implementation caps
#: phrases at 3-4 words: longer runs are co-occurrence noise) and the
#: deterministic top-k cut.
RAKE_MIN_LEN, RAKE_MAX_LEN = 2, 4
RAKE_TOP = 20

_STOP_IN = sql_in_list(STOPWORDS_EN)

_RAKE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, i, l[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS l
        FROM documents WHERE lang = 'en') d,
       unnest(generate_series(1, len(l))) AS t(i)
  WHERE l[i] <> ''),
nonstop AS (
  SELECT doc_id, i, w,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM toks WHERE w NOT IN ({_STOP_IN})),
pw AS (
  SELECT * FROM (
    SELECT doc_id, grp, i, w,
           count(*) OVER (PARTITION BY doc_id, grp) AS plen
    FROM nonstop) r
  WHERE plen BETWEEN {RAKE_MIN_LEN} AND {RAKE_MAX_LEN}),
ws AS (
  SELECT w, CAST(sum(plen) * 1000 // count(*) AS BIGINT) AS score_milli
  FROM pw GROUP BY w),
occ AS (
  SELECT pw.doc_id, pw.grp,
         string_agg(pw.w, ' ' ORDER BY pw.i) AS phrase,
         CAST(max(pw.plen) AS BIGINT) AS phrase_len,
         CAST(sum(ws.score_milli) AS BIGINT) AS score_milli
  FROM pw JOIN ws ON pw.w = ws.w
  GROUP BY pw.doc_id, pw.grp)
SELECT phrase, phrase_len,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(max(score_milli) AS BIGINT) AS score_milli
FROM occ GROUP BY phrase, phrase_len
ORDER BY score_milli DESC, phrase LIMIT {RAKE_TOP}
"""


@query("rake_keyword_phrases", oracle=_RAKE_ORACLE)
def rake_keyword_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction) over the English
    documents: candidate phrases are maximal runs of non-stopword
    tokens (the gaps-and-islands grouping pos − row_number — one
    window, no self-join), each word scores degree/frequency over the
    candidate corpus (degree = Σ lengths of phrases containing it),
    and a phrase scores the sum of its word scores. All scores are
    integer milli units (numerator-first division), so the top-k
    ranking is engine-stable. Shapes: tokenize map-side, one window
    per doc for islands, one bounded word-score aggregate joined back
    broadcast-style, deterministic (score, phrase) top {RAKE_TOP}.
    Phrase boundaries are stopwords only (the corpus is already
    punctuation-free lowercase)."""
    docs = Catalog(spark, sf_dir).documents.where(F.col("lang") == "en")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("i", "w"),
        )
        .where(F.col("w") != "")
    )
    nonstop = toks.where(~F.col("w").isin(*STOPWORDS_EN)).select(
        "doc_id",
        "i",
        "w",
        (
            F.col("i")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("i")
            )
        ).alias("grp"),
    )
    # r13 subtree-sweep fix: the word-score aggregate and the phrase
    # re-assembly both consumed pw, re-running the tokenize + islands
    # windows from parquet. pw is token-row-sized (grows with the
    # corpus) — DISK_ONLY persist per the materialize.py discipline,
    # so the second consumer re-reads the narrow projection instead
    # of re-executing two windows over the full scan.
    pw = persist_fact_rows(
        nonstop.select(
            "doc_id",
            "grp",
            "i",
            "w",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id", "grp"))
            .alias("plen"),
        ).where(F.col("plen").between(RAKE_MIN_LEN, RAKE_MAX_LEN))
    )
    ws = pw.groupBy("w").agg(
        F.expr("cast(sum(plen) * 1000 div count(1) as bigint)").alias(
            "score_milli"
        )
    )
    occ = (
        pw.join(B(ws), "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, w))),"
                    " s -> s.w)"
                ),
                " ",
            ).alias("phrase"),
            F.max("plen").cast("long").alias("phrase_len"),
            F.sum("score_milli").cast("long").alias("score_milli"),
        )
    )
    # r14 hygiene: the top-N result is checkpointed off the cache and
    # the token-row persist released — no session-lifetime cache
    return checkpoint_reduced_and_release(
        occ.groupBy("phrase", "phrase_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_milli").cast("long").alias("score_milli"),
        )
        .select("phrase", "phrase_len", "n_occurrences", "score_milli")
        .orderBy(F.desc("score_milli"), "phrase")
        .limit(RAKE_TOP),
        pw,
    )


# --------------------------------------------------------------------
# try_* arithmetic family
# --------------------------------------------------------------------

_I64_MAX = 9223372036854775807
_I64_MIN = -9223372036854775808

#: (label, x, y, s, idx) probe grid: int64 boundary adds/subs, an
#: overflowing multiply, division by zero, a non-numeric cast, and
#: element_at indexes {2, 5, -1} (0 is NOT probed: Spark's
#: try_element_at still raises INVALID_INDEX_OF_ZERO by spec).
_TRY_GRID = (
    ("add_ovf", _I64_MAX, 1, "1,234", 2),
    ("sub_ovf", _I64_MIN, 1, "12", 5),
    ("mul_ovf", 4611686018427387904, 4, "abc", -1),
    ("ok_small", 41, 2, "7", 2),
    ("div_zero", 10, 0, "99", 5),
)

_TRY_VALUES = ", ".join(
    f"('{l}', CAST({x} AS BIGINT), CAST({y} AS BIGINT), '{s}', {i})"
    for (l, x, y, s, i) in _TRY_GRID
)

_TRY_ORACLE = f"""
WITH g(label, x, y, s, idx) AS (VALUES {_TRY_VALUES}),
h AS (
  SELECT label, x, y, s, idx,
         CAST(x AS HUGEINT) + y AS ha,
         CAST(x AS HUGEINT) - y AS hs,
         CAST(x AS HUGEINT) * y AS hm
  FROM g)
SELECT label,
       CAST(CASE WHEN ha BETWEEN {_I64_MIN} AND {_I64_MAX}
                 THEN ha END AS BIGINT) AS add_r,
       CAST(CASE WHEN hs BETWEEN {_I64_MIN} AND {_I64_MAX}
                 THEN hs END AS BIGINT) AS sub_r,
       CAST(CASE WHEN hm BETWEEN {_I64_MIN} AND {_I64_MAX}
                 THEN hm END AS BIGINT) AS mul_r,
       CASE WHEN y = 0 THEN NULL
            ELSE CAST(x AS DOUBLE) / y END AS div_r,
       TRY_CAST(s AS BIGINT) AS cast_r,
       CAST(list_extract([10, 20, 30], idx) AS BIGINT) AS elem_r
FROM h ORDER BY label
"""


@query("try_arith_family", oracle=_TRY_ORACLE)
def try_arith_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``try_``-prefixed function surface: try_add/try_subtract/
    try_multiply return NULL on int64 overflow instead of raising
    (probed at both int64 boundaries and with a doubling overflow),
    try_divide NULLs division by zero, try_cast NULLs a non-numeric
    string, try_element_at NULLs an out-of-range index and supports
    negative from-the-end indexing. The oracle replays every cell
    with HUGEINT range guards — the NULL pattern itself is the
    verified output. Literal 5-row grid; no table scan."""
    df = spark.sql(
        f"SELECT * FROM (VALUES {_TRY_VALUES})"
        " AS g(label, x, y, s, idx)"
    )
    return df.select(
        "label",
        F.expr("try_add(x, y)").cast("long").alias("add_r"),
        F.expr("try_subtract(x, y)").cast("long").alias("sub_r"),
        F.expr("try_multiply(x, y)").cast("long").alias("mul_r"),
        F.expr("try_divide(x, y)").alias("div_r"),
        F.expr("try_cast(s AS BIGINT)").alias("cast_r"),
        F.expr(
            "try_element_at(array(10L, 20L, 30L), cast(idx as int))"
        ).alias("elem_r"),
    ).orderBy("label")


# --------------------------------------------------------------------
# Kaplan-Meier survival / hazard table
# --------------------------------------------------------------------

#: conversion event: first purchase of at least $200 (20000 cents).
#: ~20-25%% of users convert at every scale; the rest are censored at
#: corpus end — a real censoring mix, so the n_censored column is
#: non-vacuous.
KM_CENTS = 20000

_KM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS fd,
         CAST(min(CASE WHEN event_type = 'purchase'
                        AND CAST(round(value * 100) AS BIGINT)
                            >= {KM_CENTS}
                       THEN CAST(ts AS TIMESTAMP) END) AS DATE) AS pd
  FROM events GROUP BY user_id),
cut AS (
  SELECT CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) AS mx FROM events),
lif AS (
  SELECT CASE WHEN pd IS NOT NULL THEN date_diff('day', fd, pd)
              ELSE date_diff('day', fd, cut.mx) END AS t,
         CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS dead
  FROM u CROSS JOIN cut),
g AS (
  SELECT t, CAST(sum(dead) AS BIGINT) AS d,
         CAST(sum(1 - dead) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS n
  FROM lif GROUP BY t),
km AS (
  SELECT t, d, c,
         CAST(sum(n) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS n_risk
  FROM g)
SELECT CAST(t AS BIGINT) AS t_days, n_risk, d AS d_events,
       c AS n_censored,
       CAST(d * 1000 // n_risk AS BIGINT) AS hazard_permille
FROM km ORDER BY t_days
"""


@query("km_survival_hazard", oracle=_KM_ORACLE)
def km_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style survival table for time-to-first-$200-
    purchase: per duration day t, the at-risk count (users whose
    observed duration ≥ t — the reverse-cumulative of the duration
    histogram), conversions (deaths), right-censored users (never
    converted before corpus end), and the discrete hazard d·1000 div
    n_risk in exact permille. This is the censoring-aware conversion
    latency — a plain mean over converters only would be biased. One
    groupBy(user) pass builds durations; everything after runs on
    the bounded duration grid (≤ corpus span in days), including the
    reverse-cumulative window. Deaths and censored counts are both
    nonzero at every test scale."""
    ev = Catalog(spark, sf_dir).events
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("fd"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.round(F.col("value") * 100).cast("long")
                    >= KM_CENTS
                ),
                F.col("ts"),
            )
        )
        .cast("date")
        .alias("pd"),
    )
    cut = ev.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    lif = u.crossJoin(B(cut)).select(
        F.when(
            F.col("pd").isNotNull(), F.datediff("pd", "fd")
        )
        .otherwise(F.datediff("mx", "fd"))
        .alias("t"),
        F.when(F.col("pd").isNotNull(), 1).otherwise(0).alias("dead"),
    )
    g = lif.groupBy("t").agg(
        F.sum("dead").cast("long").alias("d"),
        F.sum(1 - F.col("dead")).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g.select(
            F.col("t").cast("long").alias("t_days"),
            F.sum("n").over(w).cast("long").alias("n_risk"),
            F.col("d").alias("d_events"),
            F.col("c").alias("n_censored"),
            F.expr("cast(d * 1000 div (sum(n) over (order by t desc"
                   " rows unbounded preceding)) as bigint)").alias(
                "hazard_permille"
            ),
        )
        .orderBy("t_days")
    )
