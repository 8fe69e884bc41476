"""SURVEY.md §2 round-9 third wave — LLM-pipeline and graph depth:

- ``unicode_nfc_dedup`` — NFC normalization as a dedup key: composed
  vs decomposed Unicode spellings of the SAME text must collide after
  normalization (Python side: a vectorized pandas UDF over
  ``unicodedata``; oracle side: DuckDB ``nfc_normalize``).
- ``degree_assortativity`` — degree-degree Pearson over the trade
  graph's edges (do hubs link hubs?), exact integer moment sums.
- ``zipf_rank_frequency`` — rank-frequency profile of the corpus
  vocabulary with the Zipf prediction f₁/(r·f_r) in exact permille —
  no logs, no fitted slope, fully replayable.
- ``stratified_kfold_assignment`` — deterministic k-fold splitter by
  affine hash (the cross-validation sibling of
  grouped_train_test_split).
- ``type_token_ratio_buckets`` — lexical diversity (TTR) by document
  length bucket, exact integer permille.
- ``bpe_merge_pair_counts`` — the first BPE iteration's merge
  candidates: adjacent character-pair frequencies within tokens.
- ``jensen_shannon_drift`` — symmetric, bounded drift score per
  source vs the corpus distribution, complementing
  kl_divergence_drift; the q-side sum over source-absent vocabulary
  is folded ANALYTICALLY (Σ_{p=0} q·ln2), so no vocab×sources grid
  is ever materialized — the term that would explode at 100 TB.
- ``hapax_legomena_ratio`` — share of vocabulary seen exactly once
  per source (corpus-freshness/diversity signal).

Float appears only in the two divergence queries, in the exact shape
kl_divergence_drift already proved fuzz-stable and driver-green;
everything else is exact integer arithmetic end to end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

#: affine fold hash (the r7 exact-int sketch idiom)
_KF_A = 1103515245
_KF_C = 12345
_KF_P = 2147483647
_KF_K = 5


# --------------------------------------------------------------------
# NFC normalization dedup
# --------------------------------------------------------------------

#: U+0301 combining acute (decomposed marker), U+00E9 precomposed é
_COMB = "́"
_PRE = "é"

_NFC_ORACLE = f"""
WITH v AS (
  SELECT lang,
         contains(text, 'e') AS has_e,
         replace(text, 'e', 'e' || chr(769)) AS a,
         replace(text, 'e', chr(233)) AS b
  FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_raw_differ,
       CAST(sum(CASE WHEN nfc_normalize(a) = nfc_normalize(b)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nfc_equal,
       CAST(sum(CASE WHEN has_e THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_e
FROM v GROUP BY lang ORDER BY lang
"""


@query("unicode_nfc_dedup", oracle=_NFC_ORACLE)
def unicode_nfc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization as a dedup key. The corpus is ASCII,
    so the composed/decomposed divergence is INJECTED
    deterministically: spelling A decomposes every 'e' to e+COMBINING
    ACUTE (U+0301), spelling B uses precomposed é (U+00E9) — byte-wise
    different strings that NFC must collapse to the same form wherever
    the document contains an 'e'. Spark has no NFC builtin, so this is
    a genuine vectorized-pandas-UDF surface (Arrow batches through
    ``unicodedata.normalize``, the sanctioned slow path); the oracle
    replays it with DuckDB's native nfc_normalize. In a real pipeline
    this normalization runs BEFORE every text fingerprint — un-NFC'd
    corpora silently split duplicate clusters."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None
            else None
        )

    d = Catalog(spark, sf_dir).documents
    v = d.select(
        "lang",
        F.col("text").contains("e").alias("has_e"),
        F.replace(
            F.col("text"), F.lit("e"), F.lit("e" + _COMB)
        ).alias("a"),
        F.replace(F.col("text"), F.lit("e"), F.lit(_PRE)).alias("b"),
    )
    return (
        v.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("a") != F.col("b"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_raw_differ"),
            F.sum(
                F.when(nfc(F.col("a")) == nfc(F.col("b")), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_nfc_equal"),
            F.sum(F.when(F.col("has_e"), 1).otherwise(0))
            .cast("long")
            .alias("n_with_e"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------
# degree assortativity of the trade graph
# --------------------------------------------------------------------

_ASSORT_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
                  's' || CAST(l_suppkey AS VARCHAR) AS sn
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey < 60),
edges AS (
  SELECT cn AS src, sn AS dst FROM pairs
  UNION ALL SELECT sn AS src, cn AS dst FROM pairs),
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d
  FROM edges GROUP BY src),
ed AS (
  SELECT ds.d AS x, dd.d AS y
  FROM edges e JOIN deg ds ON e.src = ds.node
               JOIN deg dd ON e.dst = dd.node),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ed)
SELECT m AS n_directed_edges,
       (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         AS assortativity
FROM s
"""


@query("degree_assortativity", oracle=_ASSORT_ORACLE)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer↔supplier trade graph (the
    pagerank_trade_graph edge set): Pearson correlation between the
    endpoint degrees over every directed edge — negative means hubs
    attach to leaves (the usual bipartite signature). Degrees come
    from ONE aggregation reused on both endpoints via two joins that
    broadcast the (node-sized) degree table; the moment sums are
    exact int64 and r is one closed-form double."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.orders.where(F.col("o_custkey") < 60)
        .join(cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cn"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("sn"),
        )
        .distinct()
        # r12 scan-count fix: the degree table and both endpoint
        # joins re-executed the fact join (6 scans measured); one
        # edge-sized checkpoint
        .localCheckpoint()
    )
    edges = pairs.select(
        F.col("cn").alias("src"), F.col("sn").alias("dst")
    ).unionByName(
        pairs.select(F.col("sn").alias("src"), F.col("cn").alias("dst"))
    )
    # r13 subtree-sweep fix: "ONE aggregation reused on both
    # endpoints" must hold physically too — lazily both broadcast
    # sides re-ran the degree agg. Node-sized checkpoint.
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .withColumnRenamed("src", "node")
        .localCheckpoint()
    )
    ed = (
        edges.join(
            B(deg.withColumnRenamed("d", "x")),
            edges.src == F.col("node"),
        )
        .drop("node")
        .join(
            B(deg.withColumnRenamed("d", "y")),
            edges.dst == F.col("node"),
        )
        .select("x", "y")
    )
    s = ed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return s.select(
        F.col("m").alias("n_directed_edges"),
        F.expr(
            "(CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / sqrt((CAST(m AS DOUBLE) * sxx"
            "          - CAST(sx AS DOUBLE) * sx)"
            "        * (CAST(m AS DOUBLE) * syy"
            "           - CAST(sy AS DOUBLE) * sy))"
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------
# Zipf rank-frequency profile
# --------------------------------------------------------------------

_ZIPF_TOPK = 50

_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT x AS w
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
  WHERE x <> ''),
freq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY w),
ranked AS (
  SELECT w, f,
         CAST(row_number() OVER (ORDER BY f DESC, w) AS BIGINT)
             AS rnk
  FROM freq),
top AS (SELECT * FROM ranked WHERE rnk <= {_ZIPF_TOPK}),
f1 AS (SELECT f AS fmax FROM ranked WHERE rnk = 1)
SELECT rnk, w AS token, f AS freq,
       CAST(fmax * 1000 // (rnk * f) AS BIGINT) AS zipf_ratio_permille
FROM top, f1 ORDER BY rnk
"""


@query("zipf_rank_frequency", oracle=_ZIPF_ORACLE)
def zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-frequency profile of the corpus vocabulary with the Zipf
    prediction expressed as f₁·1000 div (r·f_r) — exactly 1000 where
    the law f_r = f₁/r holds, drifting away where it breaks. No logs,
    no fitted slope: the whole profile is exact integer arithmetic
    (the log-log regression variant would put ln() inside a hashed
    contract — the one op whose last ulp varies across libm builds).
    One explode + count + a top-k row_number with a total (freq desc,
    token) order, so ties can't reshuffle ranks between engines."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    freq = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    ranked = freq.select(
        "w",
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("w")))
        .cast("long")
        .alias("rnk"),
    )
    # r13 subtree-sweep fix: top-k and the rank-1 probe both re-ran
    # the explode + count + rank chain; rank 1 lives inside the top-k
    # rows, so checkpoint the 50-row head and derive both from it.
    top = ranked.where(F.col("rnk") <= _ZIPF_TOPK).localCheckpoint()
    f1 = top.where(F.col("rnk") == 1).select(
        F.col("f").alias("fmax")
    )
    return (
        top.crossJoin(B(f1))
        .select(
            "rnk",
            F.col("w").alias("token"),
            F.col("f").alias("freq"),
            F.expr(
                "CAST(fmax * 1000 div (rnk * f) AS BIGINT)"
            ).alias("zipf_ratio_permille"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------
# stratified k-fold assignment
# --------------------------------------------------------------------

_KFOLD_ORACLE = f"""
WITH folded AS (
  SELECT lang,
         (({_KF_A} * doc_id + {_KF_C}) % {_KF_P}) % {_KF_K} AS fold
  FROM documents),
per AS (
  SELECT lang, fold, CAST(count(*) AS BIGINT) AS n
  FROM folded GROUP BY lang, fold),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS lang_n
  FROM folded GROUP BY lang)
SELECT per.lang, fold, n,
       CAST(n * 1000 // lang_n AS BIGINT) AS share_permille
FROM per JOIN tot ON per.lang = tot.lang
ORDER BY per.lang, fold
"""


@query("stratified_kfold_assignment", oracle=_KFOLD_ORACLE)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation splitter: fold =
    affine_hash(doc_id) mod 5 — reproducible on any cluster layout
    (never rand()), stratification REPORTED per language as exact
    permille shares so a skewed fold is visible in the output rather
    than asserted away. The hash is the r7 exact-int idiom, so DuckDB
    replays membership row-for-row; at 100 TB the assignment is a
    map-only projection (no shuffle at all until the audit agg)."""
    d = Catalog(spark, sf_dir).documents
    folded = d.select(
        "lang",
        (
            (F.lit(_KF_A) * F.col("doc_id") + F.lit(_KF_C))
            % F.lit(_KF_P)
            % F.lit(_KF_K)
        ).alias("fold"),
    )
    per = folded.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = folded.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("lang_n")
    )
    return (
        per.join(B(tot), "lang")
        .select(
            "lang",
            "fold",
            "n",
            F.expr("CAST(n * 1000 div lang_n AS BIGINT)").alias(
                "share_permille"
            ),
        )
        .orderBy("lang", "fold")
    )


# --------------------------------------------------------------------
# type-token ratio by length bucket
# --------------------------------------------------------------------

_TTR_ORACLE = """
WITH pertok AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS t,
         len(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> '')))
             AS v
  FROM documents),
bucketed AS (
  SELECT CASE WHEN t // 10 > 9 THEN 9 ELSE t // 10 END AS bucket,
         t, v
  FROM pertok)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS sum_tokens,
       CAST(sum(v) AS BIGINT) AS sum_distinct,
       CAST(sum(v) * 1000 // sum(t) AS BIGINT) AS ttr_permille
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


@query("type_token_ratio_buckets", oracle=_TTR_ORACLE)
def type_token_ratio_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity (type-token ratio) by document-length bucket
    — TTR falls with length, so the bucketing is what makes the
    number comparable across shards; the aggregate ratio is exact
    integer permille. Token and distinct-token counts are computed
    INSIDE the array expressions (size/array_distinct — whole-stage
    codegen, no explode shuffle): per-document work only, one
    aggregation over ten buckets."""
    d = Catalog(spark, sf_dir).documents
    toks = F.expr("filter(split(text, ' '), x -> x != '')")
    pertok = d.select(
        F.size(toks).cast("long").alias("t"),
        F.size(F.array_distinct(toks)).cast("long").alias("v"),
    )
    bucketed = pertok.select(
        F.expr(
            "CAST(CASE WHEN t div 10 > 9 THEN 9 ELSE t div 10 END"
            " AS BIGINT)"
        ).alias("bucket"),
        "t",
        "v",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").cast("long").alias("sum_tokens"),
            F.sum("v").cast("long").alias("sum_distinct"),
        )
        .withColumn(
            "ttr_permille",
            F.expr(
                "CAST(sum_distinct * 1000 div sum_tokens AS BIGINT)"
            ),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------
# BPE first-iteration merge-pair counts
# --------------------------------------------------------------------

_BPE_TOPK = 40

_BPE_ORACLE = f"""
WITH toks AS (
  SELECT lower(x) AS tok
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
  WHERE strlen(x) >= 2),
pairs AS (
  SELECT substring(tok, CAST(i AS INT), 2) AS pair
  FROM toks, unnest(generate_series(1, strlen(tok) - 1)) AS g(i)),
freq AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY pair),
ranked AS (
  SELECT pair, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT)
             AS rnk
  FROM freq)
SELECT rnk, pair, cnt FROM ranked
WHERE rnk <= {_BPE_TOPK} ORDER BY rnk
"""


@query("bpe_merge_pair_counts", oracle=_BPE_ORACLE)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training iteration: frequency of every adjacent
    character pair inside tokens — the argmax is the first merge a
    byte-pair tokenizer would learn (tokenizer_vocab_build covers the
    word-level vocab; this is the subword layer below it). Pairs are
    generated JVM-side as transform(sequence(...)) over each token —
    an array expression, not a Python loop — then one count + top-k
    with a total (count desc, pair) order. At corpus scale the pair
    space is bounded (alphabet²·positions), so the hot aggregation
    state stays tiny no matter how many tokens stream through."""
    d = Catalog(spark, sf_dir).documents
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("x"))
        .where(F.length("x") >= 2)
        .select(F.lower("x").alias("tok"))
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair")
    )
    freq = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ranked = freq.select(
        "pair",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("pair")))
        .cast("long")
        .alias("rnk"),
    )
    return (
        ranked.where(F.col("rnk") <= _BPE_TOPK)
        .select("rnk", "pair", "cnt")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------
# Jensen–Shannon drift per source
# --------------------------------------------------------------------

_JS_ORACLE = """
WITH wc AS (
  SELECT source, x AS w
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
  WHERE x <> ''),
per_source AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM wc GROUP BY source, w),
tots AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS tot
  FROM per_source GROUP BY source),
corpus AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS cc FROM per_source GROUP BY w),
ctot AS (SELECT CAST(sum(cc) AS BIGINT) AS ct FROM corpus),
terms AS (
  SELECT ps.source,
         CAST(ps.c AS DOUBLE) / t.tot AS p,
         CAST(co.cc AS DOUBLE) / ctot.ct AS q
  FROM per_source ps
  JOIN tots t ON ps.source = t.source
  JOIN corpus co ON ps.w = co.w
  CROSS JOIN ctot)
SELECT source,
       round(0.5 * sum(p * ln(p / ((p + q) / 2)))
             + 0.5 * (sum(q * ln(q / ((p + q) / 2)))
                      + ln(2) * (1 - sum(q))), 6) AS js_nats,
       CAST(count(*) AS BIGINT) AS n_terms
FROM terms GROUP BY source ORDER BY source
"""


@query("jensen_shannon_drift", oracle=_JS_ORACLE)
def jensen_shannon_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's word distribution
    from the corpus — symmetric and bounded by ln 2, the drift score
    to alarm on when KL's asymmetry misleads. The q-side KL runs over
    the WHOLE corpus vocabulary, but terms absent from the source
    contribute exactly q·ln2 (m = q/2 there), so that mass is folded
    ANALYTICALLY as ln2·(1 − Σ over p>0 of q) — the vocab×sources grid a
    naive implementation would materialize (the 100 TB killer) never
    exists. Float shape mirrors kl_divergence_drift (fuzz-stable,
    driver-green since r2): per-term doubles from exact counts,
    round(…, 6)."""
    d = Catalog(spark, sf_dir).documents
    wc = d.select("source", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    # r12 scan-count re-plan: tots/corpus/ctot all derive from the
    # (source, word) count table, and each derivation re-executed the
    # tokenize pipeline (FOUR corpus scans measured). The term-
    # frequency table is eagerly localCheckpoint-ed — the production
    # "materialize the TF table" move — so the whole query costs ONE
    # corpus scan plus vocab-sized local IO. Row values are identical;
    # only the lineage changes.
    per_source = (
        wc.groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    tots = per_source.groupBy("source").agg(
        F.sum("c").cast("long").alias("tot")
    )
    # r13 subtree-sweep fix (the kl twin got the same): corpus feeds
    # both the broadcast join and the corpus total, so the vocab
    # aggregate over the TF checkpoint executed twice. Checkpoint the
    # vocab-sized table once; ctot reads it.
    corpus = (
        per_source.groupBy("w")
        .agg(F.sum("c").cast("long").alias("cc"))
        .localCheckpoint()
    )
    ctot = corpus.agg(F.sum("cc").cast("long").alias("ct"))
    terms = (
        per_source.join(B(tots), "source")
        .join(B(corpus), "w")
        .crossJoin(B(ctot))
        .select(
            "source",
            (F.col("c").cast("double") / F.col("tot")).alias("p"),
            (F.col("cc").cast("double") / F.col("ct")).alias("q"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.round(
                0.5 * F.sum(F.expr("p * ln(p / ((p + q) / 2))"))
                + 0.5
                * (
                    F.sum(F.expr("q * ln(q / ((p + q) / 2))"))
                    + F.expr("ln(2)") * (1 - F.sum("q"))
                ),
                6,
            ).alias("js_nats"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------
# hapax legomena ratio
# --------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH wc AS (
  SELECT source, lower(x) AS w
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
  WHERE x <> ''),
freq AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM wc GROUP BY source, w)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS hapax_permille
FROM freq GROUP BY source ORDER BY source
"""


@query("hapax_legomena_ratio", oracle=_HAPAX_ORACLE)
def hapax_legomena_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each source's vocabulary occurring exactly once
    (hapax legomena) — a high ratio flags fresh/diverse text, a
    collapsing ratio flags template spam before dedup even runs. Two
    stacked map-side-combinable aggregations ((source, word) counts →
    per-source rollup), all exact integers."""
    d = Catalog(spark, sf_dir).documents
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("x"))
        .where(F.col("x") != "")
        .select("source", F.lower("x").alias("w"))
    )
    freq = wc.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        freq.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .withColumn(
            "hapax_permille",
            F.expr("CAST(n_hapax * 1000 div n_types AS BIGINT)"),
        )
        .orderBy("source")
    )
