"""SURVEY.md §2.4 round-5 additions, batch 2 — corpus-quality and
incremental-curation operators a production training-data pipeline
runs between ingestion and shard packing:

- ``repetition_score``: Gopher-style intra-document repetition (the
  single strongest generated-spam signal in Rae et al. 2021's rules).
- ``gopher_quality_rules``: the composite document-shape rule gate.
- ``incremental_dedup``: new-batch-vs-corpus dedup — the O(batch)
  nightly operation that makes full-corpus re-dedup unnecessary.
- ``dsir_importance_weights``: hashed-n-gram importance weights
  (DSIR, Xie et al. 2023, arXiv:2302.03169) scoring each doc by how
  target-like its token distribution is.

All JVM-side expressions (no Python UDFs); every operator carries a
full DuckDB oracle replaying the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

# Non-empty whitespace tokens, shared shape with the oracle's
# string_split + filter.
_TOKS = "filter(split(text, ' '), t -> t != '')"


@query(
    "repetition_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS ws
      FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN []
                  ELSE list_transform(range(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
             END AS gs
      FROM tok)
    SELECT doc_id,
           CAST(len(gs) AS BIGINT) AS n_grams,
           round(CASE WHEN len(gs) = 0 THEN 0.0
                 ELSE 1.0 - len(list_distinct(gs)) * 1.0 / len(gs)
                 END, 6) AS rep_ratio
    FROM grams
    ORDER BY doc_id
    """,
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: the fraction of word-trigrams that
    are duplicates of an earlier trigram in the SAME document
    (1 − distinct/total). Boilerplate spam and generation loops score
    high; clean prose scores near 0. Map-only — one projection per
    document, no shuffle except the presentation sort — so it runs at
    ingest speed on any corpus size (the Gopher repetition rule class,
    Rae et al. 2021 §A1.1)."""
    d = Catalog(spark, sf_dir).documents
    grams = F.expr(
        f"""CASE WHEN size({_TOKS}) < 3 THEN array()
        ELSE transform(sequence(0, size({_TOKS}) - 3),
             i -> concat_ws(' ', element_at({_TOKS}, i + 1),
                  element_at({_TOKS}, i + 2), element_at({_TOKS}, i + 3)))
        END"""
    )
    g = d.select("doc_id", grams.alias("gs"))
    return g.select(
        "doc_id",
        F.size("gs").cast("long").alias("n_grams"),
        F.round(
            F.when(F.size("gs") == 0, F.lit(0.0)).otherwise(
                1.0
                - F.size(F.array_distinct("gs"))
                / F.size("gs").cast("double")
            ),
            6,
        ).alias("rep_ratio"),
    ).orderBy("doc_id")


@query(
    "gopher_quality_rules",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
                 AS n_words,
             CASE WHEN len(list_filter(string_split(text, ' '),
                          t -> t <> '')) = 0 THEN 0.0
                  ELSE list_sum(list_transform(
                         list_filter(string_split(text, ' '),
                                     t -> t <> ''),
                         t -> len(t))) * 1.0
                       / len(list_filter(string_split(text, ' '),
                                         t -> t <> ''))
             END AS mean_word_len,
             CASE WHEN len(text) = 0 THEN 0.0
                  ELSE (len(text) - len(regexp_replace(text,
                        '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0 / len(text)
             END AS symbol_ratio
      FROM documents),
    flags AS (
      SELECT doc_id,
             n_words BETWEEN 10 AND 10000 AS wc_ok,
             mean_word_len BETWEEN 2.0 AND 12.0 AS mwl_ok,
             symbol_ratio <= 0.30 AS sym_ok
      FROM m)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN wc_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_word_count,
           CAST(sum(CASE WHEN mwl_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_mean_word_len,
           CAST(sum(CASE WHEN sym_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_symbol_ratio,
           CAST(sum(CASE WHEN wc_ok AND mwl_ok AND sym_ok
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
    FROM flags
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-shape rule gate (the Gopher rules family):
    word-count bounds, mean-word-length bounds, and symbol-character
    ratio, reported as per-rule pass counts plus the conjunction. All
    three metrics are single-pass map expressions over each document —
    the gate costs one corpus scan regardless of rule count, which is
    why rule-based filtering is always the FIRST stage of a curation
    pipeline (it shrinks the corpus before anything quadratic or
    model-based runs)."""
    d = Catalog(spark, sf_dir).documents
    n_words = F.size(F.expr(_TOKS))
    sum_len = F.expr(
        f"aggregate({_TOKS}, 0L, (acc, t) -> acc + length(t))"
    )
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        sum_len / n_words.cast("double")
    )
    stripped = F.regexp_replace("text", "[^a-zA-Z0-9 ]", "")
    sym_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        (F.length("text") - F.length(stripped))
        / F.length("text").cast("double")
    )
    flags = d.select(
        n_words.between(10, 10000).alias("wc_ok"),
        mean_wl.between(2.0, 12.0).alias("mwl_ok"),
        (sym_ratio <= 0.30).alias("sym_ok"),
    )
    as_int = lambda c: F.sum(F.col(c).cast("int")).cast("long")  # noqa: E731
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_int("wc_ok").alias("pass_word_count"),
        as_int("mwl_ok").alias("pass_mean_word_len"),
        as_int("sym_ok").alias("pass_symbol_ratio"),
        F.sum(
            (F.col("wc_ok") & F.col("mwl_ok") & F.col("sym_ok"))
            .cast("int")
        )
        .cast("long")
        .alias("pass_all"),
    )


@query(
    "incremental_dedup",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 300),
    batch AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 300),
    ranked AS (
      SELECT doc_id, h,
             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM batch)
    SELECT r.doc_id,
           CASE WHEN e.h IS NOT NULL THEN 'dup_of_corpus'
                WHEN r.rn > 1 THEN 'dup_in_batch'
                ELSE 'keep' END AS decision
    FROM ranked r LEFT JOIN existing e ON r.h = e.h
    ORDER BY r.doc_id
    """,
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch-vs-corpus) exact dedup — the operation a
    running pipeline executes nightly so the full corpus never needs
    re-deduplication: each batch doc is dropped if its content hash
    already exists in the corpus ('dup_of_corpus'), deduped
    first-wins within the batch ('dup_in_batch'), else kept. Scale
    shape: the corpus side reduces to DISTINCT digests before the
    join (shuffle semi-shaped left join keyed on the 16-byte hash —
    O(batch + corpus_digests), never rescanning corpus text), and the
    within-batch window partitions by digest, so cost is O(batch) per
    increment. The corpus/batch split here (doc_id 300) stands in for
    yesterday's-table vs today's-drop."""
    d = Catalog(spark, sf_dir).documents
    existing = (
        d.where(F.col("doc_id") < 300)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    batch = d.where(F.col("doc_id") >= 300).select(
        "doc_id", F.md5("text").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    ranked = batch.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(existing, "h", "left")
        .select(
            "doc_id",
            F.when(F.col("in_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("keep"))
            .alias("decision"),
        )
        .orderBy("doc_id")
    )


def _dsir_oracle() -> str:
    """DSIR hashed-unigram importance weights, replayed exactly: token
    → md5-derived bucket in [0, 64), target = English docs, source =
    whole corpus, add-one smoothed log-ratio summed per doc.

    Cross-engine determinism (the r5 driver hash-flip fix): the
    per-token float sum is replaced by (1) exact integer (doc, bucket)
    counts, (2) the 64 bucket log-ratios quantized to 6 decimals (a
    1-ulp ``ln`` divergence between libm implementations cannot
    survive the quantization), (3) a per-doc fold over the
    bucket-sorted term list — identical doubles added in identical
    order are bit-identical in IEEE arithmetic. r16: the OUTPUT
    rounds to 6 decimals, not 4 — the true sum is an exact multiple
    of 1e-6 (integer counts × 6dp-grid ratios), so 6dp rounding
    recovers the grid point identically in both engines, while a 4dp
    round can land exactly on a half-boundary where the engines'
    rounding PRIMITIVES disagree on the same double (measured at
    sf0.1, doc 2074: fold = 0.057249999999999995; DuckDB's
    multiply-shift sees 572.5 exactly → 0.0573, Java BigDecimal sees
    the sub-boundary decimal → 0.0572)."""
    bucket = (
        "CAST(strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1"
        " AS BIGINT) * 4"
        " + CAST((strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1)"
        " // 4 AS BIGINT)"
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
             x -> x <> '')) AS t
      FROM documents),
    bk AS (SELECT doc_id, lang, {bucket} AS b FROM tok),
    tgt AS (SELECT b, count(*) AS c FROM bk WHERE lang = 'en'
            GROUP BY b),
    src AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
    tot AS (SELECT (SELECT sum(c) FROM tgt) AS tn,
                   (SELECT sum(c) FROM src) AS sn),
    ratio AS (
      SELECT s.b,
             round(ln(((coalesce(t.c, 0) + 1.0) / (tot.tn + 64))
                      / ((s.c + 1.0) / (tot.sn + 64))), 6) AS lr
      FROM src s LEFT JOIN tgt t ON s.b = t.b CROSS JOIN tot),
    cnt AS (SELECT doc_id, b, count(*) AS n FROM bk GROUP BY 1, 2)
    SELECT cnt.doc_id,
           CAST(sum(cnt.n) AS BIGINT) AS n_tokens,
           round(list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list(cnt.n * r.lr ORDER BY cnt.b)),
                 (acc, x) -> acc + x), 6) AS dsir_logweight
    FROM cnt JOIN ratio r ON cnt.b = r.b
    GROUP BY cnt.doc_id ORDER BY cnt.doc_id
    """


@query("dsir_importance_weights", oracle=_dsir_oracle())
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al.
    2023): per-document log importance weight under hashed-unigram
    bag-of-words models of target (English docs) vs source (whole
    corpus) — the weights a pipeline resamples by to tilt a raw crawl
    toward a target domain. Tokens hash into 64 md5-derived buckets
    (exactly reproducible in the oracle); both distributions are
    add-one smoothed. Scale shape: the 64-row ratio table is computed
    by one token-bucket aggregation each over target and source and
    then BROADCAST into the per-doc scoring join, so the corpus is
    scanned twice (model build, scoring) and never shuffled on doc
    tokens. Bucket hashing caps model memory at O(64) regardless of
    vocabulary size — the reason DSIR scales where an exact-vocab LM
    does not.

    Determinism (the r6 fix for the one red r5 driver row): exact
    (doc, bucket) integer counts → bucket log-ratios quantized to 6
    decimals (a 1-ulp libm ``ln`` divergence cannot survive the
    quantization) → per-doc weight as a bucket-sorted left fold with
    a 0.0 seed, mirrored term-for-term in the DuckDB twin — identical
    doubles added in identical order are bit-identical, so both
    engines round the SAME double. r16: the output round moved
    4dp → 6dp. The true sum is an exact 1e-6 grid multiple (integer
    counts × 6dp-grid ratios), so a 4dp round can land exactly on a
    half-boundary — where the engines' rounding PRIMITIVES disagree
    on the identical double (caught by the r16 sf0.1 parity
    spot-check, doc 2074: fold = 0.057249999999999995, DuckDB's
    multiply-shift round saw 572.5 exactly → 0.0573, Java BigDecimal
    saw the sub-boundary exact decimal → 0.0572). A 6dp round always
    targets the grid point itself, which both primitives recover
    identically."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.expr(_TOKS)).alias("t"),
    )
    bucket = (
        (
            F.expr("instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1")
        ).cast("long")
        * 4
        + (
            F.expr(
                "(instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1)"
                " div 4"
            )
        ).cast("long")
    )
    bk = tok.select("doc_id", "lang", bucket.alias("b"))
    # r12 scan-count re-plan (was FIVE corpus scans: tgt, src, and
    # their two total aggregates each re-executed the tokenize
    # pipeline, plus the scoring pass). Both bucket models and both
    # totals are sums over the per-(doc, bucket) counts, so ONE
    # aggregation serves the whole model side; the 64-row stats table
    # is eagerly localCheckpoint-ed (the q11 idiom — Spark has no
    # plan-level sharing across the scalar-agg branch) so the totals
    # and ratio derive without touching the corpus again. Model build
    # = 1 scan, scoring = 1 scan — the "scanned twice" the docstring
    # always promised. All inputs to lr are the same exact integers
    # as before (tc of an en-absent bucket is 0 via the conditional
    # sum, exactly as the old left-join coalesce produced).
    cnt = bk.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = (
        cnt.groupBy("b")
        .agg(
            F.sum("n").alias("sc"),
            F.sum(
                F.when(F.col("lang") == "en", F.col("n")).otherwise(0)
            ).alias("tc"),
        )
        .localCheckpoint()
    )
    tots = stats.agg(
        F.sum("tc").alias("tn"), F.sum("sc").alias("sn")
    )
    ratio = stats.join(B(tots)).select(
        "b",
        F.round(
            F.log(
                ((F.col("tc") + 1.0) / (F.col("tn") + 64))
                / ((F.col("sc") + 1.0) / (F.col("sn") + 64))
            ),
            6,
        ).alias("lr"),
    )
    return (
        cnt.join(B(ratio), "b")
        .select(
            "doc_id",
            "n",
            F.struct(F.col("b"), (F.col("n") * F.col("lr")).alias("term"))
            .alias("bt"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("bt")),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                ),
                6,
            ).alias("dsir_logweight"),
        )
        .orderBy("doc_id")
    )


def _containment_oracle() -> str:
    from hdsp_hive_release_src_spark.queries.llm import (
        _DUCK_SH_CAPPED,
        _DUCK_SHINGLES,
    )

    return f"""
    WITH {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2,
           round(inter * 1.0 / least(s1.n, s2.n), 6) AS containment
    FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
    WHERE inter * 1.0 / least(s1.n, s2.n) >= 0.8
    ORDER BY d1, d2
    """


@query("dedup_containment", oracle=_containment_oracle())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-similarity pairs (|A∩B| / min(|A|,|B|) ≥ 0.8) — the
    SUBSET detector Jaccard misses: a short doc quoted whole inside a
    long one has tiny Jaccard (union is dominated by the long doc) but
    containment ≈ 1. This is the measure for quote/excerpt dedup and
    prompt-template collapse. Same single-scan inverted-index pair
    core as dedup_ngram_jaccard (shingle_pair_counts — the coefficient
    is just a different ratio over (n1, n2, inter)), so the scale
    properties are identical: bounded postings, join-free pair
    generation, one corpus scan."""
    from hdsp_hive_release_src_spark.queries.llm import (
        MAX_SHINGLE_DF,
        _parallel_docs,
        shingle_pair_counts,
    )

    pairs = shingle_pair_counts(
        _parallel_docs(spark, sf_dir), MAX_SHINGLE_DF
    )
    cont = F.col("inter") / F.least("n1", "n2")
    return (
        pairs.where(cont >= 0.8)
        .select(
            "d1", "d2", F.round(cont, 6).alias("containment")
        )
        .orderBy("d1", "d2")
    )


def _incr_minhash_oracle() -> str:
    from hdsp_hive_release_src_spark.queries.llm import (
        _DUCK_SH_CAPPED,
        _DUCK_SHINGLES,
    )

    return f"""
    WITH {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      WHERE a.doc_id < 300 AND b.doc_id >= 300
      GROUP BY 1, 2),
    near AS (
      SELECT d2 AS batch_doc, min(d1) AS matched_corpus_doc
      FROM pairs JOIN sz s1 ON d1 = s1.doc_id
                 JOIN sz s2 ON d2 = s2.doc_id
      WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5
      GROUP BY d2)
    SELECT d.doc_id AS batch_doc,
           CASE WHEN near.batch_doc IS NOT NULL
                THEN 'near_dup_of_corpus' ELSE 'keep' END AS decision,
           near.matched_corpus_doc
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 300) d
    LEFT JOIN near ON near.batch_doc = d.doc_id
    ORDER BY batch_doc
    """


@query("incremental_dedup_minhash", oracle=_incr_minhash_oracle())
def incremental_dedup_minhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental NEAR-dup: each new-batch document checked for
    Jaccard ≥ 0.5 similarity against the EXISTING corpus only — the
    nightly companion to incremental_dedup's exact pass (a re-crawl
    with one changed sentence sails through exact hashing; this
    catches it). Candidates come from the same capped inverted
    shingle index (shingle_pair_counts), restricted to cross
    (corpus, batch) pairs; batch-internal and corpus-internal pairs
    are not even generated downstream work. In production the corpus
    side is a PERSISTED signature/index table (the
    semantic_dedup-style materialization) so each increment costs
    O(batch × avg-postings), never a corpus rescan; here both sides
    derive from one table split at doc_id 300 so the oracle can
    replay the identical index."""
    from hdsp_hive_release_src_spark.queries.llm import (
        MAX_SHINGLE_DF,
        _parallel_docs,
        shingle_pair_counts,
    )

    d = _parallel_docs(spark, sf_dir)
    pairs = shingle_pair_counts(d, MAX_SHINGLE_DF)
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    near = (
        pairs.where(
            (F.col("d1") < 300) & (F.col("d2") >= 300) & (jac >= 0.5)
        )
        .groupBy(F.col("d2").alias("batch_doc"))
        .agg(F.min("d1").alias("matched_corpus_doc"))
    )
    batch = d.where(F.col("doc_id") >= 300).select(
        F.col("doc_id").alias("batch_doc")
    )
    return (
        batch.join(near, "batch_doc", "left")
        .select(
            "batch_doc",
            F.when(
                F.col("matched_corpus_doc").isNotNull(),
                F.lit("near_dup_of_corpus"),
            )
            .otherwise(F.lit("keep"))
            .alias("decision"),
            "matched_corpus_doc",
        )
        .orderBy("batch_doc")
    )


@query(
    "char_entropy_filter",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(text) + 1),
                    i -> substr(text, i, 1))) AS c
      FROM documents WHERE len(text) > 0),
    freq AS (
      SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
    tot AS (SELECT doc_id, sum(n) AS total FROM freq GROUP BY doc_id)
    SELECT freq.doc_id,
           CAST(tot.total AS BIGINT) AS n_chars,
           round(-sum((n * 1.0 / total) * log2(n * 1.0 / total)), 4)
               AS entropy
    FROM freq JOIN tot ON freq.doc_id = tot.doc_id
    GROUP BY freq.doc_id, tot.total
    ORDER BY freq.doc_id
    """,
)
def char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution entropy per document — the gibberish /
    base64-blob / key-dump detector (natural text sits ~4 bits/char;
    random alphanumerics ~6; single-char spam ~0). One explode to
    (doc, char) rows, one shuffle on that composite key for the
    frequency counts, then the entropy fold per doc. At 100 TB the
    char explode is the cost — production computes the same histogram
    inside one mapInPandas pass; the relational form here keeps the
    whole computation oracle-replayable."""
    d = Catalog(spark, sf_dir).documents.where(F.length("text") > 0)
    ch = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)),"
                " i -> substr(text, i, 1))"
            )
        ).alias("c"),
    )
    freq = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    # r13 subtree-sweep fix: the per-doc total was a second aggregate
    # joined back, re-running the char explode. A doc-partitioned
    # window computes it in the same pass — no join, one scan.
    wdoc = Window.partitionBy("doc_id")
    freq = freq.withColumn("total", F.sum("n").over(wdoc))
    p = F.col("n") / F.col("total")
    return (
        freq
        .groupBy("doc_id", "total")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy")
        )
        .select(
            "doc_id",
            F.col("total").cast("long").alias("n_chars"),
            "entropy",
        )
        .orderBy("doc_id")
    )


def _cross_source_oracle() -> str:
    from hdsp_hive_release_src_spark.queries.llm import (
        _DUCK_SH_CAPPED,
        _DUCK_SHINGLES,
    )

    return f"""
    WITH {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    near AS (
      SELECT d1, d2 FROM pairs
      JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5),
    lab AS (
      SELECT near.d1, near.d2, da.source AS s1, db.source AS s2
      FROM near JOIN documents da ON near.d1 = da.doc_id
                JOIN documents db ON near.d2 = db.doc_id)
    SELECT least(s1, s2) AS source_a, greatest(s1, s2) AS source_b,
           count(*) AS n_pairs
    FROM lab GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """


@query("cross_source_dedup_matrix", oracle=_cross_source_oracle())
def cross_source_dedup_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The source-overlap matrix: near-dup pair counts aggregated by
    (source, source) — the diagnostic that tells a curation team
    WHICH feeds mirror each other (two crawls of the same site, a
    dataset republished inside another) before they pay for
    full dedup between them. Pairs come from the shared capped
    inverted-index core; the doc→source labeling is two joins against
    the (doc_id, source) projection, then a symmetric (least,
    greatest) rollup so A→B and B→A land in one cell. Output is
    #sources² cells regardless of corpus size."""
    from hdsp_hive_release_src_spark.queries.llm import (
        MAX_SHINGLE_DF,
        _parallel_docs,
        shingle_pair_counts,
    )

    d = _parallel_docs(spark, sf_dir)
    pairs = shingle_pair_counts(d, MAX_SHINGLE_DF)
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    near = pairs.where(jac >= 0.5).select("d1", "d2")
    src = d.select("doc_id", "source")
    lab = (
        near.join(
            src.select(
                F.col("doc_id").alias("d1"), F.col("source").alias("s1")
            ),
            "d1",
        )
        .join(
            src.select(
                F.col("doc_id").alias("d2"), F.col("source").alias("s2")
            ),
            "d2",
        )
    )
    return (
        lab.groupBy(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@query(
    "phrase_mining_pmi",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS ws
      FROM documents),
    uni AS (
      SELECT unnest(ws) AS w FROM tok),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    utot AS (SELECT sum(c) AS n FROM ucnt),
    bi AS (
      SELECT unnest(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1])) AS b
      FROM tok WHERE len(ws) >= 2),
    bcnt AS (SELECT b, count(*) AS c FROM bi GROUP BY b),
    btot AS (SELECT sum(c) AS n FROM bcnt),
    pmi AS (
      SELECT bcnt.b AS bigram, bcnt.c AS n_occurrences,
             round(ln((bcnt.c * 1.0 / btot.n)
                   / ((u1.c * 1.0 / utot.n) * (u2.c * 1.0 / utot.n))),
                   4) AS pmi
      FROM bcnt CROSS JOIN btot CROSS JOIN utot
      JOIN ucnt u1 ON u1.w = string_split(bcnt.b, ' ')[1]
      JOIN ucnt u2 ON u2.w = string_split(bcnt.b, ' ')[2]
      WHERE bcnt.c >= 5)
    SELECT bigram, CAST(n_occurrences AS BIGINT) AS n_occurrences, pmi
    FROM pmi
    ORDER BY pmi DESC, bigram LIMIT 25
    """,
)
def phrase_mining_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: bigrams
    whose joint frequency beats the independence expectation
    (log p(ab)/(p(a)p(b))) — how a pipeline discovers multi-word
    units ("new york", "machine learning") worth treating as single
    tokens before vocabulary building. Two aggregation passes (unigram
    and bigram counts), totals broadcast into the scoring join; the
    df≥5 support floor keeps one-off co-occurrences from dominating
    (a raw PMI list is all hapax pairs — the floor is the standard
    fix). The top-25 global rank runs over the tiny scored bigram
    vocabulary, never the corpus."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select(F.expr(_TOKS).alias("ws"))
    uni = tok.select(F.explode("ws").alias("w"))
    # r12 scan-count fix: the totals and the two scoring joins re-ran
    # the unigram/bigram aggregations from parquet (5 corpus scans
    # measured); both vocab-sized count tables are checkpointed —
    # two corpus scans total (one per n-gram order, the documented
    # "two aggregation passes")
    ucnt = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    utot = ucnt.agg(F.sum("c").alias("un"))
    bi = tok.where(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat_ws(' ', element_at(ws, i),"
                " element_at(ws, i + 1)))"
            )
        ).alias("b")
    )
    bcnt = (
        bi.groupBy("b")
        .agg(F.count(F.lit(1)).alias("bc"))
        .localCheckpoint()
    )
    btot = bcnt.agg(F.sum("bc").alias("bn"))
    w1 = F.split("b", " ").getItem(0)
    w2 = F.split("b", " ").getItem(1)
    scored = (
        bcnt.where(F.col("bc") >= 5)
        .withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(
            B(ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            B(ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
        .join(B(btot))
        .join(B(utot))
        .select(
            F.col("b").alias("bigram"),
            F.col("bc").cast("long").alias("n_occurrences"),
            F.round(
                F.log(
                    (F.col("bc") / F.col("bn"))
                    / (
                        (F.col("c1") / F.col("un"))
                        * (F.col("c2") / F.col("un"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "bigram").limit(25)


@query(
    "vocab_coverage_audit",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
          AS w
      FROM documents),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    vocab AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rnk
        FROM cnt) WHERE rnk <= 500),
    tot AS (SELECT sum(c) AS n FROM cnt),
    cov AS (SELECT sum(c) AS n FROM cnt JOIN vocab USING (w))
    SELECT CAST(500 AS BIGINT) AS vocab_size,
           CAST(tot.n AS BIGINT) AS total_tokens,
           CAST(cov.n AS BIGINT) AS covered_tokens,
           round(cov.n * 1.0 / tot.n, 6) AS coverage,
           round(1.0 - cov.n * 1.0 / tot.n, 6) AS oov_rate
    FROM tot, cov
    """,
)
def vocab_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV-rate audit: what fraction of corpus
    token OCCURRENCES the top-500 vocabulary covers — the
    go/no-go check after tokenizer_vocab_build and before committing
    a vocab size (training with a high OOV rate wastes capacity on
    <unk>). One token-count aggregation; the vocab is a top-K rank
    over the token VOCABULARY (not the corpus), ties pinned by token
    text; coverage is a broadcast semi-join of counts against the
    500-row vocab. At 100 TB the count table is the only shuffle and
    it's map-side combined."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select(F.explode(F.expr(_TOKS)).alias("w"))
    # r12 scan-count fix: vocab/total/coverage all derive from the
    # token-count table and each re-ran the corpus explode (3 scans
    # measured); one vocab-sized checkpoint
    cnt = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    w_rank = Window.orderBy(F.desc("c"), "w")
    vocab = (
        cnt.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= 500)
        .select("w")
    )
    tot = cnt.agg(F.sum("c").alias("tn"))
    cov = cnt.join(B(vocab), "w").agg(F.sum("c").alias("cn"))
    return (
        tot.join(B(cov))
        .select(
            F.lit(500).cast("long").alias("vocab_size"),
            F.col("tn").cast("long").alias("total_tokens"),
            F.col("cn").cast("long").alias("covered_tokens"),
            F.round(F.col("cn") / F.col("tn"), 6).alias("coverage"),
            F.round(1.0 - F.col("cn") / F.col("tn"), 6).alias(
                "oov_rate"
            ),
        )
    )


@query(
    "embedding_norm_outliers",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    st AS (SELECT avg(nrm) AS mu, stddev_samp(nrm) AS sd FROM n)
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(max(st.mu), 6) AS mean_norm,
           round(max(st.sd), 6) AS std_norm,
           CAST(sum(CASE WHEN abs(n.nrm - st.mu) > 3 * st.sd
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN n.nrm < 1e-6 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero
    FROM n CROSS JOIN st
    """,
)
def embedding_norm_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-health audit: the L2-norm distribution's 3σ outliers
    and near-zero vectors — the two signatures of a broken embedding
    job (truncated inference → zeros; fp overflow / unnormalized
    mixes → huge norms). Cosine-based downstream ops silently degrade
    on both, so this gate runs before any ANN/dedup stage. One scan
    computes norms; the 1-row (μ, σ) aggregate broadcasts back for
    the outlier count — two passes, no shuffle of the vectors
    themselves."""
    e = Catalog(spark, sf_dir).embeddings
    from hdsp_hive_release_src_spark.functions.vectors import (
        l2_norm,
        to_double,
    )

    n = e.select(
        "vec_id", l2_norm(to_double("embedding")).alias("nrm")
    )
    st = n.agg(
        F.avg("nrm").alias("mu"), F.stddev_samp("nrm").alias("sd")
    )
    return (
        n.join(B(st))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.max("mu"), 6).alias("mean_norm"),
            F.round(F.max("sd"), 6).alias("std_norm"),
            F.sum(
                (F.abs(F.col("nrm") - F.col("mu")) > 3 * F.col("sd"))
                .cast("int")
            )
            .cast("long")
            .alias("n_outliers"),
            F.sum((F.col("nrm") < 1e-6).cast("int"))
            .cast("long")
            .alias("n_zero"),
        )
    )


@query(
    "stratified_eval_split",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                       < 13 THEN 'train'
                  WHEN strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                       < 14 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT lang, split, count(*) AS n
    FROM assigned GROUP BY lang, split ORDER BY lang, split
    """,
)
def stratified_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~81/6/13 via the first
    md5 nibble of the doc id: 0-12 train, 13 val, 14-15 test) with a
    per-language occupancy report — the split every training run
    freezes BEFORE any filtering so later pipeline changes can never
    leak eval docs into train (hash-of-id is stable across reruns and
    engines, unlike rand() or row position). Map-only assignment, one
    (lang, split) aggregation."""
    d = Catalog(spark, sf_dir).documents
    nib = (
        F.expr(
            "instr('0123456789abcdef',"
            " substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1"
        )
    )
    split = (
        F.when(nib < 13, "train").when(nib < 14, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "split")
    )


def _novelty_oracle() -> str:
    from hdsp_hive_release_src_spark.queries.llm import _DUCK_SHINGLES

    return f"""
    WITH {_DUCK_SHINGLES},
    df AS (SELECT g, count(*) AS c FROM sh GROUP BY g),
    tagged AS (
      SELECT sh.doc_id,
             CASE WHEN df.c = 1 THEN 1 ELSE 0 END AS uniq
      FROM sh JOIN df ON sh.g = df.g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           round(sum(uniq) * 1.0 / count(*), 6) AS novelty
    FROM tagged GROUP BY doc_id ORDER BY doc_id
    """


@query("ngram_novelty_score", oracle=_novelty_oracle())
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty: the fraction of a document's word-trigrams that
    appear NOWHERE else in the corpus (df = 1) — high novelty marks
    genuinely fresh content, near-zero marks boilerplate assembled
    from corpus-common phrases; as the complement of memorization
    overlap it's also the cheap proxy for "will this doc add anything
    the model hasn't seen". Same distinct-shingle index the dedup
    family builds (df counts are a byproduct of the postings
    aggregation at scale — one shuffle on the shingle, one on
    doc_id). Documents with no trigrams (< 3 words) are absent from
    the output by construction in both engines."""
    from hdsp_hive_release_src_spark.functions.hashing import (
        word_shingles,
    )
    from hdsp_hive_release_src_spark.queries.llm import _parallel_docs

    d = _parallel_docs(spark, sf_dir)
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("text"))).alias("g"),
    )
    df = sh.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    return (
        sh.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.round(
                F.sum((F.col("c") == 1).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def _threshold_sweep_oracle() -> str:
    from hdsp_hive_release_src_spark.queries.llm import (
        _DUCK_SH_CAPPED,
        _DUCK_SHINGLES,
    )

    return f"""
    WITH {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT inter * 1.0 / (s1.n + s2.n - inter) AS j
      FROM pairs JOIN sz s1 ON d1 = s1.doc_id
                 JOIN sz s2 ON d2 = s2.doc_id)
    SELECT CAST(b AS DOUBLE) / 10 AS threshold,
           CAST(sum(CASE WHEN j >= b * 1.0 / 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs_at_or_above
    FROM jac CROSS JOIN range(1, 10) t(b)
    GROUP BY b ORDER BY threshold
    """


@query("dedup_threshold_sweep", oracle=_threshold_sweep_oracle())
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard threshold-sensitivity sweep: candidate-pair counts at
    every τ from 0.1 to 0.9 IN ONE PASS over the pair set — the curve
    a curation team reads to pick τ (a cliff between two thresholds
    marks the near-dup/unrelated similarity gap; a smooth slope means
    no safe cutoff exists and pairwise dedup needs a different
    signal). Costs exactly one extra 9-way conditional aggregation on
    top of the pair generation every dedup run already does — the
    reason to sweep inline instead of re-running dedup per τ."""
    from hdsp_hive_release_src_spark.queries.llm import (
        MAX_SHINGLE_DF,
        _parallel_docs,
        shingle_pair_counts,
    )

    pairs = shingle_pair_counts(
        _parallel_docs(spark, sf_dir), MAX_SHINGLE_DF
    )
    jac = (
        F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    ).alias("j")
    j = pairs.select(jac)
    return (
        j.crossJoin(
            spark.range(1, 10).select(F.col("id").alias("b"))
        )
        .groupBy("b")
        .agg(
            F.sum(
                (F.col("j") >= F.col("b") / 10.0).cast("int")
            )
            .cast("long")
            .alias("n_pairs_at_or_above")
        )
        .select(
            (F.col("b").cast("double") / 10).alias("threshold"),
            "n_pairs_at_or_above",
        )
        .orderBy("threshold")
    )
