"""SURVEY.md §2.4 continued — LLM-training-data pipeline, fifth wave:
an actual statistical language-model quality scorer (bigram LM with
add-one smoothing, trained on a reference shard) and distribution-
drift detection (KL divergence per source vs the corpus mix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

_REF_SOURCE = "src0"  # LM training shard

_DUCK_BIGRAMS = """
    toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents),
    bigrams AS (
      SELECT doc_id, source, ws[i] AS w1, ws[i + 1] AS w2
      FROM toks, unnest(range(1, len(ws))) AS u(i))
"""


@query(
    "bigram_lm_score",
    oracle=f"""
    WITH {_DUCK_BIGRAMS},
    bg AS (
      SELECT w1, w2, count(*) AS c2 FROM bigrams
      WHERE source = '{_REF_SOURCE}' GROUP BY w1, w2),
    ug AS (
      SELECT w1, count(*) AS c1 FROM bigrams
      WHERE source = '{_REF_SOURCE}' GROUP BY w1),
    v AS (SELECT count(DISTINCT w2) AS vocab FROM bigrams
          WHERE source = '{_REF_SOURCE}'),
    scored AS (
      SELECT b.doc_id,
             ln((coalesce(bg.c2, 0) + 1.0)
                / (coalesce(ug.c1, 0) + vocab)) AS lp
      FROM bigrams b
      LEFT JOIN bg ON b.w1 = bg.w1 AND b.w2 = bg.w2
      LEFT JOIN ug ON b.w1 = ug.w1
      CROSS JOIN v
      WHERE b.source <> '{_REF_SOURCE}')
    SELECT doc_id, round(avg(lp), 6) AS avg_logprob,
           CAST(count(*) AS BIGINT) AS n_bigrams
    FROM scored GROUP BY doc_id
    ORDER BY avg_logprob DESC, doc_id LIMIT 100
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL statistical LM quality scorer — not a stub: a bigram
    model with add-one smoothing is trained on the reference shard
    (src0) and every other doc is scored by its average bigram
    log-probability, the classic perplexity-based quality filter
    (docs unlike the reference distribution score low and get cut).
    The model tables are aggregation outputs (vocab-sized, broadcast
    into the scoring join); scoring is one pass over exploded bigrams.
    Fully deterministic → full oracle, top-100 by fluency."""
    d = Catalog(spark, sf_dir).documents
    ws = F.split("text", " ")
    bigrams = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                "zip_with(slice(split(text, ' '), 1, "
                "greatest(size(split(text, ' ')) - 1, 0)), "
                "slice(split(text, ' '), 2, "
                "greatest(size(split(text, ' ')) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("i", "bg"),
    ).select("doc_id", "source", "bg.w1", "bg.w2")
    # r12 scan-count fix: the three model tables (bigram counts,
    # unigram counts, vocab size) each re-ran the corpus explode;
    # checkpoint the shard-sized reference bigrams once — model build
    # is one scan, scoring the other
    ref = bigrams.where(
        F.col("source") == _REF_SOURCE
    ).localCheckpoint()
    bg = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ug = ref.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = ref.agg(F.count_distinct("w2").alias("vocab"))
    scored = (
        bigrams.where(F.col("source") != _REF_SOURCE)
        .join(F.broadcast(bg), ["w1", "w2"], "left")
        .join(F.broadcast(ug), ["w1"], "left")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vocab"))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .orderBy(F.desc("avg_logprob"), "doc_id")
        .limit(100)
    )


@query(
    "kl_divergence_drift",
    oracle="""
    WITH wc AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents),
    per_source AS (
      SELECT source, w, count(*) AS c FROM wc GROUP BY source, w),
    source_tot AS (
      SELECT source, sum(c) AS tot FROM per_source GROUP BY source),
    corpus AS (
      SELECT w, sum(c) AS cc FROM per_source GROUP BY w),
    corpus_tot AS (SELECT sum(cc) AS ctot FROM corpus)
    SELECT p.source,
           round(sum((p.c * 1.0 / st.tot)
                 * ln((p.c * 1.0 / st.tot)
                      / (co.cc * 1.0 / ct.ctot))), 6) AS kl_nats,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM per_source p
    JOIN source_tot st ON p.source = st.source
    JOIN corpus co ON p.w = co.w
    CROSS JOIN corpus_tot ct
    GROUP BY p.source ORDER BY p.source
    """,
)
def kl_divergence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift: KL divergence of each source's word
    distribution from the corpus-wide distribution — the per-shard
    drift score a mixture monitor alarms on (a source whose KL jumps
    changed its content). KL(p_source || p_corpus) is finite by
    construction (every source term exists in the corpus). Two
    aggregations over the exploded words + a broadcast of the
    (vocab-sized) corpus distribution."""
    d = Catalog(spark, sf_dir).documents
    wc = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    # r12 scan-count re-plan: corpus and corpus_tot derive from the
    # (source, word) count table and each re-executed the tokenize
    # pipeline (THREE corpus scans measured). Checkpointing the TF
    # table makes the query one corpus scan (the jsd twin got the
    # identical fix); values are unchanged, only lineage.
    per_source = (
        wc.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    w_tot = Window.partitionBy("source")
    # r13 subtree-sweep fix: `corpus` feeds both the broadcast into
    # the enriched join and the corpus total, so the vocab aggregate
    # over the (large) TF checkpoint executed twice. The corpus table
    # is vocab-sized — checkpoint it once; ctot reads the checkpoint.
    corpus = (
        per_source.groupBy("w")
        .agg(F.sum("c").alias("cc"))
        .localCheckpoint()
    )
    corpus_tot = corpus.agg(F.sum("cc").alias("ctot"))
    enriched = (
        per_source.withColumn("tot", F.sum("c").over(w_tot))
        .join(F.broadcast(corpus), "w")
        .join(F.broadcast(corpus_tot))
    )
    p = F.col("c") / F.col("tot")
    q = F.col("cc") / F.col("ctot")
    return (
        enriched.groupBy("source")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_nats"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy("source")
    )
