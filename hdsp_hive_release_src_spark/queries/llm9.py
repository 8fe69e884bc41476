"""SURVEY.md §2.4 round-6 additions: two-pass exact heavy hitters
(the vocabulary-scale frequent-items operator), crawl-style URL
canonicalization dedup, and the MinHash estimate-accuracy contract
(the number LSH banding recall claims rest on)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.functions.hashing import (
    minhash_sql,
    word_shingles_sql,
)
from hdsp_hive_release_src_spark.operators.sketches import heavy_hitters
from hdsp_hive_release_src_spark.registry import query

# heavy-hitter threshold as an exact rational: frequency > N / HH_DEN.
# The comparison runs as integer arithmetic (n * HH_DEN > N) in BOTH
# engines — a float eps * N threshold can land within an ulp of an
# integer and flip the boundary item between engines.
HH_DEN = 50  # ε = 2%


@query(
    "heavy_hitters_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '),
             x -> x <> '')) AS t
      FROM documents),
    tot AS (SELECT count(*) AS tn FROM tok)
    SELECT t AS item, count(*) AS n,
           round(count(*) / tot.tn, 6) AS frac
    FROM tok CROSS JOIN tot
    GROUP BY t, tot.tn
    HAVING count(*) * {HH_DEN} > tot.tn
    ORDER BY n DESC, item
    """,
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tokens exceeding 2% of the corpus via two-pass
    distributed Misra-Gries (operators/sketches.py): pass 1 keeps an
    O(1/ε) summary per partition (no shuffle — the pigeonhole
    guarantee makes the candidate union a superset of every true
    heavy hitter), pass 2 exactly recounts ONLY the broadcast
    candidate set. The shuffle carries candidates, never the
    vocabulary — the reason this completes on a 100 TB corpus where
    a full-vocab groupBy-then-filter shuffles billions of keys to
    answer with fifty. Output is exact and partition-layout
    independent (fuzz-covered); the oracle computes the same answer
    the expensive way."""
    return heavy_hitters_tokens_with_den(spark, sf_dir, HH_DEN)


def heavy_hitters_tokens_with_den(
    spark: SparkSession, sf_dir: str, den: int
) -> DataFrame:
    """The heavy_hitters_topk plan with a caller-chosen exact-rational
    threshold (frequency > N/den). The bench's 10× stress tier uses
    den=400 (ε = 0.25%): make_stress keeps replica 0's text verbatim
    and suffixes replicas 1-9, so every token variant lands at
    base_frac/10 ≈ 0.34% max — below the production 2% ε, which made
    the r8 stress datapoint return 0 rows and leave the candidate
    recount path unmeasured. Same two-pass MG plan, only the summary
    size (O(den) per partition) changes."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("t")
    )
    hh = heavy_hitters(tok, "t", den=den)
    return hh.select(
        F.col("item"), F.col("n"), F.col("frac")
    ).orderBy(F.desc("n"), "item")


_URL_ORACLE = """
    WITH u AS (
      SELECT doc_id,
             CASE (doc_id // 40) % 4
               WHEN 0 THEN 'https://www.site' || (doc_id % 40)
                    || '.example.com/docs/' || (doc_id % 5)
               WHEN 1 THEN 'HTTPS://WWW.SITE' || (doc_id % 40)
                    || '.EXAMPLE.COM:443/docs/' || (doc_id % 5)
                    || '#top'
               WHEN 2 THEN 'https://www.site' || (doc_id % 40)
                    || '.example.com/docs/' || (doc_id % 5)
                    || '?utm_source=feed&utm_campaign=x'
               ELSE 'https://www.site' || (doc_id % 40)
                    || '.example.com:443/docs/' || (doc_id % 5)
                    || '?id=' || (doc_id % 5) || '&utm_medium=m#frag'
             END AS raw
      FROM documents),
    s1 AS (SELECT doc_id, regexp_replace(raw, '#.*', '') AS x FROM u),
    s2 AS (
      SELECT doc_id,
             lower(regexp_extract(x, '^[A-Za-z]+://[^/?#]+'))
             || substr(x,
                  length(regexp_extract(x, '^[A-Za-z]+://[^/?#]+')) + 1)
                 AS x
      FROM s1),
    s3 AS (SELECT doc_id,
                  regexp_replace(x, '^([a-z]+://[^/:?#]+):443([/?#]|$)',
                                 '\\1\\2') AS x
           FROM s2),
    s4 AS (SELECT doc_id,
                  regexp_replace(x, 'utm_[a-z]+=[^&#]*&?', '', 'g') AS x
           FROM s3),
    canon AS (SELECT doc_id,
                     regexp_replace(x, '[?&]+$', '') AS canonical_url
              FROM s4)
    SELECT canonical_url,
           count(*) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon GROUP BY canonical_url ORDER BY canonical_url
"""


@query("url_canonical_dedup", oracle=_URL_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-pipeline URL canonicalization + dedup: fragments dropped,
    scheme/host lowercased, default port stripped, utm_* tracking
    params removed, dangling separators cleaned — then one
    hash-groupBy on the canonical form keeps the lowest doc_id per
    group. Messy variants are constructed deterministically from
    doc_id (four variant shapes per canonical target) so the oracle
    replays both the construction and every normalization step;
    parity proves each rule, not just the happy path. Scale shape:
    pure map-side string expressions + one exact-dedup shuffle on the
    canonical key — the same O(corpus) cost as `dedup_exact`."""
    d = Catalog(spark, sf_dir).documents
    g = (F.col("doc_id") % 40).cast("string")
    p = (F.col("doc_id") % 5).cast("string")
    raw = (
        F.when(
            F.expr("(doc_id div 40) % 4") == 0,
            F.concat(F.lit("https://www.site"), g,
                     F.lit(".example.com/docs/"), p),
        )
        .when(
            F.expr("(doc_id div 40) % 4") == 1,
            F.concat(F.lit("HTTPS://WWW.SITE"), g,
                     F.lit(".EXAMPLE.COM:443/docs/"), p, F.lit("#top")),
        )
        .when(
            F.expr("(doc_id div 40) % 4") == 2,
            F.concat(F.lit("https://www.site"), g,
                     F.lit(".example.com/docs/"), p,
                     F.lit("?utm_source=feed&utm_campaign=x")),
        )
        .otherwise(
            F.concat(F.lit("https://www.site"), g,
                     F.lit(".example.com:443/docs/"), p,
                     F.lit("?id="), p, F.lit("&utm_medium=m#frag")),
        )
    )
    x = F.regexp_replace(raw, "#.*", "")
    auth = F.regexp_extract(x, "^[A-Za-z]+://[^/?#]+", 0)
    x = F.concat(
        F.lower(auth), F.substring(x, F.length(auth) + 1, 1_000_000)
    )
    # port strip anchored to the authority component: a ':443/'
    # appearing later in the path or query must survive
    x = F.regexp_replace(
        x, "^([a-z]+://[^/:?#]+):443([/?#]|$)", "$1$2"
    )
    x = F.regexp_replace(x, "utm_[a-z]+=[^&#]*&?", "")
    canonical = F.regexp_replace(x, "[?&]+$", "")
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .orderBy("canonical_url")
    )


def _mh_est_oracle() -> str:
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
           round(inter * 1.0 / (s1.n + s2.n - inter), 6) AS jaccard,
           TRUE AS est_within_band
    FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
    WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5
    ORDER BY d1, d2
    """


@query("minhash_estimate_accuracy", oracle=_mh_est_oracle())
def minhash_estimate_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sketch-accuracy contract behind `dedup_minhash_lsh`: for
    every true near-dup pair (exact Jaccard >= 0.5), the 64-slot
    MinHash signature agreement fraction must sit within 0.15 of the
    exact Jaccard (measured max deviation 0.055 on this corpus; the
    binomial sd at J=0.5 with k=64 is 0.0625, so 0.15 ~ 2.4 sigma —
    and the hashes are FIXED seeds, so the booleans are
    deterministic, not a sampling gamble). Same tolerance-oracle
    shape as approx_distinct: the signature values are
    engine-hash-defined (xxhash64 has no DuckDB twin), so the oracle
    pins the exact pair set + exact Jaccard and a literal TRUE, while
    Spark carries the actual |estimate - exact| <= 0.15 check. This
    is the number that justifies banding thresholds at 100 TB — if
    signature agreement drifted from true similarity, every LSH
    recall claim would be fiction."""
    from hdsp_hive_release_src_spark.queries.llm import (
        _parallel_docs,
        shingle_pair_counts,
    )

    d = _parallel_docs(spark, sf_dir)
    pairs = shingle_pair_counts(d, 1000)
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    p = pairs.where(jac >= 0.5).select(
        "d1", "d2", F.round(jac, 6).alias("jaccard")
    )
    # r12 scan-count fix: both pair sides read the signature table —
    # checkpoint it once (the production persisted-signatures shape)
    sig = d.select(
        "doc_id",
        F.expr(minhash_sql(word_shingles_sql("text"), 64)).alias("sig"),
    ).localCheckpoint()
    s1 = sig.select(F.col("doc_id").alias("d1"),
                    F.col("sig").alias("sig1"))
    s2 = sig.select(F.col("doc_id").alias("d2"),
                    F.col("sig").alias("sig2"))
    matches = F.expr(
        "aggregate(zip_with(sig1, sig2, (a, b) -> IF(a = b, 1, 0)),"
        " 0, (acc, x) -> acc + x)"
    )
    return (
        p.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "jaccard",
            (F.abs(matches / 64.0 - F.col("jaccard")) <= 0.15).alias(
                "est_within_band"
            ),
        )
        .orderBy("d1", "d2")
    )


def _u_from_md5_spark() -> str:
    """Deterministic uniform in (0,1): the first 12 md5 nibbles of the
    doc id as an exact integer over 16^12 (nibble-by-nibble instr
    arithmetic — both engines reproduce the integer exactly)."""
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(h, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"(({terms}) + 1) / CAST({16 ** 12} AS DOUBLE)"


def _u_from_md5_duck() -> str:
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"(({terms}) + 1) / CAST({16 ** 12} AS DOUBLE)"


@query(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    raced AS (
      SELECT doc_id, n_chars,
             round(-ln({_u_from_md5_duck()}) / n_chars, 9) AS r
      FROM keyed),
    sample AS (SELECT * FROM raced ORDER BY r, doc_id LIMIT 100)
    SELECT count(*) AS k,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(n_chars) AS BIGINT) AS weight_sum,
           round(min(r), 9) AS r_lo, round(max(r), 9) AS r_hi
    FROM sample
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis
    A-ExpJ form: each doc races with an exponential clock
    r = -ln(u)/w (w = n_chars as the quality weight; u a
    deterministic md5-derived uniform, exactly reproducible in both
    engines) and the k smallest r win — inclusion probability
    proportional to weight, the quality-weighted corpus cut an LLM
    pipeline uses to tilt sampling toward high-value documents while
    staying reproducible run to run. Scale shape: map-only key
    computation + ORDER BY r LIMIT k = TakeOrderedAndProject
    (per-partition heap, O(k) memory, no global sort) — identical
    cost to `fixed_size_hash_sample`, which is this operator with
    all weights equal. r is quantized to 9 decimals before the
    cutoff so a 1-ulp libm ln() divergence cannot reorder the
    boundary (gaps between adjacent order statistics are ~1e-5;
    deterministic tie-break on doc_id)."""
    d = Catalog(spark, sf_dir).documents
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    raced = keyed.select(
        "doc_id",
        "n_chars",
        F.round(
            -F.log(F.expr(_u_from_md5_spark())) / F.col("n_chars"), 9
        ).alias("r"),
    )
    sample = raced.orderBy("r", "doc_id").limit(100)
    return sample.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_chars").cast("long").alias("weight_sum"),
        F.round(F.min("r"), 9).alias("r_lo"),
        F.round(F.max("r"), 9).alias("r_hi"),
    )


# Minimum pair support. 5 is deliberately scale-aware: at the sf0.01
# correctness gate the pair-support distribution tops out below 10
# (357 pairs at >= 5, zero at >= 10), so a higher floor would make the
# oracle verify the empty set and prove nothing about the pair core.
# tests/test_nonvacuous.py asserts non-empty output at gate scale.
COOCCURRENCE_MIN_SUPPORT = 5


@query(
    "item_cooccurrence_support",
    oracle=f"""
    WITH it AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events WHERE event_type = 'purchase'),
    keep AS (
      SELECT user_id FROM it GROUP BY user_id
      HAVING count(*) BETWEEN 2 AND 200),
    basket AS (SELECT it.user_id, it.item FROM it
               JOIN keep USING (user_id))
    SELECT a.item AS i1, b.item AS i2, count(*) AS support
    FROM basket a JOIN basket b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING count(*) >= {COOCCURRENCE_MIN_SUPPORT}
    ORDER BY i1, i2
    """,
)
def item_cooccurrence_support(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Market-basket co-occurrence (the first stage of every
    association-rule / item-item recommender): items bought together
    by the same user, with minimum support. Items come from the
    event payload (props.k). Pair generation reuses the bounded
    sorted-postings core (llm.py): per-user baskets are collected
    SORTED with the spillable pre-collect size filter (2 ≤ basket ≤
    200 — a bot account with thousands of items would otherwise
    contribute quadratically), then pairs emit via posexplode+slice
    — no basket self-join, one scan. The oracle computes the naive
    self-join form with the identical basket cap, so parity proves
    the postings rewrite exact. Support/thresholds are integers."""
    from hdsp_hive_release_src_spark.queries.llm import (
        bounded_sorted_postings,
    )

    ev = Catalog(spark, sf_dir).events
    it = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .distinct()
    )
    baskets = bounded_sorted_postings(
        it, ["user_id"], F.col("item"), min_df=2, max_df=200
    )
    pairs = (
        baskets.select(F.posexplode("ds").alias("i", "i1"), "ds")
        .select(
            "i1",
            F.explode(
                F.slice("ds", F.col("i") + 2, F.size("ds"))
            ).alias("i2"),
        )
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= COOCCURRENCE_MIN_SUPPORT)
        .orderBy("i1", "i2")
    )
    return pairs


def _langid_confusion_oracle() -> str:
    from hdsp_hive_release_src_spark.functions.text import (
        LANG_STOPWORDS,
        sql_in_list,
    )
    from hdsp_hive_release_src_spark.queries.llm import _langid_case_sql

    pred = _langid_case_sql(
        {
            lang: f"len(list_filter(ws, t -> t IN ({sql_in_list(ws_)})))"
            for lang, ws_ in LANG_STOPWORDS.items()
        }
    )
    return f"""
    WITH scored AS (
      SELECT lang AS true_lang, {pred} AS pred_lang
      FROM (SELECT lang, string_split(text, ' ') AS ws
            FROM documents)),
    cm AS (
      SELECT true_lang, pred_lang, count(*) AS n
      FROM scored GROUP BY 1, 2),
    tot AS (SELECT true_lang, sum(n) AS t FROM cm GROUP BY 1)
    SELECT cm.true_lang, cm.pred_lang, cm.n,
           round(cm.n * 1.0 / tot.t, 6) AS recall_share,
           (cm.true_lang = cm.pred_lang) AS is_correct
    FROM cm JOIN tot ON cm.true_lang = tot.true_lang
    ORDER BY cm.true_lang, cm.pred_lang
    """


@query("langid_confusion_matrix", oracle=_langid_confusion_oracle())
def langid_confusion_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classifier evaluation as a first-class pipeline query: the
    language-ID heuristic (text_langid's stopword argmax) scored
    against the labeled `lang` column as a full confusion matrix —
    per (true, predicted) cell counts, per-true-label recall share,
    and the diagonal flag. This is the quality gate a real curation
    pipeline runs before trusting a cheap classifier to route
    millions of documents; evaluating IN the engine (one scan + one
    tiny aggregate) beats exporting samples to a notebook. The
    recall share is one exact-count division per cell."""
    from hdsp_hive_release_src_spark.functions.text import (
        LANG_STOPWORDS,
        stopword_hits,
    )
    from hdsp_hive_release_src_spark.queries.llm import _langid_case_sql

    d = Catalog(spark, sf_dir).documents
    hit_exprs = {
        lang: stopword_hits("split(text, ' ')", words)
        for lang, words in LANG_STOPWORDS.items()
    }
    scored = d.select(
        F.col("lang").alias("true_lang"),
        F.expr(_langid_case_sql(hit_exprs)).alias("pred_lang"),
    )
    cm = scored.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    wt = Window.partitionBy("true_lang")
    return (
        cm.withColumn(
            "recall_share", F.round(F.col("n") / F.sum("n").over(wt), 6)
        )
        .withColumn(
            "is_correct", F.col("true_lang") == F.col("pred_lang")
        )
        .orderBy("true_lang", "pred_lang")
    )
