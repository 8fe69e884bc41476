"""SURVEY.md §2.4 round-6 additions: two-pass exact heavy hitters
(the vocabulary-scale frequent-items operator) and crawl-style URL
canonicalization dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
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
    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("t")
    )
    hh = heavy_hitters(tok, "t", den=HH_DEN)
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
    s3 AS (SELECT doc_id, replace(x, ':443/', '/') AS x FROM s2),
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
    x = F.replace(x, F.lit(":443/"), F.lit("/"))
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
