"""SURVEY.md §2.4 continued — LLM-training-data pipeline, third wave:
benchmark decontamination (n-gram overlap against a held-out eval
set), duplicate-cluster resolution (keep the best doc per near-dup
component), and the deterministic shard manifest a training-data
export writes.

Scale shapes: decontamination is an inverted-index semi-join (the eval
gram set is tiny and broadcasts — never a doc×doc comparison);
keep-best reuses the component labels and resolves with one max_by
aggregation; the shard manifest is a map-only hash classify + one
aggregation shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.functions.hashing import word_shingles_sql
from hdsp_hive_release_src_spark.queries.llm import (
    _DUCK_SH_CAPPED,
    _DUCK_SHINGLES,
    _parallel_docs,
)
from hdsp_hive_release_src_spark.queries.llm2 import (
    near_dup_component_labels,
)
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_EVAL_SOURCE = "src0"  # the held-out "benchmark" shard

# DuckDB 8-gram CTE (distinct per doc, mirroring word_shingles n=8)
_DUCK_G8 = """
    g8 AS (
      SELECT doc_id, source, unnest(grams) AS g FROM (
        SELECT doc_id, source,
               CASE WHEN len(ws) < 8 THEN []
                    ELSE list_distinct(list_transform(
                         range(1, len(ws) - 6),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                           || ' ' || ws[i+3] || ' ' || ws[i+4] || ' '
                           || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]))
               END AS grams
        FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
              FROM documents))
    )
"""


@query(
    "decontaminate_ngrams",
    oracle=f"""
    WITH {_DUCK_G8},
    eg AS (SELECT DISTINCT g FROM g8 WHERE source = '{_EVAL_SOURCE}'),
    hit AS (SELECT DISTINCT doc_id FROM g8
            WHERE source <> '{_EVAL_SOURCE}'
              AND g IN (SELECT g FROM eg))
    SELECT source, count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE doc_id IN
                (SELECT doc_id FROM hit)) AS BIGINT) AS n_contaminated,
           round(count(*) FILTER (WHERE doc_id IN
                (SELECT doc_id FROM hit)) * 1.0 / count(*), 4)
               AS contamination_rate
    FROM documents WHERE source <> '{_EVAL_SOURCE}'
    GROUP BY source ORDER BY source
    """,
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: a training doc is contaminated if it
    shares ANY 8-gram with the held-out eval shard. The eval gram set
    (distinct 8-grams of one small shard) broadcasts into a left_semi
    join against the training-side inverted index — cost is one scan of
    the corpus grams, never doc×doc. 8-byte xxhash64 gram keys keep the
    Spark-side index compact (cf. _jaccard_pairs_exact); the oracle
    compares raw gram strings, proving the hashed path loses nothing.
    """
    d = _parallel_docs(spark, sf_dir)
    grams8 = (
        f"transform({word_shingles_sql('text', 8)}, g -> xxhash64(g))"
    )
    g = d.select(
        "doc_id", "source", F.explode(F.expr(grams8)).alias("g")
    )
    eval_g = (
        g.where(F.col("source") == _EVAL_SOURCE).select("g").distinct()
    )
    hits = (
        g.where(F.col("source") != _EVAL_SOURCE)
        .join(B(eval_g), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        d.where(F.col("source") != _EVAL_SOURCE)
        .join(B(hits), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("hit").isNotNull())
            .cast("long")
            .alias("n_contaminated"),
            F.round(
                F.count_if(F.col("hit").isNotNull())
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    jpairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT d1, d2 FROM jpairs
      JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5),
    edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
              UNION ALL SELECT d2, d1 FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    sel AS (SELECT c.id, c.component, d.n_chars
            FROM comp c JOIN documents d ON c.id = d.doc_id),
    ranked AS (
      SELECT id, component,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, id) AS rn
      FROM sel)
    SELECT s.component,
           CAST(count(*) AS BIGINT) AS n_members,
           max(CASE WHEN r.rn = 1 THEN r.id END) AS keeper_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM sel s JOIN ranked r ON s.id = r.id
    GROUP BY s.component ORDER BY s.component
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster RESOLUTION — the step after clustering: per
    near-dup component keep the 'best' doc (longest text, ties to the
    lowest doc_id) and count the drops. Reuses the component labels
    (iterative min-label propagation, llm2.py) joined to doc metadata,
    then ONE max_by aggregation per component — no window over the
    corpus. This emits the keeper manifest a curation pipeline applies
    as its final anti-join."""
    labels = near_dup_component_labels(spark, sf_dir)
    d = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    sel = labels.join(d, labels.id == d.doc_id).select(
        "id", F.col("lbl").alias("component"), "n_chars"
    )
    return (
        sel.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max_by(
                "id", F.struct(F.col("n_chars"), (-F.col("id")).alias("neg"))
            ).alias("keeper_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("component")
    )


@query(
    "training_shard_manifest",
    oracle="""
    SELECT strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 4
               AS shard_id,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS total_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY shard_id ORDER BY shard_id
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5(doc_id)
    first hex nibble mod 4 — reproducible across engines, retries, and
    reruns (no rand()), uniform by hash. Map-only classify + one
    aggregation shuffle; the manifest (docs/tokens/source-mix per
    shard) is what an export job writes next to the data. NOTE the
    oracle replays the same nibble arithmetic: DuckDB strpos(..)-1
    equals Spark conv(hex,16,10), shifted by +1 consistently on both
    sides via %4 of the 1-based position ≡ (nibble+1) % 4."""
    d = Catalog(spark, sf_dir).documents
    nibble = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    shard = (nibble + 1) % 4
    return (
        d.select(
            shard.alias("shard_id"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            "source",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("shard_id")
    )
