"""SURVEY.md §2.4 continued — LLM-training-data pipeline, fourth wave:
context-window chunking with overlap, int8 embedding quantization, and
deterministic class-balanced sampling.

Scale shapes: chunking is map-only (per-doc array ops, no shuffle);
quantization is map-only vectorized JVM expression work (transform /
aggregate lambdas — no Python in the loop); balanced sampling is one
per-class window pass plus a broadcast scalar (the min class count),
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: context window / stride (words) for doc_chunk_overlap — stride =
#: window - overlap, i.e. 32-word chunks every 24 words (8-word overlap)
CHUNK = 32
STRIDE = 24


@query(
    "doc_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (
      SELECT doc_id,
             CAST(off // {STRIDE} AS BIGINT) AS chunk_idx,
             list_slice(ws, off + 1,
                        least(off + {CHUNK}, len(ws))) AS chunk
      FROM t, unnest(range(0, greatest(len(ws), 1), {STRIDE}))
                AS u(off))
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INTEGER) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the pretraining / RAG
    context-window cut: 32-word chunks every 24 words, so consecutive
    chunks share an 8-word overlap and no token is lost at a boundary.
    Map-only (explode over per-row offsets); chunk identity is pinned
    by an md5 of the joined words so the oracle proves the exact chunk
    CONTENT matches, not just counts. At 100 TB this is the shape you
    want: no shuffle, output partitioning inherits the scan."""
    d = Catalog(spark, sf_dir).documents
    ws = F.split("text", " ")
    chunks = (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("ws") - 1, F.lit(0)),
                    F.lit(STRIDE),
                )
            ).alias("off"),
            "ws",
        )
        .select(
            "doc_id",
            (F.col("off") / STRIDE).cast("long").alias("chunk_idx"),
            F.slice(F.col("ws"), F.col("off") + 1, F.lit(CHUNK)).alias(
                "chunk"
            ),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 500),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e)
    SELECT vec_id,
           round(scale, 6) AS scale_r,
           round(sqrt(list_sum(list_transform(v,
                 x -> pow(x - round(x / scale) * scale, 2)))
                 / len(v)), 6) AS rmse,
           CAST(len(v) AS INTEGER) AS n_dims
    FROM s ORDER BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (scale = max|x| / 127,
    q = round(x / scale)) with per-vector reconstruction RMSE — the
    4× storage cut every vector store applies before ANN serving.
    Entirely JVM-side higher-order functions (transform / aggregate
    lambdas); map-only, no Python, no shuffle. The RMSE oracle proves
    the quantize→dequantize round trip bit-agrees with DuckDB's."""
    e = Catalog(spark, sf_dir).embeddings.where(F.col("vec_id") < 500)
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    with_scale = e.select(
        "vec_id",
        v.alias("v"),
    ).select(
        "vec_id",
        "v",
        (F.array_max(F.expr("transform(v, x -> abs(x))")) / 127.0).alias(
            "scale"
        ),
    )
    sq_err_sum = F.expr(
        "aggregate(v, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + pow(x - round(x / scale) * scale, 2))"
    )
    return with_scale.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.round(F.sqrt(sq_err_sum / F.size("v")), 6).alias("rmse"),
        F.size("v").alias("n_dims"),
    ).orderBy("vec_id")


@query(
    "balanced_class_sample",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents),
    t AS (
      SELECT min(c) AS target FROM (
        SELECT count(*) AS c FROM documents GROUP BY lang))
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(doc_id) AS BIGINT) AS docid_sum
    FROM r, t WHERE rn <= target
    GROUP BY lang ORDER BY lang
    """,
)
def balanced_class_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class-balanced downsampling: every language is cut
    to the size of the SMALLEST language class, selecting rows by a
    content-independent md5(doc_id) order (a seeded shuffle both
    engines reproduce exactly — the docid_sum pins the exact selected
    SET, not just the counts). One window pass per class partition plus
    a broadcast of the scalar target; at 100 TB the per-class
    row_number is the bounded state, never a global sort."""
    d = Catalog(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
    target = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("target"))
    )
    return (
        ranked.join(F.broadcast(target))
        .where(F.col("rn") <= F.col("target"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("docid_sum"),
        )
        .orderBy("lang")
    )


@query(
    "chunk_dedup_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (
      SELECT doc_id,
             md5(array_to_string(
                 list_slice(ws, off + 1,
                            least(off + {CHUNK}, len(ws))), ' '))
                 AS chunk_hash
      FROM t, unnest(range(0, greatest(len(ws), 1), {STRIDE}))
                AS u(off)),
    dedup AS (
      SELECT chunk_hash, min(doc_id) AS keeper,
             count(*) AS n_copies
      FROM c GROUP BY chunk_hash)
    SELECT CAST(count(*) AS BIGINT) AS n_unique_chunks,
           CAST(sum(n_copies) AS BIGINT) AS n_total_chunks,
           CAST(count_if(n_copies > 1) AS BIGINT) AS n_duplicated,
           CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dropped
    FROM dedup
    """,
)
def chunk_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup — the pipeline composition the
    doc-level ops can't see: documents are cut with the SAME
    chunker as doc_chunk_overlap, then chunks dedup by content hash
    keeping the lowest doc_id (pretraining dedups CHUNKS because a
    boilerplate header repeated across distinct docs survives doc-level
    dedup). Map-only chunking into one hash-groupBy shuffle; the audit
    row reports unique/total/duplicated/dropped — what a curation run
    logs. Near-dup chunk variants plug in by swapping the hash for the
    minhash signature (dedup_minhash_lsh)."""
    d = Catalog(spark, sf_dir).documents
    ws = F.split("text", " ")
    chunks = (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("ws") - 1, F.lit(0)),
                    F.lit(STRIDE),
                )
            ).alias("off"),
            "ws",
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("ws"), F.col("off") + 1, F.lit(CHUNK))
                )
            ).alias("chunk_hash"),
        )
    )
    dedup = chunks.groupBy("chunk_hash").agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return dedup.agg(
        F.count(F.lit(1)).alias("n_unique_chunks"),
        F.sum("n_copies").cast("long").alias("n_total_chunks"),
        F.count_if(F.col("n_copies") > 1).alias("n_duplicated"),
        (F.sum("n_copies") - F.count(F.lit(1)))
        .cast("long")
        .alias("n_dropped"),
    )
