"""SURVEY.md §2.4/§2.5 continued — multimodal plumbing, second wave:
video-style frame sampling over binary payloads (the decode itself is
a deterministic stand-in — media codecs aren't in this image — but the
Spark plumbing is real: schema, Arrow batching, per-row array output),
training-mixture weight planning, and the binaryFile ingestion source.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: frame-sampling parameters: payload bytes per "frame", sample stride
FRAME_BYTES = 16
FRAME_STRIDE = 4


@query(
    "frame_sample_plumbing",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text,
             octet_length(encode(text)) // {FRAME_BYTES} AS n_frames
      FROM documents WHERE doc_id < 400),
    s AS (
      SELECT doc_id, n_frames,
             range(0, n_frames, {FRAME_STRIDE}) AS idxs, text
      FROM v)
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(len(idxs) AS BIGINT) AS n_sampled,
           CAST(coalesce(list_sum(list_transform(idxs,
                i -> ord(substring(text, CAST(i * {FRAME_BYTES} + 1
                                              AS INTEGER), 1)))), 0)
                AS BIGINT) AS sampled_feat
    FROM s ORDER BY doc_id
    """,
)
def frame_sample_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: each doc's bytes stand in for a
    video payload cut into 16-byte "frames"; every 4th frame is
    sampled and "decoded" (deterministic first-byte feature — a real
    deployment swaps in the codec here, same signature). The sampling
    runs in an Arrow-batched mapInPandas over the BINARY column — the
    exact batch shape a real decoder UDF needs — and the byte-accurate
    oracle proves the index arithmetic and payload slicing, i.e. the
    part that stays when the codec arrives. Map-only, no shuffle."""
    import pandas as pd

    d = Catalog(spark, sf_dir).documents.where(F.col("doc_id") < 400)
    src = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = len(buf) // FRAME_BYTES
                idxs = range(0, n_frames, FRAME_STRIDE)
                feat = sum(buf[i * FRAME_BYTES] for i in idxs)
                rows.append(
                    (doc_id, n_frames, len(list(idxs)), feat)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_sampled",
                    "sampled_feat",
                ],
            )

    return (
        src.mapInPandas(
            sample,
            schema=(
                "doc_id long, n_frames long, n_sampled long, "
                "sampled_feat long"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "mixture_weights",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS n_tokens
      FROM documents GROUP BY source),
    tot AS (
      SELECT sum(n_tokens) AS total, count(*) AS n_sources FROM tok)
    SELECT source, n_tokens,
           round((total / n_sources) / n_tokens, 6) AS weight,
           CAST(round(n_tokens * round((total / n_sources) / n_tokens,
                                       6)) AS BIGINT)
               AS expected_tokens
    FROM tok, tot ORDER BY source
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning: per-source token counts → the
    sampling weight that equalizes every source's contribution
    (weight > 1 means the source repeats for multiple epochs, < 1
    means downsampling) plus the resulting expected token budget — the
    arithmetic behind every data-mixture config. One aggregation
    shuffle; the totals are a broadcast scalar."""
    d = Catalog(spark, sf_dir).documents
    # r13 subtree-sweep fix: the totals and the output join both
    # re-ran the per-source rollup from parquet. Source-sized —
    # checkpoint once.
    tok = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    ).localCheckpoint()
    tot = tok.agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    weight = F.round(
        (F.col("total") / F.col("n_sources")) / F.col("n_tokens"), 6
    )
    return (
        tok.join(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            weight.alias("weight"),
            F.round(F.col("n_tokens") * weight)
            .cast("long")
            .alias("expected_tokens"),
        )
        .orderBy("source")
    )


@query(
    "binaryfile_source",
    oracle="""
    SELECT 'blob_' || p_partkey || '.bin' AS fname,
           CAST(strlen(p_name) AS BIGINT) AS n_bytes,
           CAST(ord(p_name[1:1]) AS BIGINT) AS first_byte
    FROM part WHERE p_partkey < 40 ORDER BY fname
    """,
)
def binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile ingestion source — how raw media lands in the engine:
    opaque files on disk read as (path, modificationTime, length,
    content) rows. A deterministic blob set is staged from the part
    table, read back via format("binaryFile"), and byte-verified
    against the source strings. At 100 TB the same reader fans object
    storage across executors; pathGlobFilter prunes at listing time."""
    import os
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 40)
    path = scratch_path("binary_blobs", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    for pk, name in p.select("p_partkey", "p_name").collect():
        with open(f"{path}/blob_{pk}.bin", "wb") as f:
            f.write(name.encode("utf-8"))
    spark.catalog.refreshByPath(path)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return blobs.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.col("length").cast("long").alias("n_bytes"),
        # payloads are UTF-8 text here, so ascii(first char) IS the
        # first byte; a real media blob would take substring(content)
        F.ascii(F.decode(F.col("content"), "UTF-8"))
        .cast("long")
        .alias("first_byte"),
    ).orderBy("fname")


@query(
    "media_dedup_binary",
    oracle="""
    SELECT md5(p_brand) AS content_hash,
           min('blob_' || p_partkey || '.bin') AS keeper,
           count(*) AS n_copies
    FROM part WHERE p_partkey < 40
    GROUP BY md5(p_brand) ORDER BY content_hash
    """,
)
def media_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content digest — the FIRST stage of any
    multimodal curation pipeline (byte-identical images/audio from
    re-crawls collapse before any decode spends GPU time): blobs are
    staged on disk (brand strings, so duplicates genuinely exist),
    ingested via format("binaryFile"), and grouped by md5(content) —
    one digest per file computed executor-side at read time, one
    shuffle on the 16-byte hash, keeper = lexicographically first
    file. The oracle hashes the identical bytes from the source
    column."""
    import os
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 40)
    path = scratch_path("media_dedup_blobs", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    for pk, brand in p.select("p_partkey", "p_brand").collect():
        with open(f"{path}/blob_{pk}.bin", "wb") as f:
            f.write(brand.encode("utf-8"))
    spark.catalog.refreshByPath(path)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return (
        blobs.select(
            F.element_at(F.split("path", "/"), -1).alias("fname"),
            F.md5("content").alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("fname").alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("content_hash")
    )
