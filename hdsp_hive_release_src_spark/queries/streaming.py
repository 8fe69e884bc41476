"""SURVEY.md §2.3 — streaming operators as driver-checkable queries.

These run a real Structured Streaming job to completion (memory sink,
processAllAvailable) and return the materialized result. Where the
streaming semantics are batch-equivalent over a finite input
(complete-mode window aggs, dedup-then-count), the DuckDB oracle checks
FULL value parity with the batch definition — stronger than the usual
rows-only check for streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.streaming import jobs


@query(
    "stream_windowed_counts",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY day, event_type ORDER BY day, event_type
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-day counts ≡ batch day buckets (UTC epoch-
    aligned windows make window.start == date_trunc('day'))."""
    return jobs.windowed_counts(spark, sf_dir).orderBy("day", "event_type")


@query(
    "stream_sessionization",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
                  event_id) AS gap_us
      FROM events
    ), tagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ), sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      FROM tagged
    )
    SELECT user_id, count(*) AS n_events,
           CAST(min(epoch_us(ts)) AS BIGINT) AS start_us
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, start_us
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session_window(30 min) ≡ batch gap sessions.
    Boundary note: session_window closes at gap >= threshold (window is
    [start, last+gap)), so the oracle uses >= where the batch
    `sessionization` query uses > — distinguishable only by an exact-
    to-the-microsecond 30:00.000000 gap."""
    return jobs.session_windows(spark, sf_dir).orderBy(
        "user_id", "start_us"
    )


@query(
    "stream_stateful_user_agg",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running per-user aggregate ≡ batch
    GROUP BY once the stream drains — explicit GroupState, Arrow
    batches, update-mode emission (SURVEY.md §2.3)."""
    return jobs.stateful_running_agg(spark, sf_dir).orderBy("user_id")


@query(
    "stream_stream_join",
    oracle="""
    SELECT v.user_id, count(*) AS n_pairs
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts
          FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts
          FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.purchase_ts >= v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    GROUP BY v.user_id ORDER BY v.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (view → purchase ≤ 1 h,
    same user) ≡ the batch interval join once both streams drain."""
    return jobs.stream_stream_interval_join(spark, sf_dir).orderBy(
        "user_id"
    )


@query(
    "stream_parquet_sink",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch → parquet sink, then a batch read-back aggregation
    ≡ the batch aggregate (loss or duplication in the sink breaks
    parity)."""
    return jobs.stream_to_parquet_sink(spark, sf_dir)


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates ≡ batch COUNT(DISTINCT) after the
    order-insensitive rollup."""
    return jobs.stream_distinct(spark, sf_dir)


@query(
    "stream_late_data",
    oracle="""
    WITH mx AS (SELECT date_trunc('day', max(CAST(ts AS TIMESTAMP)))
                    AS max_day FROM events)
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS day,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events, mx
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03'
      AND date_trunc('day', CAST(ts AS TIMESTAMP)) < max_day
    GROUP BY day ORDER BY day
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + late-data drop, deterministically replayed (two
    ordered files, maxFilesPerTrigger=1): the pre-cutoff rows arrive
    after the watermark has passed them and MUST be excluded, and the
    still-open last-day window MUST be withheld (append mode). The
    oracle encodes exactly that expectation from the batch table."""
    return jobs.late_data_windowed(spark, sf_dir)


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(value), 2)
               AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events enriched with the static customer dim (see
    streaming/jobs.py::static_enrich_join) — per-segment totals over
    the drained stream must equal the batch join."""
    return jobs.static_enrich_join(spark, sf_dir)


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2)
               AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-state streaming dedup (see streaming/jobs.py::
    dedup_within_watermark): a doubled source collapsed back to
    exactly the batch per-type totals."""
    return jobs.dedup_within_watermark(spark, sf_dir)


@query(
    "stream_foreachbatch_upsert",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           CAST(max(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS last_ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_foreachbatch_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """foreachBatch MERGE/upsert into a parquet state table across 3
    replayed micro-batches (see streaming/jobs.py::foreachbatch_upsert)
    — the final per-user state must equal the batch aggregation no
    matter how the stream was batched."""
    return jobs.foreachbatch_upsert(spark, sf_dir)


@query(
    "stream_trigger_available_now",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2)
               AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_trigger_available_now(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trigger.AvailableNow one-shot drain (see streaming/jobs.py::
    trigger_available_now) — self-terminating incremental batch run,
    result ≡ the batch aggregation."""
    return jobs.trigger_available_now(spark, sf_dir)


#: rate-micro-batch parameters, shared with the arithmetic oracle.
_RATE_ROWS = 512
_RATE_START_MS = 1_600_000_000_000


@query(
    "stream_rate_source",
    oracle=f"""
    WITH v AS (SELECT unnest(range(0, {_RATE_ROWS})) AS value)
    SELECT CAST(value % 8 AS BIGINT) AS lane,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value) AS BIGINT) AS value_sum,
           CAST(min(value) AS BIGINT) AS lo,
           CAST(max(value) AS BIGINT) AS hi,
           strftime(to_timestamp({_RATE_START_MS} / 1000)
                    AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS batch_ts
    FROM v GROUP BY lane ORDER BY lane
    """,
)
def stream_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rate-micro-batch built-in streaming SOURCE (the second
    jar-free source next to the file source the rest of the family
    reads): deterministic generated batches — rowsPerBatch rows with
    values 0..n-1 and a fixed startTimestamp per batch — consumed
    with trigger(availableNow) into a memory sink, then aggregated
    into 8 lanes. Because generation is arithmetic, the oracle is
    closed-form (range + modulo), giving a FULL value-parity check of
    a streaming source+trigger path with zero filesystem dependency.
    This is also the load-generator used for throughput smoke tests
    on real clusters."""
    from pyspark.sql import functions as F

    name = "rate_src_r7"
    df = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", _RATE_ROWS)
        .option("numPartitions", 4)
        .option("startTimestamp", _RATE_START_MS)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.table(name)
        .groupBy((F.col("value") % 8).alias("lane"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").cast("long").alias("value_sum"),
            F.min("value").cast("long").alias("lo"),
            F.max("value").cast("long").alias("hi"),
            F.date_format(
                F.min("timestamp"), "yyyy-MM-dd HH:mm:ss"
            ).alias("batch_ts"),
        )
        .orderBy("lane")
    )


@query(
    "stream_checkpoint_exactly_once",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT)
               AS n_distinct_event_ids,
           CAST(0 AS BIGINT) AS n_duplicates
    FROM events
    """,
)
def stream_checkpoint_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint recovery = exactly-once: the SAME availableNow
    query runs TWICE against the same checkpoint and parquet sink.
    Run 1 drains the source and commits its progress; run 2 restarts
    from the checkpoint, finds nothing new, and must append NOTHING —
    the file-source offsets + sink commit log are the exactly-once
    mechanism (vs stream_parquet_sink's rerun-idempotency pattern,
    which clears the sink instead). The output proves it: sink row
    count equals the source exactly, every event_id appears once,
    duplicates are zero. A checkpoint regression (reprocessing after
    restart) would double n_rows and fail the value hash."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path
    from hdsp_hive_release_src_spark.streaming.jobs import (
        read_events_stream,
    )

    sink = scratch_path("ckpt_once_sink", sf_dir)
    ckpt = scratch_path("ckpt_once_state", sf_dir)
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    for _ in range(2):
        q = (
            read_events_stream(spark, sf_dir)
            .select("event_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(120)
        q.stop()
        if not finished:
            raise TimeoutError("availableNow drain did not finish")
    back = spark.read.parquet(sink)
    from pyspark.sql import functions as F

    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("event_id")
        .cast("long")
        .alias("n_distinct_event_ids"),
        (
            F.count(F.lit(1)) - F.count_distinct("event_id")
        )
        .cast("long")
        .alias("n_duplicates"),
    )
