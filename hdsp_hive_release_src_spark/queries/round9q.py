"""SURVEY.md §2 round-9 seventeenth wave (queued for the r10 window)
— the rest of the Spark 4.0 Python DataSource surface: streaming
reads and executor-side writes:

- ``python_datasource_stream`` — a user-defined STREAMING source
  (``SimpleDataSourceStreamReader``): deterministic bounded counter
  micro-batches drained to completion, offset-tracked by the engine;
  the aggregate is closed-form oracled, so the offset progression
  (no skipped, no duplicated batch) is what the gate verifies.
- ``python_datasource_writer`` — the ``DataSourceWriter`` half: the
  events table written to the custom kv-log format by EXECUTOR-side
  Python (one file per partition, commit messages to the driver),
  then read back through the same custom reader — a full round trip
  where both directions are user-defined format code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.queries.round9p import KVLogSource
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import scratch_path

B = F.broadcast

#: bounded counter-stream extent and micro-batch step (coprime-ish so
#: the last batch is ragged — the offset bookkeeping edge case).
PYSTREAM_N = 1000
PYSTREAM_STEP = 170


class CounterStreamReader(SimpleDataSourceStreamReader):
    """Deterministic bounded counter stream: each ``read`` call
    returns the next [start, start+step) slice and the advanced
    offset; past N it returns an empty slice with an unchanged
    offset (= 'no data available'). The ENGINE persists offsets
    between micro-batches — exactly the contract a Kafka-like custom
    source implements."""

    def __init__(self, n: int, step: int):
        self.n, self.step = n, step

    def initialOffset(self):
        return {"v": 0}

    def read(self, start):
        s = start["v"]
        if s >= self.n:
            return iter([]), {"v": s}
        e = min(s + self.step, self.n)
        return iter([(i, i * i) for i in range(s, e)]), {"v": e}


class CounterStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pycounterstream"

    def schema(self) -> str:
        return "i bigint, sq bigint"

    def simpleStreamReader(self, schema):
        return CounterStreamReader(
            int(self.options.get("n", PYSTREAM_N)),
            int(self.options.get("step", PYSTREAM_STEP)),
        )


_PYSTREAM_ORACLE = f"""
SELECT CAST(i % 7 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(i) AS BIGINT) AS sum_i,
       CAST(sum(i * i) AS BIGINT) AS sum_sq
FROM range({PYSTREAM_N}) t(i)
GROUP BY 1 ORDER BY 1
"""


@query("python_datasource_stream", oracle=_PYSTREAM_ORACLE)
def python_datasource_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A user-defined Python STREAMING source run to completion:
    {PYSTREAM_N} counter rows arrive in ragged {PYSTREAM_STEP}-row
    micro-batches through ``SimpleDataSourceStreamReader`` (the
    engine checkpoints the reader's offsets between batches), drained
    with processAllAvailable into a memory sink, then aggregated per
    mod-7 bucket. The oracle is the closed-form range aggregate — a
    skipped or replayed micro-batch changes every bucket, so
    exactly-once offset progression is precisely what the gate
    checks. cites pyspark.sql.datasource (public API)."""
    try:
        spark.dataSource.register(CounterStreamSource)
    except Exception:
        pass
    df = (
        spark.readStream.format("pycounterstream")
        .option("n", PYSTREAM_N)
        .option("step", PYSTREAM_STEP)
        .load()
    )
    qname = "pystream_counter_sink"
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(qname)
        .groupBy((F.col("i") % 7).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("i").cast("long").alias("sum_i"),
            F.sum("sq").cast("long").alias("sum_sq"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------
# Python DataSource writer
# --------------------------------------------------------------------


class KVLogWriter(DataSourceWriter):
    """Executor-side writer for the kv-log format: each task writes
    its partition to one file and returns a commit message to the
    driver (the two-phase commit hook custom sinks implement)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fn = os.path.join(self.path, f"part-{pid:05d}.txt")
        with open(fn, "w", encoding="utf-8") as fh:
            for row in it:
                fh.write(
                    f"e={row.event_id};u={row.user_id};c={row.cents}\n"
                )
        return WriterCommitMessage()


class KVLogSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kvlogsink"

    def writer(self, schema, overwrite):
        return KVLogWriter(self.options)


_PYWRITER_ORACLE = """
SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM events GROUP BY 1 ORDER BY 1
"""


@query("python_datasource_writer", oracle=_PYWRITER_ORACLE)
def python_datasource_writer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The write half of the Python DataSource API: events flow OUT
    through a user-defined ``DataSourceWriter`` (executor-side Python
    writes one kv-log file per partition and sends a commit message
    back — the custom-sink two-phase-commit hook), then back IN
    through the round9p custom reader, and the cohort aggregate must
    equal the same aggregate on the original parquet (oracle): a
    lossless round trip where BOTH directions are user-defined
    format code. Writes go under the repo scratch dir, mode
    idempotent by directory reuse (files keyed on partition id)."""
    ev = Catalog(spark, sf_dir).events
    path = scratch_path("kvlogsink", sf_dir)
    # clear stale files so a re-run with fewer partitions can't leave
    # orphans behind (the writer itself is append-shaped)
    if os.path.isdir(path):
        for f in os.listdir(path):
            os.remove(os.path.join(path, f))
    for src in (KVLogSink, KVLogSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass
    (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .repartition(4)
        .write.format("kvlogsink")
        .option("path", path)
        .mode("append")
        .save()
    )
    back = spark.read.format("kvlog").option("path", path).load()
    return (
        back.groupBy((F.col("user_id") % 10).cast("long").alias("cohort"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("cohort")
    )
