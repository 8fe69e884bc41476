"""SURVEY.md §2 round-9 eighteenth wave (queued for the r10 window) —
the last Python DataSource quadrant: the STREAMING WRITER with a real
two-phase commit:

- ``python_datasource_stream_sink`` — a user-defined streaming sink
  (``DataSourceStreamWriter``): executor tasks write micro-batch
  partitions to TEMP files and return the temp name in their commit
  message; the driver's ``commit(messages, batchId)`` renames them
  to final ``b<batch>-p<part>.txt`` names — the two-phase-commit
  pattern that makes a custom sink exactly-once under task retries
  (an uncommitted attempt's temp file is never renamed, so it can
  never be read back). The whole bounded counter stream is then read
  back from the committed files and closed-form oracled.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

from hdsp_hive_release_src_spark.queries.round9q import (
    CounterStreamSource,
    PYSTREAM_N,
    PYSTREAM_STEP,
)
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import scratch_path

B = F.broadcast


class _SinkCommit(WriterCommitMessage):
    def __init__(self, pid: int, tmp: str):
        self.pid = pid
        self.tmp = tmp


class TwoPhaseFileStreamWriter(DataSourceStreamWriter):
    """Executor tasks write to temp files; only the driver's commit
    renames them into the visible namespace. Task retries leave
    orphan temps (cleaned by the next query run), never duplicate
    visible data — the exactly-once custom-sink recipe."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, it):
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in it:
                fh.write(f"{row.i},{row.sq}\n")
        return _SinkCommit(ctx.partitionId(), tmp)

    def commit(self, messages, batchId):
        for m in messages:
            final = os.path.join(
                self.path, f"b{batchId:05d}-p{m.pid:05d}.txt"
            )
            os.replace(m.tmp, final)

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


class TwoPhaseFileSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "twophasefilesink"

    def streamWriter(self, schema, overwrite):
        return TwoPhaseFileStreamWriter(self.options)


_SINK_ORACLE = f"""
SELECT CAST(i % 9 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(i) AS BIGINT) AS sum_i,
       CAST(sum(i * i) AS BIGINT) AS sum_sq
FROM range({PYSTREAM_N}) t(i)
GROUP BY 1 ORDER BY 1
"""


@query("python_datasource_stream_sink", oracle=_SINK_ORACLE)
def python_datasource_stream_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The bounded counter stream written through a USER-DEFINED
    streaming sink with a real two-phase commit (temp file per task →
    commit message → driver rename on ``commit(batchId)``), then read
    back from the committed files only and aggregated per mod-9
    bucket against the closed-form oracle. A replayed or lost
    micro-batch, a double-committed partition, or a leaked
    uncommitted attempt all shift the bucket sums — so the 2PC
    contract itself is what the gate verifies. Checkpointed to a
    per-scale scratch dir; data+checkpoint are wiped first, making
    re-runs deterministic."""
    path = scratch_path("twophasesink", sf_dir)
    ckpt = scratch_path("twophasesink_ckpt", sf_dir)
    for d in (path, ckpt):
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)
    for src in (CounterStreamSource, TwoPhaseFileSink):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass
    df = (
        spark.readStream.format("pycounterstream")
        .option("n", PYSTREAM_N)
        .option("step", PYSTREAM_STEP)
        .load()
    )
    q = (
        df.writeStream.format("twophasefilesink")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = (
        spark.read.text(os.path.join(path, "b*.txt"))
        .select(
            F.split(F.col("value"), ",")[0].cast("long").alias("i"),
            F.split(F.col("value"), ",")[1].cast("long").alias("sq"),
        )
    )
    return (
        back.groupBy((F.col("i") % 9).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("i").cast("long").alias("sum_i"),
            F.sum("sq").cast("long").alias("sum_sq"),
        )
        .orderBy("bucket")
    )
