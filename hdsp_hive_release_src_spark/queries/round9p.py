"""SURVEY.md §2 round-9 sixteenth wave (queued for the r10 window) —
Python extension-point surface: custom data sources and vectorized
UDAFs:

- ``python_datasource_kvlog`` — the Spark 4.0 Python DataSource API
  (``spark.dataSource.register``): a user-defined ``key=value`` log
  format read back through a partitioned custom reader (one input
  partition per file — the distributed-read contract), proven
  lossless against the original table.
- ``pandas_grouped_agg_udaf`` — a GROUPED_AGG ``@pandas_udf``
  (Arrow-vectorized user-defined aggregate) applied in a groupBy —
  the extension point for aggregates Spark lacks natively; kept
  exact-integer (numpy int64 sum of squares) so the oracle replays
  it with plain SQL.
"""

from __future__ import annotations

import os

import pandas as pd  # noqa: F401  (pandas_udf resolution at import)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.functions import pandas_udf

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import scratch_path

B = F.broadcast


# --------------------------------------------------------------------
# Python DataSource API
# --------------------------------------------------------------------


class _KVFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KVLogReader(DataSourceReader):
    """Reader for the ';'-delimited key=value log format: one input
    partition PER FILE (the distributed-read contract — on a cluster
    each partition is read by a different task), parsing each line
    into (event_id, user_id, cents)."""

    def __init__(self, options):
        self.dir = options["path"]

    def partitions(self):
        return [
            _KVFilePartition(os.path.join(self.dir, f))
            for f in sorted(os.listdir(self.dir))
            if f.endswith(".txt")
        ]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                kv = dict(p.split("=", 1) for p in line.split(";"))
                yield (int(kv["e"]), int(kv["u"]), int(kv["c"]))


class KVLogSource(DataSource):
    """Spark 4.0 Python DataSource for the kv-log format (cites the
    public pyspark.sql.datasource API)."""

    @classmethod
    def name(cls) -> str:
        return "kvlog"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, cents bigint"

    def reader(self, schema):
        return KVLogReader(self.options)


_KVLOG_ORACLE = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM events GROUP BY user_id ORDER BY user_id
"""


@query("python_datasource_kvlog", oracle=_KVLOG_ORACLE)
def python_datasource_kvlog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round trip through a USER-DEFINED Python data source: events
    are exported as ';'-delimited key=value log lines (4 text files),
    the custom ``kvlog`` source is registered via
    ``spark.dataSource.register`` and reads them back through one
    input partition per file — the Spark 4.0 extension point for
    formats no built-in reader speaks. The per-user aggregate of the
    re-read rows must equal the same aggregate on the original
    parquet table (oracle) — losslessness, not just readability, is
    gated.
    Python-source reads are Arrow-batched; the parse cost is the
    per-row split, the exact price a custom format pays."""
    ev = Catalog(spark, sf_dir).events
    path = scratch_path("kvlog", sf_dir)
    (
        ev.select(
            F.concat(
                F.lit("e="),
                F.col("event_id"),
                F.lit(";u="),
                F.col("user_id"),
                F.lit(";c="),
                F.round(F.col("value") * 100).cast("long"),
            ).alias("value")
        )
        .repartition(4)
        .write.mode("overwrite")
        .text(path)
    )
    # .txt suffix so the reader's listing skips _SUCCESS markers
    for f in os.listdir(path):
        if f.startswith("part-") and not f.endswith(".txt"):
            os.rename(
                os.path.join(path, f), os.path.join(path, f + ".txt")
            )
    try:
        spark.dataSource.register(KVLogSource)
    except Exception:
        pass  # already registered in this session
    back = spark.read.format("kvlog").option("path", path).load()
    return (
        back.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# GROUPED_AGG pandas UDAF
# --------------------------------------------------------------------

_UDAF_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                * CAST(round(o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS sumsq_cents2
FROM orders
WHERE o_orderkey % 101 = 0
GROUP BY 1 ORDER BY 1
"""


@query("pandas_grouped_agg_udaf", oracle=_UDAF_ORACLE)
def pandas_grouped_agg_udaf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A GROUPED_AGG ``@pandas_udf`` — the Arrow-vectorized
    user-defined AGGREGATE extension point (each group's column
    arrives as one pandas Series; the return is the scalar) — kept
    exact: int64 sum of squared cents, so the oracle replays it as
    plain SQL sum(x·x). The mod-101 key filter bounds the squared
    sum far inside int64 at every scale AND keeps the Python-side
    work a deliberate cold-path demo (the repo's hot paths never
    leave the JVM; this query gates the extension surface itself).
    cites pyspark.sql.functions.pandas_udf (GROUPED_AGG)."""

    @pandas_udf("long")
    def sumsq(cents: pd.Series) -> int:
        import numpy as np

        a = cents.to_numpy(dtype="int64")
        return int(np.dot(a, a))

    # GROUPED_AGG pandas UDFs cannot share an .agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT), so the row count is
    # a second pandas UDAF — the mixed-plan restriction is itself
    # part of the surface this query documents.
    @pandas_udf("long")
    def ncount(cents: pd.Series) -> int:
        return int(len(cents))

    o = Catalog(spark, sf_dir).orders
    base = o.where(F.col("o_orderkey") % 101 == 0).select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    return (
        base.groupBy("priority")
        .agg(
            ncount(F.col("c")).alias("n"),
            sumsq(F.col("c")).alias("sumsq_cents2"),
        )
        .orderBy("priority")
    )
