"""read_events_stream layout robustness: events.parquet ships as a
single FILE in the testdata drops but as a DIRECTORY of part files in
any Spark-written dataset (the 10× stress replica, a real warehouse).
A pathGlobFilter of 'events.parquet' matches file NAMES only, so the
directory layout silently produced an EMPTY stream before r8 — this
pins both layouts end to end."""

from __future__ import annotations

import shutil

import pytest

from hdsp_hive_release_src_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dir_layout_sf(spark, tmp_path_factory):
    """An sf dir whose events.parquet is a Spark-written DIRECTORY."""
    root = tmp_path_factory.mktemp("dirsf")
    src = read_events_stream  # noqa: F841 - import check only
    batch = spark.read.parquet(f"{SF}/events.parquet")
    out = str(root / "events.parquet")
    batch.write.mode("overwrite").parquet(out)
    yield str(root)
    shutil.rmtree(str(root), ignore_errors=True)


def test_directory_layout_streams_all_rows(spark, dir_layout_sf):
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, dir_layout_sf)
    agg = ev.groupBy().agg(F.count(F.lit(1)).alias("n"))
    name = run_to_memory(agg, "complete", "dirlayout")
    got = spark.table(name).collect()[0].n
    want = spark.read.parquet(f"{SF}/events.parquet").count()
    assert got == want and got > 0


def test_file_layout_unchanged(spark):
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, SF)
    agg = ev.groupBy().agg(F.count(F.lit(1)).alias("n"))
    name = run_to_memory(agg, "complete", "filelayout")
    got = spark.table(name).collect()[0].n
    assert got == spark.read.parquet(f"{SF}/events.parquet").count()
