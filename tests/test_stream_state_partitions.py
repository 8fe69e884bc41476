"""r16 stateful-stream shuffle sizing (streaming/jobs.py): stateful
operators pay a per-shuffle-partition state-store constant every
micro-batch, so run_to_memory scopes spark.sql.shuffle.partitions to
state_shuffle_partitions() for the start→drain→stop region and MUST
restore the batch value after (guide §2.2/§2.4)."""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark.streaming import jobs


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "13")
    assert jobs.state_shuffle_partitions() == 13


def test_derived_from_cpus_clamped(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    assert jobs.state_shuffle_partitions() == 8  # 32 // 4
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    assert jobs.state_shuffle_partitions() == 4  # floor clamp
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "256")
    assert jobs.state_shuffle_partitions() == 32  # ceiling clamp


def test_scope_sets_and_restores(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "5")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with jobs.stateful_partitioning(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_scope_restores_on_error(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "5")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError, match="boom"):
        with jobs.stateful_partitioning(spark):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_drained_stream_uses_state_sizing(spark, sf_dir, monkeypatch):
    """End-to-end: a drained stateful stream must actually run its
    state operator at the reduced partition count (the conf is read at
    stream start — this guards against the scope landing around the
    wrong region), results must match the batch twin unchanged, and
    the batch session must come back at its own sizing."""
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE", raising=False)
    batch_parts = spark.conf.get("spark.sql.shuffle.partitions")
    out = jobs.windowed_counts(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == batch_parts
    ops = [
        op
        for p in jobs.LAST_PROGRESS
        for op in p.get("stateOperators", [])
    ]
    assert ops, "stateful stream reported no state operators"
    want = jobs.state_shuffle_partitions()
    assert all(
        int(op["numShufflePartitions"]) == want for op in ops
    ), ops
    # complete-mode drain over the finite source ≡ batch aggregation
    from pyspark.sql import functions as F

    from hdsp_hive_release_src_spark.streaming.jobs import (
        read_events_stream,  # noqa: F401 — same ts normalization
    )
    from hdsp_hive_release_src_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).events
    batch = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    )
    assert sorted(map(tuple, out)) == sorted(map(tuple, batch))
