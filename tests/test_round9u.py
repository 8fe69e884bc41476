"""Round-9 twenty-first-wave properties: epoch round-trip identities
and the DST boundary flip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_epoch_matrix_identities(spark):
    row = registry.QUERIES["epoch_timezone_matrix"](
        spark, SF
    ).collect()[0]
    # seconds/millis constructors invert the unix extractors
    assert row.ts_from_seconds == "2023-11-14 22:13:20"
    assert row.unix_s == 1700000000
    assert row.ts_from_millis == "2023-11-14 22:13:20.123"
    assert row.unix_ms == 1700000000123
    # date <-> epoch-day round trip at the same day number
    assert row.unix_d == 19783
    assert str(row.date_from_unix_d) == "2024-03-01"
    assert row.to_unix_ts == 1709294400
    assert (row.day_name, row.month_name) == ("Fri", "Mar")
    # the DST spring-forward: same UTC wall hour lands one NY hour
    # apart across 2024-03-10
    assert row.ny_before_dst == "2024-03-09 07:00:00"
    assert row.ny_after_dst == "2024-03-10 08:00:00"
    assert row.anchor_plus_dt == "2024-01-02 02:03:04.500"
    assert str(row.anchor_plus_ym) == "2025-08-15"
    # data anchor: matches a direct min() probe
    mints = (
        spark.read.parquet(f"{SF}/events.parquet")
        .agg(F.min(F.unix_seconds(F.col("ts").cast("timestamp"))))
        .collect()[0][0]
    )
    assert row.min_event_unix_s == mints
    assert row.n_events == 1000
