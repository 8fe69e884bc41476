"""Round-9 fifth-wave properties: chained-window emit rule and
streaming progress, Mann-Kendall identities, HITS bounds, Lorenz
monotonicity, cosine bounds, ORC bloom overhead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_chained_windows_emit_rule_and_state(spark):
    from hdsp_hive_release_src_spark.streaming import jobs

    rows = registry.QUERIES["stream_chained_windows"](
        spark, SF
    ).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_hours <= 24
        assert r.max_hour <= r.n_events
    # the still-open last event day must be withheld by append mode
    max_emitted = max(r.day for r in rows)
    max_event_day = (
        spark.read.parquet(f"{SF}/events.parquet")
        .agg(F.max(F.date_trunc("day", F.col("ts").cast("timestamp"))))
        .collect()[0][0]
    )
    assert max_emitted < max_event_day
    # the run really advanced an event-time watermark
    assert any(
        p.get("eventTime", {}).get("watermark", "1970") > "2000"
        for p in jobs.LAST_PROGRESS
    )


def test_mann_kendall_identities(spark):
    r = registry.QUERIES["mann_kendall_trend"](spark, SF).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.s_stat) <= r.n_pairs
    assert r.var18 > 0
    assert abs(r.z_stat) < 50


def test_hits_bounds_and_roles(spark):
    rows = registry.QUERIES["hits_hub_authority"](spark, SF).collect()
    hubs = [r for r in rows if r.role == "hub"]
    auths = [r for r in rows if r.role == "authority"]
    assert hubs and auths
    assert all(0 <= r.score_permille <= 1000 for r in rows)
    assert max(r.score_permille for r in hubs) == 1000
    assert max(r.score_permille for r in auths) == 1000
    assert all(r.node.startswith("c") for r in hubs)
    assert all(r.node.startswith("s") for r in auths)


def test_lorenz_monotone_and_complete(spark):
    rows = (
        registry.QUERIES["lorenz_curve_deciles"](spark, SF)
        .orderBy("decile")
        .collect()
    )
    assert [r.decile for r in rows] == list(range(10))
    cums = [r.cum_share_permille for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == 1000
    # ascending-sorted equal-count bins: per-decile sums nondecreasing
    per = [r.decile_cents for r in rows]
    assert all(b >= a * 0.5 for a, b in zip(per, per[1:]))


def test_centroid_cosine_bounds(spark):
    rows = registry.QUERIES["source_centroid_cosine"](spark, SF).collect()
    n_sources = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
    assert all(r.s1 < r.s2 for r in rows)


def test_orc_bloom_overhead(spark):
    row = registry.QUERIES["orc_bloom_filter_write"](spark, SF).collect()[0]
    assert row.bloom_overhead_positive
    assert row.n > 0
