"""Round-9 seventh-wave properties: fiscal period ranges, allocation
exact-sum invariant, skyline dominance proof, budget admission
monotonicity, Luhn injection arithmetic, winsorized bound ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_fiscal_periods_in_range(spark):
    rows = registry.QUERIES["fiscal_calendar_445"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.period <= 12
        assert 1995 <= r.fyear <= 2002
    total = sum(r.n_orders for r in rows)
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert total == n


def test_allocation_sums_exactly_to_budget(spark):
    rows = registry.QUERIES["largest_remainder_allocation"](
        spark, SF
    ).collect()
    assert sum(r.allocation for r in rows) == 10000
    # proportionality: allocation within 1 unit of the exact quota
    tot = sum(r.cents for r in rows)
    for r in rows:
        exact = r.cents * 10000 / tot
        assert abs(r.allocation - exact) < 1.0


def test_skyline_is_exactly_the_nondominated_set(spark):
    """Brute-force dominance check against the window formulation."""
    sky = {
        (r.p_brand, r.size, r.cents)
        for r in registry.QUERIES["skyline_pareto_front"](
            spark, SF
        ).collect()
    }
    pts = (
        spark.read.parquet(f"{SF}/part.parquet")
        .groupBy("p_brand", F.col("p_size").cast("long").alias("size"))
        .agg(
            F.expr(
                "CAST(round(min(p_retailprice) * 100) AS BIGINT)"
            ).alias("cents")
        )
        .collect()
    )
    by_brand: dict = {}
    for r in pts:
        by_brand.setdefault(r.p_brand, []).append((r.size, r.cents))
    expected = set()
    for brand, ps in by_brand.items():
        for s, c in ps:
            dominated = any(
                (s2 <= s and c2 <= c and (s2 < s or c2 < c))
                for s2, c2 in ps
            )
            if not dominated:
                expected.add((brand, s, c))
    assert sky == expected


def test_budget_selection_within_budget_and_greedy(spark):
    rows = registry.QUERIES["budget_greedy_selection"](spark, SF).collect()
    assert rows
    total_toks = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.size(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    selected = sum(r.tokens_selected for r in rows)
    assert selected * 2 <= total_toks
    assert selected > 0


def test_luhn_injection_counts(spark):
    rows = registry.QUERIES["creditcard_luhn_scan"](spark, SF).collect()
    n_cand = sum(r.n_candidates for r in rows)
    n_valid = sum(r.n_luhn_valid for r in rows)
    n_docs = sum(r.n_docs for r in rows)
    # every 5th doc valid, every 5th+1 invalid: candidates = 2/5 of
    # docs (±rounding), valid = exactly the doc_id%5==0 share
    assert n_cand > 0 and n_valid > 0
    assert n_valid < n_cand  # the corrupted injections never validate
    assert abs(n_cand - 2 * n_docs / 5) <= 2
    assert abs(n_valid - n_docs / 5) <= 2


def test_winsorized_bounds_order(spark):
    rows = registry.QUERIES["winsorized_stats_clip"](spark, SF).collect()
    for r in rows:
        assert r.lo_bound <= r.hi_bound
        assert r.lo_bound * 1000 <= r.winsor_mean_milli <= (
            r.hi_bound * 1000
        )


def test_histogram2d_covers_all_parts(spark):
    rows = registry.QUERIES["histogram2d_bins"](spark, SF).collect()
    n = spark.read.parquet(f"{SF}/part.parquet").count()
    assert sum(r.n for r in rows) == n
    assert all(r.price_bin >= 0 and r.size_bin >= 0 for r in rows)
