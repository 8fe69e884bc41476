"""Round-9 stats-wave properties beyond oracle parity: statistic
bounds, identity cross-checks (pandas Spearman), exact-integer
partitioning invariance for the EWMA, and nonvacuity floors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_welch_bounds(spark):
    r = registry.QUERIES["welch_t_test"](spark, SF).collect()[0]
    assert r.n_f > 30 and r.n_other > 30
    # Welch-Satterthwaite df bracket
    assert min(r.n_f, r.n_other) - 1 <= r.welch_df <= (
        r.n_f + r.n_other - 2
    )
    assert abs(r.t_stat) < 50


def test_gini_bounds_and_nonvacuous(spark):
    r = registry.QUERIES["gini_concentration_index"](spark, SF).collect()[0]
    assert 0.0 < r.gini < 1.0
    assert r.n_customers > 100 and r.total_cents > 0


def test_spearman_matches_pandas(spark):
    """The doubled-rank integer fold must reproduce pandas'
    tie-averaged Spearman exactly (to float noise)."""
    import pandas as pd

    rho = registry.QUERIES["spearman_rank_corr"](spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/part.parquet")[
        ["p_retailprice", "p_size"]
    ]
    rx = pdf["p_retailprice"].rank(method="average")
    ry = pdf["p_size"].rank(method="average")
    expected = rx.corr(ry)  # Pearson on tie-averaged ranks
    assert abs(rho.spearman_rho - expected) < 1e-9
    assert -1.0 <= rho.spearman_rho <= 1.0


def test_weekday_index_weighted_mean_is_unity(spark):
    rows = registry.QUERIES["weekday_seasonality_index"](
        spark, SF
    ).collect()
    assert {r.dow for r in rows} <= set(range(1, 8))
    all_days = sum(r.n_days for r in rows)
    # Σ D_d·index_d / D == 1000 up to per-dow floor-division loss
    approx = sum(r.n_days * r.index_permille for r in rows) / all_days
    assert 990 <= approx <= 1000


def test_ewma_identities_and_partitioning_invariance(spark):
    fn = registry.QUERIES["ewma_halving_window"]
    rows = fn(spark, SF).orderBy("day").collect()
    # first day: EWMA == the day's own value (single-term window)
    assert rows[0].ewma_millicents == rows[0].day_cents * 1000
    # EWMA bounded by window extrema (here: global extrema suffice)
    lo = min(r.day_cents for r in rows) * 1000
    hi = max(r.day_cents for r in rows) * 1000
    assert all(lo <= r.ewma_millicents <= hi for r in rows)
    base = [tuple(r) for r in rows]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = [tuple(r) for r in fn(spark, SF).orderBy("day").collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_cramers_v_bounds(spark):
    r = registry.QUERIES["cramers_v_effect"](spark, SF).collect()[0]
    assert r.chi2_micro >= 0
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.n_rows_levels == 3 and r.n_col_levels == 5


def test_kappa_bounds_and_agreement_signal(spark):
    r = registry.QUERIES["cohens_kappa_raters"](spark, SF).collect()[0]
    assert r.tp + r.fn + r.fp + r.tn == r.n
    assert -1.0 <= r.kappa <= 1.0
    # the two raters both key on document size → positive agreement
    assert r.kappa > 0.1


def test_moving_median_frame_contract(spark):
    rows = (
        registry.QUERIES["moving_median_window"](spark, SF)
        .orderBy("day")
        .collect()
    )
    assert rows[0].med7 == float(rows[0].total_cents)
    vals = [r.total_cents for r in rows]
    for i, r in enumerate(rows):
        win = vals[max(0, i - 6) : i + 1]
        assert min(win) <= r.med7 <= max(win)
