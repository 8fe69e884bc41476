"""Independent-model replays, batch 36 (round 12): the round9b
inference-statistics cohort. These queries transcribe one closed-form
expression into BOTH the Spark impl and the DuckDB oracle (the
Bollinger failure mode: a shared formula wrong-by-a-factor passes
parity), and until this batch carried only bounds/identity tests. Each
replay recomputes the full expected output from the raw parquet with a
DIFFERENT algebraic path (textbook formulas, pandas/numpy engines).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _orders_cents() -> pd.DataFrame:
    o = _tbl("orders")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    return o


def test_welch_t_matches_textbook_variance_form(spark):
    """Impl/oracle share the (q - s²/n)/(n-1)/n sum-of-squares shape;
    the replay uses np.var(ddof=1) — a numerically different path —
    and the standard Welch t / Welch–Satterthwaite df."""
    registry.load_all()
    row = registry.QUERIES["welch_t_test"](spark, SF).collect()[0]
    o = _orders_cents()
    x1 = o.loc[o.o_orderstatus == "F", "cents"].to_numpy(float)
    x2 = o.loc[o.o_orderstatus != "F", "cents"].to_numpy(float)
    n1, n2 = len(x1), len(x2)
    se1 = np.var(x1, ddof=1) / n1
    se2 = np.var(x2, ddof=1) / n2
    t = (x1.mean() - x2.mean()) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (
        se1**2 / (n1 - 1) + se2**2 / (n2 - 1)
    )
    assert (row.n_f, row.n_other) == (n1, n2)
    assert math.isclose(row.mean_f_cents, x1.mean(), rel_tol=1e-9)
    assert math.isclose(row.mean_other_cents, x2.mean(), rel_tol=1e-9)
    assert math.isclose(row.t_stat, t, rel_tol=1e-6)
    assert math.isclose(row.welch_df, df, rel_tol=1e-6)


def test_gini_matches_mean_absolute_difference_form(spark):
    """Impl/oracle share the rank formula G = (2·Σ i·xᵢ − (n+1)·Σx) /
    (n·Σx); the replay computes the DEFINITIONAL Gini — mean absolute
    difference over twice the mean — from the O(n²) pairwise matrix."""
    registry.load_all()
    row = registry.QUERIES["gini_concentration_index"](
        spark, SF
    ).collect()[0]
    o = _orders_cents()
    x = o.groupby("o_custkey").cents.sum().to_numpy(float)
    n = len(x)
    mad = np.abs(x[:, None] - x[None, :]).sum() / (n * n)
    gini = mad / (2 * x.mean())
    assert row.n_customers == n
    assert row.total_cents == int(x.sum())
    assert math.isclose(row.gini, gini, rel_tol=1e-9)


def test_cramers_v_matches_float_chi2(spark):
    """Impl/oracle fold chi² in integer micro-units with the
    (O·N − R·C)²/(R·C·N) rearrangement; the replay computes textbook
    Σ (O−E)²/E from a pandas crosstab. Per-cell micro truncation
    bounds the divergence by cells·1e-6."""
    registry.load_all()
    row = registry.QUERIES["cramers_v_effect"](spark, SF).collect()[0]
    o = _tbl("orders")
    ct = pd.crosstab(o.o_orderstatus, o.o_orderpriority)
    obs = ct.to_numpy(float)
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    assert row.n == int(n)
    assert (row.n_rows_levels, row.n_col_levels) == ct.shape
    assert abs(row.chi2_micro / 1e6 - chi2) <= ct.size * 1e-6 + 1e-9
    assert math.isclose(row.cramers_v, v, rel_tol=1e-6)


def test_kappa_matches_po_pe_form(spark):
    """Impl/oracle share the single-quotient κ rearrangement; the
    replay re-rates every document in pandas and uses the textbook
    κ = (p_o − p_e)/(1 − p_e)."""
    registry.load_all()
    row = registry.QUERIES["cohens_kappa_raters"](spark, SF).collect()[
        0
    ]
    d = _tbl("documents")
    a = (d.n_chars >= 300).to_numpy()
    b = (d.text.str.count(" ") >= 45).to_numpy()
    n = len(d)
    tp = int((a & b).sum())
    fn = int((a & ~b).sum())
    fp = int((~a & b).sum())
    tn = int((~a & ~b).sum())
    po = (tp + tn) / n
    pe = ((tp + fn) * (tp + fp) + (tn + fp) * (tn + fn)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert (row.n, row.tp, row.fn, row.fp, row.tn) == (
        n,
        tp,
        fn,
        fp,
        tn,
    )
    assert math.isclose(row.kappa, kappa, rel_tol=1e-9)


def test_moving_median_matches_pandas_rolling(spark):
    registry.load_all()
    rows = registry.QUERIES["moving_median_window"](
        spark, SF
    ).collect()
    o = _orders_cents()
    daily = (
        o.groupby(pd.to_datetime(o.o_orderdate).dt.date)
        .cents.sum()
        .sort_index()
    )
    med = daily.rolling(7, min_periods=1).median()
    got = [(r.day, r.total_cents, r.med7) for r in rows]
    want = list(zip(daily.index, daily.to_numpy(), med.to_numpy()))
    assert len(got) == len(want)
    for (gd, gc, gm), (wd, wc, wm) in zip(got, want):
        assert gd == wd and gc == wc and gm == wm


def test_ewma_exact_integer_fold_matches_float_model(spark):
    """The dyadic-weight integer EWMA (num·1000 div den) must sit
    within one millicent of the float model Σ x·0.5^lag / Σ 0.5^lag
    over the same 20-day frame."""
    registry.load_all()
    rows = registry.QUERIES["ewma_halving_window"](spark, SF).collect()
    o = _orders_cents()
    daily = (
        o.groupby(pd.to_datetime(o.o_orderdate).dt.date)
        .cents.sum()
        .sort_index()
    )
    vals = daily.to_numpy(float)
    assert len(rows) == len(vals)
    for i, r in enumerate(rows):
        lo = max(0, i - 19)
        window = vals[lo : i + 1]
        weights = 0.5 ** np.arange(len(window) - 1, -1, -1)
        model = (window * weights).sum() / weights.sum()
        assert r.day == daily.index[i]
        assert r.day_cents == int(vals[i])
        assert abs(r.ewma_millicents - model * 1000) <= 1.0 + 1e-6 * abs(
            model * 1000
        )


def test_weekday_index_matches_pandas_calendar(spark):
    """Independent calendar engine: pandas dayofweek (0=Monday) mapped
    to Spark's 1=Sunday convention, index recomputed with floor div."""
    registry.load_all()
    rows = registry.QUERIES["weekday_seasonality_index"](
        spark, SF
    ).collect()
    e = _tbl("events")
    ts = pd.to_datetime(e.ts)
    df = pd.DataFrame(
        {"d": ts.dt.date, "dow": (ts.dt.dayofweek + 1) % 7 + 1}
    )
    daily = df.groupby(["d", "dow"]).size().reset_index(name="c")
    all_days, all_events = len(daily), int(daily.c.sum())
    want = {}
    for dow, grp in daily.groupby("dow"):
        n_days, n_events = len(grp), int(grp.c.sum())
        want[int(dow)] = (
            n_days,
            n_events,
            n_events * all_days * 1000 // (n_days * all_events),
        )
    got = {
        r.dow: (r.n_days, r.n_events, r.index_permille) for r in rows
    }
    assert got == want
