"""Independent-model replays, batch 33 (round 11): the SQL-standard
regression aggregates vs least-squares formulas, bitwise reduce
aggregates vs functools.reduce, the tolerance as-of join vs
pandas.merge_asof(tolerance=...), rank/dense_rank/row_number tie
semantics on a deliberately bucketed key, the 30-day RANGE frame as a
brute-force band scan, and median/boolean aggregates."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from functools import reduce

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3
TOL4 = 6e-5
TOL6 = 6e-7


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_regr_aggregates_least_squares_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["regr_aggregates"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        xs = g.l_quantity.astype(float)
        ys = g.l_extendedprice.astype(float)
        mx, my = xs.mean(), ys.mean()
        sxx = ((xs - mx) ** 2).sum()
        sxy = ((xs - mx) * (ys - my)).sum()
        syy = ((ys - my) ** 2).sum()
        slope = sxy / sxx
        assert abs(r.slope - slope) <= TOL6 * max(1, abs(slope))
        assert abs(r.intercept - (my - slope * mx)) <= TOL2
        assert abs(r.r2 - sxy * sxy / (sxx * syy)) <= TOL6
        assert r.n == len(g)


def test_bitwise_reduce_aggregates_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["bitwise_agg_funcs"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        qs = [int(q) for q in li.loc[li.l_returnflag == r.l_returnflag, "l_quantity"]]
        assert r.q_and == reduce(lambda a, b: a & b, qs)
        assert r.q_or == reduce(lambda a, b: a | b, qs)
        assert r.q_xor == reduce(lambda a, b: a ^ b, qs)
        assert r.bit2_pop == sum((q >> 2) & 1 for q in qs)


def test_asof_tolerance_vs_pandas_merge_asof(spark):
    registry.load_all()
    rows = registry.QUERIES["asof_join_tolerance"](spark, SF).collect()
    ev = _tbl("events")
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    p = ev[ev.event_type == "purchase"][
        ["user_id", "event_id", "ts"]
    ].sort_values("ts")
    v = (
        ev[ev.event_type == "view"][["user_id", "event_id", "ts"]]
        .rename(columns={"event_id": "vid", "ts": "vts"})
        .sort_values("vts")
    )
    m = pd.merge_asof(
        p,
        v,
        left_on="ts",
        right_on="vts",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(minutes=30),
        allow_exact_matches=True,
    )
    want = {
        int(r.event_id): (
            None if pd.isna(r.vid) else int(r.vid),
            None if pd.isna(r.vts) else int(pd.Timestamp(r.vts).value // 1000),
        )
        for r in m.itertuples()
    }
    assert len(rows) == len(want)
    for r in rows:
        assert (r.fresh_view_id, r.fresh_view_us) == want[r.event_id]


def test_rank_variants_tie_semantics_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["window_rank_variants"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 100].copy()
    o["bucket"] = [
        int(Decimal(v / 10000).quantize(Decimal(1), ROUND_HALF_UP))
        for v in o.o_totalprice.astype(float)
    ]
    want = {}
    for _, g in o.sort_values(["bucket", "o_orderkey"]).groupby("o_custkey"):
        buckets = g.bucket.tolist()
        keys = g.o_orderkey.astype(int).tolist()
        dense = 0
        prev = None
        for i, (b, k) in enumerate(zip(buckets, keys)):
            if b != prev:
                rank = i + 1
                dense += 1
                prev = b
            want[k] = (rank, dense, i + 1)
    assert len(rows) == len(want)
    for r in rows:
        assert (r.rnk, r.drnk, r.rn) == want[r.o_orderkey]


def test_range_trailing_30d_band_scan_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["window_range_trailing"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 300].copy()
    o["t"] = pd.to_datetime(o.o_orderdate)
    want = {}
    for _, g in o.groupby("o_custkey"):
        recs = list(zip(g.o_orderkey.astype(int), g.t, g.o_totalprice))
        for k, t, _ in recs:
            s = sum(
                float(p)
                for _, t2, p in recs
                if t - pd.Timedelta(days=30) <= t2 <= t
            )
            want[k] = s
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r.trailing_30d - want[r.o_orderkey]) <= TOL2


def test_median_boolean_aggs_replay(spark):
    import statistics

    registry.load_all()
    rows = registry.QUERIES["median_boolean_aggs"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        assert abs(
            r.med_price - statistics.median(g.l_extendedprice.astype(float))
        ) <= TOL4
        assert r.all_positive == bool((g.l_quantity > 0).all())
        assert r.any_deep_discount == bool((g.l_discount > 0.09).any())
        assert r.n_taxfree == int((g.l_tax == 0).sum())
