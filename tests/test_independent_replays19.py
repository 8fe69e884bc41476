"""Independent-model replays, batch 19 (round 11): the bench headline
TPC-H queries (Q1, Q3, Q5, Q6, Q18, plus the EXISTS-shaped Q4)
recomputed in pandas — the flagship numbers the whole benchmark
story rests on, verified by a third engine that shares neither
Catalyst nor DuckDB's SQL executor."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3
TOL4 = 6e-5


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _rev(df: pd.DataFrame) -> pd.Series:
    return df.l_extendedprice * (1 - df.l_discount)


def test_q1_pricing_summary_pandas_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q1_pricing_summary"](spark, SF).collect()
    li = _tbl("lineitem")
    li = li[pd.to_datetime(li.l_shipdate) <= pd.Timestamp("1998-09-02")]
    got = {
        (r.l_returnflag, r.l_linestatus): r for r in rows
    }
    groups = li.groupby(["l_returnflag", "l_linestatus"])
    assert set(got) == set(groups.groups)
    for key, g in groups:
        r = got[key]
        assert abs(r.sum_qty - g.l_quantity.sum()) <= TOL2
        assert abs(r.sum_base_price - g.l_extendedprice.sum()) <= TOL2
        assert abs(r.sum_disc_price - _rev(g).sum()) <= TOL2
        assert abs(
            r.sum_charge - (_rev(g) * (1 + g.l_tax)).sum()
        ) <= TOL2
        assert abs(r.avg_qty - g.l_quantity.mean()) <= TOL4
        assert abs(r.avg_price - g.l_extendedprice.mean()) <= TOL4
        assert abs(r.avg_disc - g.l_discount.mean()) <= TOL4
        assert r.count_order == len(g)


def test_q3_shipping_priority_pandas_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q3_shipping_priority"](spark, SF).collect()
    cut = pd.Timestamp("1997-06-01")
    c = _tbl("customer")
    c = c[c.c_mktsegment == "BUILDING"][["c_custkey"]]
    o = _tbl("orders")
    o = o[pd.to_datetime(o.o_orderdate) < cut][
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ]
    li = _tbl("lineitem")
    li = li[pd.to_datetime(li.l_shipdate) > cut]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    j["rev"] = _rev(j)
    agg = j.groupby(["l_orderkey", "o_orderdate"])["rev"].sum()
    scored = sorted(
        (
            (math.floor(v * 100 + 0.5) / 100, int(k))
            for (k, _), v in agg.items()
        ),
        key=lambda rk: (-rk[0], rk[1]),
    )[:10]
    assert [(r.revenue, r.l_orderkey) for r in rows] == scored


def test_q4_order_priority_pandas_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q4_order_priority"](spark, SF).collect()
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)
    o = o[
        (o.d >= pd.Timestamp("1996-01-01"))
        & (o.d < pd.Timestamp("1997-01-01"))
    ]
    li = _tbl("lineitem")[["l_orderkey", "l_shipdate"]].copy()
    li["s"] = pd.to_datetime(li.l_shipdate)
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late = set(
        j.loc[j.s > j.d + pd.Timedelta(days=60), "o_orderkey"]
    )
    counts = (
        o[o.o_orderkey.isin(late)]
        .groupby("o_orderpriority")
        .size()
    )
    assert [(r.o_orderpriority, r.order_count) for r in rows] == [
        (p, int(n)) for p, n in counts.sort_index().items()
    ]


def test_q5_local_supplier_volume_pandas_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q5_local_supplier_volume"](spark, SF).collect()
    reg = _tbl("region")
    nat = _tbl("nation")
    asia = nat.merge(
        reg[reg.r_name == "ASIA"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )[["n_nationkey", "n_name"]]
    sup = _tbl("supplier").merge(
        asia, left_on="s_nationkey", right_on="n_nationkey"
    )
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)
    o = o[
        (o.d >= pd.Timestamp("1996-01-01"))
        & (o.d < pd.Timestamp("1998-01-01"))
    ]
    j = (
        _tbl("lineitem")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            _tbl("customer"),
            left_on=["o_custkey", "s_nationkey"],
            right_on=["c_custkey", "c_nationkey"],
        )
    )
    j["rev"] = _rev(j)
    agg = {
        n: math.floor(v * 100 + 0.5) / 100
        for n, v in j.groupby("n_name")["rev"].sum().items()
    }
    want = sorted(agg.items(), key=lambda nv: (-nv[1], nv[0]))
    assert [(r.n_name, r.revenue) for r in rows] == want


def test_q6_revenue_forecast_pandas_replay(spark):
    registry.load_all()
    row = registry.QUERIES["q6_revenue_forecast"](spark, SF).collect()[0]
    li = _tbl("lineitem")
    s = pd.to_datetime(li.l_shipdate)
    m = (
        (s >= pd.Timestamp("1996-01-01"))
        & (s < pd.Timestamp("1997-01-01"))
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    )
    want = (li.loc[m, "l_extendedprice"] * li.loc[m, "l_discount"]).sum()
    assert abs(row.revenue - want) <= TOL2


def test_q18_large_volume_customer_pandas_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q18_large_volume_customer"](spark, SF).collect()
    li = _tbl("lineitem")
    qty = li.groupby("l_orderkey")["l_quantity"].sum()
    big = qty[qty > 250]
    o = _tbl("orders").set_index("o_orderkey")
    c = _tbl("customer").set_index("c_custkey")
    want = []
    for ok, sq in big.items():
        ord_row = o.loc[int(ok)]
        cust = c.loc[int(ord_row.o_custkey)]
        want.append(
            (
                cust.c_name,
                int(ord_row.o_custkey),
                int(ok),
                math.floor(float(ord_row.o_totalprice) * 100 + 0.5) / 100,
                math.floor(float(sq) * 100 + 0.5) / 100,
            )
        )
    want.sort(key=lambda t: (-t[3], t[2]))
    got = [
        (r.c_name, r.c_custkey, r.o_orderkey, r.o_totalprice, r.sum_qty)
        for r in rows
    ]
    assert got == want[:100]
