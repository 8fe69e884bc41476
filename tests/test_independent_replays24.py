"""Independent-model replays, batch 24 (round 11): the rest of the
TPC-H family (Q2, Q7-Q17, Q19-Q22) in pandas — correlated
subqueries, scalar thresholds, NOT IN exclusions, the
sole-late-supplier double-negation, and Q9's exact DECIMAL(18,4)
profit accumulation via Python's decimal — with batch 19 this makes
every TPC-H query third-engine verified."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _r2(x: float) -> float:
    return math.floor(x * 100 + 0.5) / 100


def _rev(df: pd.DataFrame) -> pd.Series:
    return df.l_extendedprice * (1 - df.l_discount)


def test_q2_min_cost_supplier_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q2_min_cost_supplier"](spark, SF).collect()
    li = _tbl("lineitem")
    li["uc"] = li.l_extendedprice / li.l_quantity
    cost = li.groupby(["l_partkey", "l_suppkey"])["uc"].min()
    p = _tbl("part")
    flt = {
        int(r.p_partkey): r.p_brand
        for r in p.itertuples()
        if r.p_size < 10 and r.p_type == "PROMO"
    }
    s = _tbl("supplier").set_index("s_suppkey")
    best: dict = {}
    for (pk, sk), uc in cost.items():
        pk, sk = int(pk), int(sk)
        if pk in flt:
            key = (float(uc), sk)
            if pk not in best or key < best[pk]:
                best[pk] = key
    want = [
        (
            pk, flt[pk], best[pk][0], best[pk][1],
            s.loc[best[pk][1]].s_name,
        )
        for pk in sorted(best)
    ]
    got = [
        (r.p_partkey, r.p_brand, r.best_cost, r.s_suppkey, r.s_name)
        for r in rows
    ]
    assert [(g[0], g[1], g[3], g[4]) for g in got] == [
        (w[0], w[1], w[3], w[4]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) <= 1e-9


def test_q10_returned_items_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q10_returned_items"](spark, SF).collect()
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)
    o = o[
        (o.d >= pd.Timestamp("1996-01-01"))
        & (o.d < pd.Timestamp("1996-07-01"))
    ]
    li = _tbl("lineitem")
    li = li[li.l_returnflag == "R"]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(_tbl("customer"), left_on="o_custkey", right_on="c_custkey")
        .merge(_tbl("nation"), left_on="c_nationkey", right_on="n_nationkey")
    )
    j["rev"] = _rev(j)
    agg = j.groupby(["c_custkey", "c_name", "c_acctbal", "n_name"])[
        "rev"
    ].sum()
    scored = sorted(
        (
            (_r2(v), int(ck), nm, _r2(float(bal)), nn)
            for (ck, nm, bal, nn), v in agg.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [
        (r.revenue, r.c_custkey, r.c_name, r.c_acctbal, r.n_name)
        for r in rows
    ]
    assert got == scored


def test_q11_important_parts_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q11_important_parts"](spark, SF).collect()
    li = _tbl("lineitem")
    li["v"] = li.l_extendedprice * li.l_quantity
    per = li.groupby("l_partkey")["v"].sum()
    thr = li.v.sum() * 0.0006
    want = sorted(
        ((_r2(v), int(k)) for k, v in per.items() if v > thr),
        key=lambda t: (-t[0], t[1]),
    )
    assert [(r.part_value, r.l_partkey) for r in rows] == want


def test_q12_priority_shipping_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q12_priority_shipping"](spark, SF).collect()
    li = _tbl("lineitem")
    li["s"] = pd.to_datetime(li.l_shipdate)
    li = li[
        (li.s >= pd.Timestamp("1996-01-01"))
        & (li.s < pd.Timestamp("1997-01-01"))
    ]
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late = j.s > j.d + pd.Timedelta(days=45)
    g = j.groupby("o_orderpriority")
    want = [
        (pr, int(late[gi.index].sum()), int((~late[gi.index]).sum()))
        for pr, gi in g
    ]
    assert [
        (r.o_orderpriority, r.late_count, r.ontime_count) for r in rows
    ] == sorted(want)


def test_q13_customer_distribution_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q13_customer_distribution"](spark, SF).collect()
    c = _tbl("customer")
    o = _tbl("orders")
    o = o[o.o_orderpriority != "5-LOW"]
    per_cust = o.groupby("o_custkey").size()
    counts = defaultdict(int)
    for ck in c.c_custkey.astype(int):
        counts[int(per_cust.get(ck, 0))] += 1
    want = sorted(
        ((cc, n) for cc, n in counts.items()),
        key=lambda t: (-t[1], -t[0]),
    )
    assert [(r.c_count, r.custdist) for r in rows] == want


def test_q14_promo_effect_replay(spark):
    registry.load_all()
    row = registry.QUERIES["q14_promo_effect"](spark, SF).collect()[0]
    li = _tbl("lineitem")
    li["s"] = pd.to_datetime(li.l_shipdate)
    li = li[
        (li.s >= pd.Timestamp("1996-09-01"))
        & (li.s < pd.Timestamp("1996-10-01"))
    ]
    p = _tbl("part")[["p_partkey", "p_type"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    rev = _rev(j)
    promo = rev[j.p_type == "PROMO"].sum()
    want = 100.0 * promo / rev.sum()
    assert abs(row.promo_revenue - want) <= 6e-4


def test_q15_top_supplier_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q15_top_supplier"](spark, SF).collect()
    li = _tbl("lineitem")
    li["s"] = pd.to_datetime(li.l_shipdate)
    li = li[
        (li.s >= pd.Timestamp("1996-01-01"))
        & (li.s < pd.Timestamp("1996-04-01"))
    ]
    li["rev"] = _rev(li)
    per = li.groupby("l_suppkey")["rev"].sum()
    top = per.max()
    s = _tbl("supplier").set_index("s_suppkey")
    want = [
        (int(k), s.loc[int(k)].s_name, _r2(v))
        for k, v in per.items()
        if v == top
    ]
    assert [
        (r.s_suppkey, r.s_name, r.total_rev) for r in rows
    ] == sorted(want)


def test_q16_supplier_count_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q16_supplier_count"](spark, SF).collect()
    p = _tbl("part")
    p = p[
        (p.p_brand != "Brand#3")
        & (p.p_type != "PROMO")
        & p.p_size.isin([1, 5, 9, 13, 17, 21, 25, 29, 33, 37])
    ]
    s = _tbl("supplier")
    excluded = set(
        s.loc[s.s_name.str.contains("7"), "s_suppkey"].astype(int)
    )
    li = _tbl("lineitem")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j[~j.l_suppkey.astype(int).isin(excluded)]
    cnt = j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"].nunique()
    want = sorted(
        (
            (int(n), b, t, int(sz))
            for (b, t, sz), n in cnt.items()
        ),
        key=lambda r: (-r[0], r[1], r[2], r[3]),
    )
    assert [
        (r.supplier_cnt, r.p_brand, r.p_type, r.p_size) for r in rows
    ] == want


def test_q17_small_quantity_revenue_replay(spark):
    registry.load_all()
    row = registry.QUERIES["q17_small_quantity_revenue"](spark, SF).collect()[0]
    li = _tbl("lineitem")
    caps = 0.2 * li.groupby("l_partkey")["l_quantity"].mean()
    p = _tbl("part")
    brand = set(
        p.loc[p.p_brand == "Brand#5", "p_partkey"].astype(int)
    )
    m = li.l_partkey.astype(int).isin(brand) & (
        li.l_quantity < li.l_partkey.map(caps)
    )
    want = li.loc[m, "l_extendedprice"].sum() / 7.0
    assert abs(row.avg_yearly - want) <= TOL2


def test_q19_discount_revenue_replay(spark):
    registry.load_all()
    row = registry.QUERIES["q19_discount_revenue"](spark, SF).collect()[0]
    li = _tbl("lineitem")
    p = _tbl("part")[["p_partkey", "p_brand", "p_size"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    m = (
        (j.p_brand == "Brand#1")
        & j.p_size.between(1, 15)
        & j.l_quantity.between(1, 21)
    ) | (
        (j.p_brand == "Brand#2")
        & j.p_size.between(1, 25)
        & j.l_quantity.between(10, 30)
    ) | (
        (j.p_brand == "Brand#3")
        & j.p_size.between(1, 35)
        & j.l_quantity.between(20, 40)
    )
    want = _rev(j[m]).sum()
    assert abs(row.revenue - want) <= TOL2


def test_q20_promo_shippers_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q20_promo_shippers"](spark, SF).collect()
    li = _tbl("lineitem")
    li["s"] = pd.to_datetime(li.l_shipdate)
    li = li[
        (li.s >= pd.Timestamp("1996-01-01"))
        & (li.s < pd.Timestamp("1997-01-01"))
    ]
    p = _tbl("part")
    promo = set(p.loc[p.p_type == "PROMO", "p_partkey"].astype(int))
    j = li[li.l_partkey.astype(int).isin(promo)]
    qty = j.groupby("l_suppkey")["l_quantity"].sum()
    heavy = {int(k) for k, v in qty.items() if v > 400}
    s = _tbl("supplier")
    want = sorted(
        (int(k), n)
        for k, n in zip(s.s_suppkey, s.s_name)
        if int(k) in heavy
    )
    assert [(r.s_suppkey, r.s_name) for r in rows] == want


def test_q21_sole_late_supplier_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q21_sole_late_supplier"](spark, SF).collect()
    li = _tbl("lineitem")
    o = _tbl("orders")[["o_orderkey", "o_orderdate"]]
    multi = {
        int(k)
        for k, n in li.groupby("l_orderkey")["l_suppkey"].nunique().items()
        if n > 1
    }
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late = j[
        pd.to_datetime(j.l_shipdate)
        > pd.to_datetime(j.o_orderdate) + pd.Timedelta(days=60)
    ]
    late_by_order: dict = defaultdict(set)
    for k, sk in zip(late.l_orderkey, late.l_suppkey):
        late_by_order[int(k)].add(int(sk))
    s = _tbl("supplier").set_index("s_suppkey")
    counts: dict = defaultdict(int)
    for k, sups in late_by_order.items():
        if k in multi and len(sups) == 1:
            counts[s.loc[next(iter(sups))].s_name] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.s_name, r.numwait) for r in rows] == want


def test_q22_global_sales_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q22_global_sales"](spark, SF).collect()
    c = _tbl("customer")
    avg_bal = c.loc[c.c_acctbal > 0, "c_acctbal"].mean()
    o = _tbl("orders")
    recent = set(
        o.loc[
            pd.to_datetime(o.o_orderdate) >= pd.Timestamp("1999-01-01"),
            "o_custkey",
        ].astype(int)
    )
    keep = c[
        (c.c_acctbal > avg_bal)
        & ~c.c_custkey.astype(int).isin(recent)
    ]
    g = keep.groupby("c_nationkey")["c_acctbal"].agg(["size", "sum"])
    assert [(r.cntry, r.numcust) for r in rows] == [
        (int(k), int(row_["size"])) for k, row_ in g.sort_index().iterrows()
    ]
    for r in rows:
        assert abs(r.totacctbal - g.loc[r.cntry, "sum"]) <= TOL2


def test_q7_volume_shipping_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q7_volume_shipping"](spark, SF).collect()
    li = _tbl("lineitem")
    li["s"] = pd.to_datetime(li.l_shipdate)
    li = li[
        (li.s >= pd.Timestamp("1996-01-01"))
        & (li.s <= pd.Timestamp("1997-12-31"))
    ]
    nat = _tbl("nation").set_index("n_nationkey")["n_name"]
    j = (
        li.merge(_tbl("orders"), left_on="l_orderkey", right_on="o_orderkey")
        .merge(_tbl("customer"), left_on="o_custkey", right_on="c_custkey")
        .merge(_tbl("supplier"), left_on="l_suppkey", right_on="s_suppkey")
    )
    j["sn"] = j.s_nationkey.map(nat)
    j["cn"] = j.c_nationkey.map(nat)
    j = j[
        ((j.sn == "NATION_1") & (j.cn == "NATION_2"))
        | ((j.sn == "NATION_2") & (j.cn == "NATION_1"))
    ]
    j["rev"] = _rev(j)
    j["y"] = j.s.dt.year
    agg = j.groupby(["sn", "cn", "y"])["rev"].sum()
    want = [
        (sn, cn, int(y), _r2(v))
        for (sn, cn, y), v in sorted(agg.items())
    ]
    assert [
        (r.supp_nation, r.cust_nation, r.l_year, r.revenue) for r in rows
    ] == want


def test_q8_market_share_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["q8_market_share"](spark, SF).collect()
    nat = _tbl("nation")
    reg = _tbl("region")
    europe = set(
        nat.merge(
            reg[reg.r_name == "EUROPE"],
            left_on="n_regionkey",
            right_on="r_regionkey",
        ).n_nationkey.astype(int)
    )
    p = _tbl("part")
    econ = set(p.loc[p.p_type == "ECONOMY", "p_partkey"].astype(int))
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)
    o = o[
        (o.d >= pd.Timestamp("1996-01-01"))
        & (o.d <= pd.Timestamp("1997-12-31"))
    ]
    c = _tbl("customer")
    c = c[c.c_nationkey.astype(int).isin(europe)]
    li = _tbl("lineitem")
    li = li[li.l_partkey.astype(int).isin(econ)]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    ).merge(_tbl("supplier"), left_on="l_suppkey", right_on="s_suppkey")
    names = _tbl("nation").set_index("n_nationkey")["n_name"]
    j["nation"] = j.s_nationkey.map(names)
    j["vol"] = _rev(j)
    j["y"] = j.d.dt.year
    for r in rows:
        g = j[j.y == r.o_year]
        share = g.loc[g.nation == "NATION_3", "vol"].sum() / g.vol.sum()
        assert abs(r.mkt_share - share) <= 6e-7
    assert {r.o_year for r in rows} == set(j.y.unique())


def test_q9_product_profit_decimal_replay(spark):
    from decimal import ROUND_HALF_UP, Decimal

    registry.load_all()
    rows = registry.QUERIES["q9_product_profit"](spark, SF).collect()
    p = _tbl("part")
    gear = p[p.p_name.str.contains("gear")].set_index("p_partkey")[
        "p_retailprice"
    ]
    li = _tbl("lineitem")
    li = li[li.l_partkey.astype(int).isin(set(gear.index.astype(int)))]
    nat = _tbl("nation").set_index("n_nationkey")["n_name"]
    sup = _tbl("supplier").set_index("s_suppkey")["s_nationkey"]
    q4 = Decimal("0.0001")

    def d4(x: float) -> Decimal:  # Spark double -> DECIMAL(18,4) cast
        return Decimal(x).quantize(q4, ROUND_HALF_UP)

    cells: dict = defaultdict(Decimal)
    for r in li.itertuples():
        profit = d4(float(r.l_extendedprice)) * d4(
            1 - float(r.l_discount)
        ) - d4(0.6 * float(gear.loc[int(r.l_partkey)])) * d4(
            float(r.l_quantity)
        )
        nation = nat.loc[int(sup.loc[int(r.l_suppkey)])]
        year = pd.Timestamp(r.l_shipdate).year
        cells[(nation, year)] += profit
    # r16: the cent-round happens on the EXACT decimal sum (quantize),
    # never on its float image — at replica scale one group's exact
    # sum is .8250, where float-path rounding diverges across engines
    want = [
        (n, y, float(v.quantize(Decimal("0.01"), ROUND_HALF_UP)))
        for (n, y), v in sorted(
            cells.items(), key=lambda kv: (kv[0][0], -kv[0][1])
        )
    ]
    assert [(r.nation, r.o_year, r.sum_profit) for r in rows] == want
