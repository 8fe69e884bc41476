"""Independent-model replays, batch 23 (round 11): the relational
core semantics — ROLLUP/CUBE/GROUPING SETS replayed by EXPLICIT
enumeration of every grouping combination, semi/anti joins and
INTERSECT/EXCEPT (distinct and bag forms) via Python sets/Counters,
and the null-safe join's NULL-matches-NULL bucket — the r1-era
queries whose driver rows are the oldest in the repo."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_rollup_explicit_enumeration_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["rollup_agg"](spark, SF).collect()
    li = _tbl("lineitem")
    cells: dict = defaultdict(lambda: [0.0, 0])
    for rf, ls, q in zip(li.l_returnflag, li.l_linestatus, li.l_quantity):
        # ROLLUP(a, b) = {(a,b), (a,ALL), (ALL,ALL)} — enumerated
        for key in ((rf, ls), (rf, "ALL"), ("ALL", "ALL")):
            cells[key][0] += float(q)
            cells[key][1] += 1
    got = {
        (r.returnflag, r.linestatus): (r.sum_qty, r.n) for r in rows
    }
    assert set(got) == set(cells)
    for k, (sq, n) in got.items():
        assert n == cells[k][1]
        assert abs(sq - cells[k][0]) <= TOL2


def test_cube_explicit_enumeration_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["cube_agg"](spark, SF).collect()
    o = _tbl("orders")
    cells: dict = defaultdict(lambda: [0, 0.0])
    for st, pr, v in zip(
        o.o_orderstatus, o.o_orderpriority, o.o_totalprice
    ):
        # CUBE(a, b) = all four combinations — enumerated
        for key in (
            (st, pr), (st, "ALL"), ("ALL", pr), ("ALL", "ALL"),
        ):
            cells[key][0] += 1
            cells[key][1] += float(v)
    got = {(r.status, r.priority): (r.n, r.total) for r in rows}
    assert set(got) == set(cells)
    for k, (n, total) in got.items():
        assert n == cells[k][0]
        assert abs(total - cells[k][1]) <= TOL2


def test_grouping_sets_enumeration_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["grouping_sets_agg"](spark, SF).collect()
    li = _tbl("lineitem")
    years = pd.to_datetime(li.l_shipdate).dt.year
    by_flag: dict = defaultdict(float)
    by_year: dict = defaultdict(float)
    for rf, y, p in zip(li.l_returnflag, years, li.l_extendedprice):
        by_flag[rf] += float(p)
        by_year[str(int(y))] += float(p)
    want = {(rf, "ALL"): v for rf, v in by_flag.items()}
    want.update({("ALL", y): v for y, v in by_year.items()})
    got = {(r.returnflag, r.ship_year): r.sum_price for r in rows}
    assert set(got) == set(want)
    for k, v in got.items():
        assert abs(v - want[k]) <= TOL2


def test_semi_anti_joins_vs_python_sets(spark):
    registry.load_all()
    c = _tbl("customer")
    o = _tbl("orders")
    urgent = set(
        o.loc[o.o_orderpriority == "1-URGENT", "o_custkey"].astype(int)
    )
    finished = set(
        o.loc[o.o_orderstatus == "F", "o_custkey"].astype(int)
    )
    names = dict(zip(c.c_custkey.astype(int), c.c_name))

    semi = registry.QUERIES["semi_join_customers"](spark, SF).collect()
    assert [(r.c_custkey, r.c_name) for r in semi] == [
        (k, names[k]) for k in sorted(set(names) & urgent)
    ]
    anti = registry.QUERIES["anti_join_customers"](spark, SF).collect()
    assert [(r.c_custkey, r.c_name) for r in anti] == [
        (k, names[k]) for k in sorted(set(names) - finished)
    ]


def test_set_ops_distinct_vs_python_sets(spark):
    registry.load_all()
    rows = registry.QUERIES["set_ops"](spark, SF).collect()
    o = _tbl("orders")
    urgent = set(
        o.loc[o.o_orderpriority == "1-URGENT", "o_custkey"].astype(int)
    )
    open_ = set(o.loc[o.o_orderstatus == "O", "o_custkey"].astype(int))
    pend = set(o.loc[o.o_orderstatus == "P", "o_custkey"].astype(int))
    assert [r.c_custkey for r in rows] == sorted((urgent & open_) - pend)


def test_set_ops_all_multiplicities_vs_counter(spark):
    registry.load_all()
    rows = registry.QUERIES["set_ops_all"](spark, SF).collect()
    c = _tbl("customer")
    a = Counter(
        int(k)
        for k, seg in zip(c.c_nationkey, c.c_mktsegment)
        if seg == "BUILDING"
    )
    b = Counter(
        int(k)
        for k, bal in zip(c.c_nationkey, c.c_acctbal)
        if bal > 5000
    )
    want = Counter()
    for k in set(a) | set(b):
        want[("intersect_all", k)] = min(a[k], b[k])
        want[("except_all", k)] = max(0, a[k] - b[k])
    got = Counter((r.op, r.k) for r in rows)
    assert got == Counter(
        {k: v for k, v in want.items() if v > 0}
    )


def test_null_safe_join_null_bucket_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["null_safe_join"](spark, SF).collect()
    c = _tbl("customer")
    segs = [
        None if s == "BUILDING" else s for s in c.c_mktsegment
    ]
    counts = Counter(segs)  # <=> join vs distinct segs = count per seg
    got = {r.seg: r.n_custs for r in rows}
    assert got == dict(counts)
    assert None in got  # the NULL bucket must have matched


def test_distinct_agg_vs_python_sets(spark):
    registry.load_all()
    rows = registry.QUERIES["distinct_agg"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        assert r.n_parts == g.l_partkey.nunique()
        assert r.n_supps == g.l_suppkey.nunique()
        assert r.n_rows == len(g)
