"""Independent-model replays, batch 26 (round 11): the subquery
shapes — correlated EXISTS, scalar-subquery thresholds, multi-CTE
pipelines, the WITH RECURSIVE hierarchy walk replayed as a plain
Python BFS, and LATERAL top-k — all recomputed without any join or
window machinery."""

from __future__ import annotations

import math
from collections import defaultdict, deque

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _r2(x: float) -> float:
    return math.floor(x * 100 + 0.5) / 100


def test_correlated_exists_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["correlated_exists"](spark, SF).collect()
    li = _tbl("lineitem")
    heavy = set(li.loc[li.l_quantity > 45, "l_suppkey"].astype(int))
    s = _tbl("supplier")
    want = sorted(
        (int(k), n)
        for k, n in zip(s.s_suppkey, s.s_name)
        if int(k) in heavy
    )
    assert [(r.s_suppkey, r.s_name) for r in rows] == want


def test_scalar_subquery_threshold_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["scalar_subquery_filter"](spark, SF).collect()
    o = _tbl("orders")
    thr = 1.5 * o.o_totalprice.mean()
    keep = sorted(
        (
            (_r2(float(v)), int(k))
            for k, v in zip(o.o_orderkey, o.o_totalprice)
            if v > thr
        ),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    assert [(r.o_totalprice, r.o_orderkey) for r in rows] == keep


def test_cte_top_nation_revenue_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["cte_top_nation_revenue"](spark, SF).collect()
    o = _tbl("orders")
    c = _tbl("customer")
    nat = _tbl("nation").set_index("n_nationkey")["n_name"]
    cust_rev = o.groupby("o_custkey")["o_totalprice"].sum()
    per_nation: dict = defaultdict(lambda: [0.0, 0])
    nk = c.set_index("c_custkey")["c_nationkey"]
    for ck, rev in cust_rev.items():
        cell = per_nation[nat.loc[int(nk.loc[int(ck)])]]
        cell[0] += float(rev)
        cell[1] += 1
    want = sorted(
        ((_r2(v), n, cnt) for n, (v, cnt) in per_nation.items()),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r.nation_rev, r.n_name, r.n_cust) for r in rows] == want


def test_recursive_cte_vs_python_bfs(spark):
    registry.load_all()
    rows = registry.QUERIES["recursive_cte_hierarchy"](spark, SF).collect()
    ks = sorted(int(k) for k in _tbl("supplier").s_suppkey)
    kset = set(ks)
    cells: dict = defaultdict(lambda: [0, 0])
    q = deque((k, k, 0) for k in ks if k < 10)
    children: dict = defaultdict(list)
    for k in ks:
        if k >= 10:
            children[k // 10].append(k)
    while q:
        k, root, depth = q.popleft()
        cells[(root, depth)][0] += 1
        cells[(root, depth)][1] += k
        for ch in children.get(k, ()):
            q.append((ch, root, depth + 1))
    assert {
        (r.root, r.depth): (r.n, r.key_sum) for r in rows
    } == {k: tuple(v) for k, v in cells.items()}


def test_lateral_topk_per_nation_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["lateral_topk_join"](spark, SF).collect()
    c = _tbl("customer")
    nat = _tbl("nation").set_index("n_nationkey")["n_name"]
    want = []
    for nk, g in c.groupby("c_nationkey"):
        top2 = sorted(
            zip(g.c_acctbal.astype(float), g.c_custkey.astype(int)),
            key=lambda t: (-t[0], t[1]),
        )[:2]
        for bal, ck in top2:
            want.append((nat.loc[int(nk)], ck, _r2(bal)))
    # nations with no customers produce no LATERAL rows
    got = [(r.n_name, r.c_custkey, r.acctbal) for r in rows]
    assert sorted(got) == sorted(want)
