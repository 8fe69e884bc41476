"""Independent-model replays, batch 25 (round 11): the aggregate
varieties — exact interpolated percentiles vs a sorted-rank formula,
the HLL / KLL accuracy contracts against exact recomputation,
collect/listagg canonicalized strings, conditional aggregation,
fixed-width histograms, token explode top-k, and the NULL-conditional
scalar family."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3
TOL4 = 6e-5


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _pct(vals: list, q: float) -> float:  # linear interpolation
    s = sorted(vals)
    idx = (len(s) - 1) * q
    lo, hi = s[math.floor(idx)], s[math.ceil(idx)]
    return lo + (hi - lo) * (idx - math.floor(idx))


def test_percentiles_sorted_rank_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["percentiles"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        xs = li.loc[
            li.l_returnflag == r.l_returnflag, "l_extendedprice"
        ].tolist()
        assert abs(r.p50 - _pct(xs, 0.5)) <= TOL4
        assert abs(r.p90 - _pct(xs, 0.9)) <= TOL4
        assert abs(r.p99 - _pct(xs, 0.99)) <= TOL4


def test_approx_distinct_contract_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["approx_distinct"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        assert r.exact_parts == g.l_partkey.nunique()
        assert r.approx_within_8pct  # the HLL accuracy contract


def test_percentile_approx_contract_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["percentile_approx"](spark, SF).collect()
    assert rows
    for r in rows:
        d = r.asDict()
        flags = [v for k, v in d.items() if isinstance(v, bool)]
        assert flags and all(flags)  # sketch within tolerance of exact


def test_lateral_explode_top_tokens_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["lateral_explode_tokens"](spark, SF).collect()
    c: Counter = Counter()
    for t in _tbl("documents").text:
        c.update(w for w in t.split(" ") if w)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.token, r.n) for r in rows] == want


def test_histogram_bins_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["histogram_bins"](spark, SF).collect()
    li = _tbl("lineitem")
    cells: dict = defaultdict(lambda: [0, 0.0])
    for q, p in zip(li.l_quantity, li.l_extendedprice):
        b = int(float(q) // 5)
        cells[b][0] += 1
        cells[b][1] += float(p)
    assert [r.bin for r in rows] == sorted(cells)
    for r in rows:
        n, rev = cells[r.bin]
        assert r.n == n
        assert abs(r.bin_revenue - rev) <= TOL2


def test_conditional_agg_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["conditional_agg"](spark, SF).collect()
    c = _tbl("customer")
    nat = _tbl("nation").set_index("n_nationkey")["n_name"]
    c = c.assign(n_name=c.c_nationkey.map(nat))
    for r in rows:
        g = c[c.n_name == r.n_name]
        pos = g[g.c_acctbal > 0]
        assert r.n_positive == len(pos)
        assert r.n_nonpositive == len(g) - len(pos)
        assert abs(r.avg_positive_bal - pos.c_acctbal.mean()) <= TOL4


def test_collect_and_listagg_canonical_strings_replay(spark):
    registry.load_all()
    n = _tbl("nation")
    rows = registry.QUERIES["collect_agg"](spark, SF).collect()
    for r in rows:
        g = n[n.n_regionkey == r.n_regionkey]
        assert r.nations == ",".join(sorted(set(g.n_name)))
        assert r.n_nations == len(g)

    c = _tbl("customer")
    rich = c[c.c_acctbal > 7500].assign(
        n_name=c.c_nationkey.map(n.set_index("n_nationkey")["n_name"])
    )
    rows = registry.QUERIES["listagg_sorted"](spark, SF).collect()
    assert [r.n_name for r in rows] == sorted(rich.n_name.unique())
    for r in rows:
        g = rich[rich.n_name == r.n_name]
        assert r.names == ",".join(sorted(g.c_name))
        assert r.n_customers == len(g)


def test_null_handling_scalar_family_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["null_handling"](spark, SF).collect()
    c = _tbl("customer")
    meta = {
        int(k): (seg, float(b))
        for k, seg, b in zip(c.c_custkey, c.c_mktsegment, c.c_acctbal)
    }
    # LIMIT 200 caps the output; the sf0.001 customer table is smaller
    assert len(rows) == min(200, len(meta))
    for r in rows:
        seg, bal = meta[r.c_custkey]
        assert r.seg_or_other == ("OTHER" if seg == "BUILDING" else seg)
        assert abs(r.bal_floor - round(max(bal, 0.0), 2)) <= TOL2
        assert abs(r.bal_cap - round(min(bal, 1000.0), 2)) <= TOL2
        assert r.is_positive == (bal > 0)
