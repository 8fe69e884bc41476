"""Independent-model replays, batch 16 (round 11): reporting windows
(percent_rank/cume_dist/nth, numeric RANGE frames, windowed distinct,
ratio-to-report), profiling (column profile, group-size skew, SLA
percentiles), URL parsing via Python's urllib (a real third URL
parser), and the crypto/bitwise primitives via hashlib and native
ints."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from urllib.parse import parse_qs, urlparse

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL6 = 6e-7
TOL2 = 6e-3


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_url_parse_vs_urllib(spark):
    registry.load_all()
    rows = registry.QUERIES["url_parse"](spark, SF).collect()
    d = _tbl("documents")
    meta = {
        int(i): (s, lang)
        for i, s, lang in zip(d.doc_id, d.source, d.lang)
        if i < 200
    }
    assert len(rows) == len(meta)
    for r in rows:
        s, lang = meta[r.doc_id]
        u = urlparse(f"https://ex.com/{s}/p?q={lang}&id={r.doc_id}")
        assert r.host == u.hostname
        assert r.path == u.path
        assert r.query == u.query
        assert r.id_param == parse_qs(u.query)["id"][0]


def test_hash_funcs_vs_hashlib(spark):
    registry.load_all()
    rows = registry.QUERIES["hash_funcs"](spark, SF).collect()
    d = _tbl("documents")
    texts = {int(i): t for i, t in zip(d.doc_id, d.text) if i < 100}
    assert len(rows) == len(texts)
    for r in rows:
        b = texts[r.doc_id].encode()
        assert r.text_md5 == hashlib.md5(b).hexdigest()
        assert r.text_sha256 == hashlib.sha256(b).hexdigest()


def test_bitwise_funcs_vs_python_ints(spark):
    registry.load_all()
    rows = registry.QUERIES["bitwise_funcs"](spark, SF).collect()
    ks = sorted(int(k) for k in _tbl("orders").o_orderkey if k < 500)
    assert [r.o_orderkey for r in rows] == ks
    for r in rows:
        k = r.o_orderkey
        assert (
            r.and255, r.or4096, r.xor255, r.shl2, r.shr4, r.nbits
        ) == (
            k & 255, k | 4096, k ^ 255, (k & 15) << 2, k >> 4,
            bin(k).count("1"),
        )


def test_range_frame_numeric_bruteforce_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["range_frame_numeric"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_orderkey < 2000]
    by_prio: dict = defaultdict(list)
    for k, pr, p in zip(o.o_orderkey, o.o_orderpriority, o.o_totalprice):
        by_prio[pr].append((int(k), float(p)))
    want = {}
    for pr, rows_p in by_prio.items():
        for k, p in rows_p:
            peers = [
                q for _, q in rows_p if p - 10000 <= q <= p + 10000
            ]
            want[k] = (
                len(peers),
                sum(int(math.floor(q * 100 + 0.5)) for q in peers),
            )
    assert len(rows) == len(want)
    for r in rows:
        assert (r.n_near, r.near_cents) == want[r.o_orderkey]


def test_ratio_to_report_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["ratio_to_report"](spark, SF).collect()
    o = _tbl("orders")
    c = _tbl("customer")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    rev = {
        seg: math.floor(v * 100 + 0.5) / 100
        for seg, v in j.groupby("c_mktsegment")["o_totalprice"].sum().items()
    }
    tot, best = sum(rev.values()), max(rev.values())
    assert [r.c_mktsegment for r in rows] == sorted(rev)
    for r in rows:
        assert abs(r.revenue - rev[r.c_mktsegment]) <= TOL2
        assert abs(r.share - rev[r.c_mktsegment] / tot) <= TOL6
        assert abs(r.vs_best - rev[r.c_mktsegment] / best) <= TOL6


def test_group_size_skew_profile_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["group_size_skew_profile"](spark, SF).collect()
    sizes = Counter(Counter(_tbl("orders").o_custkey).values())
    want = []
    cum = 0
    for size in sorted(sizes, reverse=True):
        cum += sizes[size]
        want.append((size, sizes[size], cum))
    assert [(r.group_size, r.n_groups, r.cum_groups) for r in rows] == want


def test_column_profile_replay(spark):
    registry.load_all()
    rows = {r.col: r for r in registry.QUERIES["column_profile"](spark, SF).collect()}
    o = _tbl("orders")
    n = len(o)
    ck = rows["o_custkey"]
    assert (ck.n, ck.nulls, ck.n_distinct) == (
        n, int(o.o_custkey.isna().sum()), o.o_custkey.nunique(),
    )
    assert ck.min_v == float(o.o_custkey.min())
    assert ck.max_v == float(o.o_custkey.max())
    tp = rows["o_totalprice"]
    assert (tp.n, tp.n_distinct) == (n, o.o_totalprice.nunique())
    assert abs(tp.min_v - o.o_totalprice.min()) <= TOL2
    assert abs(tp.max_v - o.o_totalprice.max()) <= TOL2
    sp = rows["o_shippriority_mod"]
    mods = o.o_orderkey % 7
    assert sp.n_distinct == mods.nunique()
    assert (sp.min_v, sp.max_v) == (float(mods.min()), float(mods.max()))


def test_windowed_distinct_count_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["windowed_distinct_count"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 200]
    nd = o.groupby("o_custkey")["o_orderpriority"].nunique()
    assert len(rows) == len(o)
    for r in rows:
        assert r.n_prio == int(nd[r.o_custkey])


def test_window_extended_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["window_extended"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 200].copy()
    o["d"] = pd.to_datetime(o.o_orderdate)
    want = {}
    for _, g in o.sort_values(["d", "o_orderkey"]).groupby("o_custkey"):
        ks = g.o_orderkey.astype(int).tolist()
        n = len(ks)
        for i, k in enumerate(ks):
            want[k] = (
                0.0 if n == 1 else i / (n - 1),
                (i + 1) / n,
                ks[0],
                ks[-1],
                ks[1] if n >= 2 else None,
            )
    assert len(rows) == len(want)
    for r in rows:
        pr, cd, fk, lk, sk = want[r.o_orderkey]
        assert abs(r.pr - pr) <= TOL6
        assert abs(r.cd - cd) <= TOL6
        assert (r.first_key, r.last_key, r.second_key) == (fk, lk, sk)


def test_order_fulfillment_lag_percentiles_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["order_fulfillment_lag"](spark, SF).collect()
    o = _tbl("orders")[["o_orderkey", "o_orderdate", "o_orderpriority"]]
    li = _tbl("lineitem")[["l_orderkey", "l_shipdate"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    lag = (
        pd.to_datetime(j.l_shipdate).dt.normalize()
        - pd.to_datetime(j.o_orderdate).dt.normalize()
    ).dt.days

    def pct(vals: list, q: float) -> float:  # percentile_cont
        s = sorted(vals)
        idx = (len(s) - 1) * q
        lo, hi = s[math.floor(idx)], s[math.ceil(idx)]
        return lo + (hi - lo) * (idx - math.floor(idx))

    for r in rows:
        vals = lag[j.o_orderpriority == r.o_orderpriority].tolist()
        assert r.n_lines == len(vals)
        assert (r.min_lag, r.max_lag) == (min(vals), max(vals))
        assert abs(r.median_lag - pct(vals, 0.5)) <= TOL2
        assert abs(r.p95_lag - pct(vals, 0.95)) <= TOL2
