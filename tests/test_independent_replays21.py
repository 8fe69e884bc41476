"""Independent-model replays, batch 21 (round 11): rounding modes via
decimal's own HALF_UP/HALF_EVEN on the exact binary expansions, the
math builtin wave vs Python's math module, string/regex families vs
str/re, sample statistics vs hand-computed moment formulas, haversine
rings vs math-module trig, and max_by/min_by vs direct composite-key
extremes."""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL6 = 6e-7
TOL4 = 6e-5


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_rounding_modes_vs_decimal(spark):
    registry.load_all()
    rows = registry.QUERIES["rounding_modes"](spark, SF).collect()
    p = _tbl("part")
    prices = {
        int(k): float(v)
        for k, v in zip(p.p_partkey, p.p_retailprice)
        if k < 400
    }
    assert len(rows) == len(prices)
    diverge_seen = False
    for r in rows:
        x = Decimal(prices[r.p_partkey] / 10)  # exact binary expansion
        hu = float(x.quantize(Decimal(1), ROUND_HALF_UP))
        he = float(x.quantize(Decimal(1), ROUND_HALF_EVEN))
        assert (r.half_up, r.half_even, r.diverges) == (hu, he, hu != he)
        diverge_seen |= r.diverges
    assert diverge_seen  # the .5 boundary must actually be exercised


def test_math_funcs_wave2_vs_python_math(spark):
    # (l_orderkey, l_linenumber) is NOT unique in this testdata, so
    # the comparison is a full row multiset, not a keyed lookup
    registry.load_all()
    rows = registry.QUERIES["math_funcs_wave2"](spark, SF).collect()
    li = _tbl("lineitem")

    def r6(x: float) -> float:  # HALF_UP like Spark round()
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    want = []
    for k, ln, q, d in zip(
        li.l_orderkey, li.l_linenumber, li.l_quantity, li.l_discount
    ):
        if k >= 300:
            continue
        k, q, d = int(k), float(q), float(d)
        nan_lane = k % 7 == 0
        want.append(
            (
                k,
                int(ln),
                r6(1 / math.tan(q / 10)),
                math.factorial(int(q) % 10),
                r6(q ** (1 / 3)),
                r6(math.expm1(d)),
                r6(math.log1p(d)),
                float(
                    Decimal(q * 1.5).quantize(Decimal(1), ROUND_HALF_EVEN)
                ),
                float(0 if d == 0.05 else math.copysign(1, d - 0.05)),
                nan_lane,
                -1.0 if nan_lane else r6(d),
            )
        )
    got = [
        (
            r.l_orderkey, r.l_linenumber, r.cot_v, r.fact_v, r.cbrt_v,
            r.expm1_v, r.log1p_v, r.rint_v, r.sign_v, r.is_nan, r.nanvl_v,
        )
        for r in rows
    ]
    assert sorted(got) == sorted(want)


def test_string_funcs_vs_python_str(spark):
    registry.load_all()
    rows = registry.QUERIES["string_funcs"](spark, SF).collect()
    c = _tbl("customer")
    meta = {
        int(k): (n, seg, int(nk))
        for k, n, seg, nk in zip(
            c.c_custkey, c.c_name, c.c_mktsegment, c.c_nationkey
        )
    }
    assert len(rows) == 100
    for r in rows:
        name, seg, nk = meta[r.c_custkey]
        assert r.upper_name == name.upper()
        assert r.prefix == name[:8]
        assert r.name_len == len(name)
        m = re.search(r"([0-9]+)", name)
        assert r.digits == (m.group(1) if m else "")
        assert r.seg_nat == f"{seg}:{nk}"
        assert r.seg_lower == seg.lower().strip()


def test_regexp_family_vs_python_re(spark):
    registry.load_all()
    rows = registry.QUERIES["regexp_family"](spark, SF).collect()
    p = _tbl("part")
    names = {
        int(k): n for k, n in zip(p.p_partkey, p.p_name) if k < 200
    }
    assert len(rows) == len(names)
    for r in rows:
        n = names[r.p_partkey]
        assert r.n_vowels == len(re.findall(r"[aeiou]", n))
        m = re.search(r"[a-z]{6,}", n)
        assert r.first_long == (m.group(0) if m else None)
        assert r.first_e_pos == n.find("e") + 1  # 1-based, 0 = absent
        assert r.marked == re.sub(r"([aeiou])", r"<\1>", n)


def test_stats_agg_vs_moment_formulas(spark):
    registry.load_all()
    rows = registry.QUERIES["stats_agg"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        xs = g.l_quantity.astype(float).tolist()
        ys = g.l_extendedprice.astype(float).tolist()
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        var_x = sum((x - mx) ** 2 for x in xs) / (n - 1)
        var_y = sum((y - my) ** 2 for y in ys) / (n - 1)
        cov = sum(
            (x - mx) * (y - my) for x, y in zip(xs, ys)
        ) / (n - 1)
        assert abs(r.sd_price - math.sqrt(var_y)) <= TOL4
        assert abs(r.var_qty - var_x) <= TOL4
        assert abs(r.corr_qty_price - cov / math.sqrt(var_x * var_y)) <= TOL6
        assert abs(r.covar - cov) <= TOL4


def test_haversine_rings_vs_python_trig(spark):
    registry.load_all()
    rows = registry.QUERIES["geo_haversine_rings"](spark, SF).collect()
    rings: dict = defaultdict(lambda: [0, set(), []])
    for r in _tbl("customer").itertuples():
        k = int(r.c_custkey)
        lat = float(k % 120) - 60.0 + 0.25
        lon = float((k * 7) % 360) - 180.0 + 0.25
        dist = (
            2.0
            * 6371.0
            * math.asin(
                math.sqrt(
                    math.sin(math.radians(lat) / 2) ** 2
                    + math.cos(math.radians(lat))
                    * math.cos(0.0)
                    * math.sin(math.radians(lon) / 2) ** 2
                )
            )
        )
        cell = rings[int(dist // 2000)]
        cell[0] += 1
        cell[1].add(r.c_mktsegment)
        cell[2].append(dist)
    assert {r.ring for r in rows} == set(rings)
    for r in rows:
        n, segs, ds = rings[r.ring]
        assert (r.n_customers, r.n_segments) == (n, len(segs))
        assert abs(r.ring_min_km - min(ds)) <= 2e-3
        assert abs(r.ring_max_km - max(ds)) <= 2e-3


def test_minmax_by_composite_extremes_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["minmax_by"](spark, SF).collect()
    o = _tbl("orders")
    for r in rows:
        g = o[o.o_orderpriority == r.o_orderpriority]
        pairs = list(
            zip(g.o_totalprice.astype(float), g.o_orderkey.astype(int))
        )
        assert r.biggest_order == max(pairs)[1]
        assert r.smallest_order == min(pairs)[1]
