"""Independent-model replays, batch 29 (round 11): pivot/unpivot
reshaping, posexplode positions, typed JSON aggregation, the mask()
redaction rules rebuilt with str.translate, and daily time buckets —
all recomputed with dict counters and stdlib string machinery."""

from __future__ import annotations

import json
import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3
TOL4 = 6e-5


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_pivot_orders_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["pivot_orders"](spark, SF).collect()
    o = _tbl("orders")
    cells: dict = defaultdict(int)
    for st, pr in zip(o.o_orderstatus, o.o_orderpriority):
        cells[(st, pr)] += 1
    cols = [
        ("urgent", "1-URGENT"), ("high", "2-HIGH"),
        ("medium", "3-MEDIUM"), ("notspec", "4-NOT SPECIFIED"),
        ("low", "5-LOW"),
    ]
    assert [r.o_orderstatus for r in rows] == sorted(
        o.o_orderstatus.unique()
    )
    for r in rows:
        for name, prio in cols:
            assert r[name] == cells[(r.o_orderstatus, prio)], name


def test_unpivot_part_measures_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["unpivot_part_measures"](spark, SF).collect()
    p = _tbl("part")
    want = []
    for k, sz, rp in zip(p.p_partkey, p.p_size, p.p_retailprice):
        want.append((int(k), "retailprice", float(rp)))
        want.append((int(k), "size", float(sz)))
    got = [(r.p_partkey, r.measure, r.value) for r in rows]
    assert sorted(got) == sorted(want)


def test_posexplode_positions_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["posexplode_tokens"](spark, SF).collect()
    d = _tbl("documents")
    want = []
    for i, t in zip(d.doc_id, d.text):
        if i < 20:
            for pos, tok in enumerate(t.split(" ")):
                want.append((int(i), pos, tok))
    got = [(r.doc_id, r.pos, r.token) for r in rows]
    assert sorted(got) == sorted(want)


def test_typed_json_aggregation_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["typed_json"](spark, SF).collect()
    ev = _tbl("events")
    per: dict = defaultdict(list)
    for t, props in zip(ev.event_type, ev.props):
        k = json.loads(props).get("k") if props else None
        if k is not None:
            per[t].append(int(k))
    for r in rows:
        ks = per[r.event_type]
        assert r.n_high == sum(1 for k in ks if k >= 50)
        assert abs(r.avg_k - sum(ks) / len(ks)) <= TOL4


def test_mask_rules_vs_str_translate(spark):
    registry.load_all()
    rows = registry.QUERIES["mask_funcs"](spark, SF).collect()
    c = _tbl("customer")
    names = {
        int(k): n for k, n in zip(c.c_custkey, c.c_name) if k < 200
    }

    def mask(s: str, up, lo, dig):
        out = []
        for ch in s:
            if ch.isupper():
                out.append(up if up else ch)
            elif ch.islower():
                out.append(lo if lo else ch)
            elif ch.isdigit():
                out.append(dig if dig else ch)
            else:
                out.append(ch)
        return "".join(out)

    assert len(rows) == len(names)
    for r in rows:
        n = names[r.c_custkey]
        assert r.masked_default == mask(n, "X", "x", "n")
        assert r.masked_custom == mask(n, "U", "l", "#")
        assert r.digits_only == mask(n, None, None, "*")


def test_time_bucket_agg_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["time_bucket_agg"](spark, SF).collect()
    ev = _tbl("events")
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    ev["day"] = ev.ts.dt.floor("D")
    cells: dict = defaultdict(lambda: [0, 0.0])
    for day, t, v in zip(ev.day, ev.event_type, ev.value):
        cells[(day, t)][0] += 1
        cells[(day, t)][1] += float(v)
    got = {
        (pd.Timestamp(r.day), r.event_type): (r.n, r.total_value)
        for r in rows
    }
    assert set(got) == set(cells)
    for k, (n, tv) in got.items():
        assert n == cells[k][0]
        assert abs(tv - cells[k][1]) <= TOL2
