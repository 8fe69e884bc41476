"""Independent-model replays, batch 35 (round 11): hopping-window
assignment arithmetic done by hand (each event placed in exactly its
two epoch-aligned 1-day/12-hour windows), the batch session_window
twin with its [start, last+gap) end bound, the correlated scalar
SELECT as a plain dict lookup, and full-outer-join classification."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3

HOP_US = 12 * 3600 * 1_000_000
DAY_US = 24 * 3600 * 1_000_000


def _events_us() -> pd.DataFrame:
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    # dtype after floor("us") is datetime64[us]; normalize through ns
    ev["us"] = ev.ts.astype("datetime64[ns]").astype("int64") // 1_000
    return ev


def test_hopping_window_assignment_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["window_sliding_hop"](spark, SF).collect()
    ev = _events_us()
    cells: dict = defaultdict(lambda: [0, 0.0])
    for us, v in zip(ev.us, ev.value):
        # the two epoch-aligned hops containing this event
        last_start = (us // HOP_US) * HOP_US
        for start in (last_start, last_start - HOP_US):
            if start <= us < start + DAY_US:
                cells[start][0] += 1
                cells[start][1] += float(v)
    got = {
        int(pd.Timestamp(r.w_start).value // 1_000): (
            r.n, r.total_value,
        )
        for r in rows
    }
    assert set(got) == set(cells)
    for k, (n, tv) in got.items():
        assert n == cells[k][0]
        assert abs(tv - cells[k][1]) <= TOL2
    # every event must land in exactly two windows
    assert sum(n for n, _ in cells.values()) == 2 * len(ev)


def test_batch_session_window_end_bound_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["batch_session_window"](spark, SF).collect()
    ev = _events_us().sort_values(["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000
    want = []
    for uid, g in ev.groupby("user_id"):
        start = None
        last = None
        n = 0
        for us in g.us:
            if last is None or us - last >= gap_us:
                if start is not None:
                    want.append((int(uid), start, last + gap_us, n))
                start, n = int(us), 0
            n += 1
            last = int(us)
        want.append((int(uid), start, last + gap_us, n))
    want.sort(key=lambda t: (t[0], t[1]))
    assert [
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in rows
    ] == want


def test_correlated_scalar_select_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["correlated_scalar_select"](spark, SF).collect()
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    bulk = (
        li[li.l_quantity > 25].groupby("l_orderkey").size()
    )
    keep = o[o.o_orderkey < 2000].sort_values("o_orderkey")
    assert [r.o_orderkey for r in rows] == keep.o_orderkey.astype(int).tolist()
    for r in rows:
        assert r.n_bulk_items == int(bulk.get(r.o_orderkey, 0))


def test_full_outer_join_both_sides_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["full_outer_join"](spark, SF).collect()
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    o["day"] = pd.to_datetime(o.o_orderdate).dt.floor("D")
    urgent = o[o.o_orderpriority == "1-URGENT"].groupby("day").size()
    big = o[o.o_totalprice > 400000].groupby("day").size()
    days = sorted(set(urgent.index) | set(big.index))
    want = [
        (
            d,
            int(urgent.get(d, 0)),
            int(big.get(d, 0)),
            d not in urgent.index or d not in big.index,
        )
        for d in days
    ]
    assert [
        (pd.Timestamp(r.day), r.n_urgent, r.n_big, r.one_sided)
        for r in rows
    ] == want
    # both unmatched sides must actually occur, else the test is vacuous
    assert any(w[1] == 0 for w in want) and any(w[2] == 0 for w in want)
