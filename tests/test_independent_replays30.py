"""Independent-model replays, batch 30 (round 11): the streaming
family — each query runs a REAL Structured Streaming job to
completion, and here its drained result is recomputed in pandas
(windowed counts, >=-gap sessions, the watermarked interval join as a
double loop, dedup, static enrichment, the foreachBatch upsert's
final state, and the late-data drop expectation) — a third engine on
top of the batch-SQL oracles."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3


def _events() -> pd.DataFrame:
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    return ev


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def test_stream_windowed_counts_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stream_windowed_counts"](spark, SF).collect()
    ev = _events()
    ev["day"] = ev.ts.dt.floor("D")
    cells: dict = defaultdict(lambda: [0, 0.0])
    for d, t, v in zip(ev.day, ev.event_type, ev.value):
        cells[(d, t)][0] += 1
        cells[(d, t)][1] += float(v)
    got = {
        (pd.Timestamp(r.day), r.event_type): (r.n, r.total_value)
        for r in rows
    }
    assert set(got) == set(cells)
    for k, (n, tv) in got.items():
        assert n == cells[k][0] and abs(tv - cells[k][1]) <= TOL2


def test_stream_sessionization_gap_ge_replay(spark):
    """session_window closes at gap >= threshold — the replay uses
    the literal >= scan, distinct from batch sessionization's >."""
    registry.load_all()
    rows = registry.QUERIES["stream_sessionization"](spark, SF).collect()
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(seconds=1800)
    want = []
    for uid, g in ev.groupby("user_id"):
        start = None
        n = 0
        last = None
        for ts in g.ts:
            if last is None or ts - last >= gap:
                if start is not None:
                    want.append((int(uid), n, _us(start)))
                start, n = ts, 0
            n += 1
            last = ts
        want.append((int(uid), n, _us(start)))
    want.sort(key=lambda t: (t[0], t[2]))
    assert [(r.user_id, r.n_events, r.start_us) for r in rows] == want


def test_stream_stateful_user_agg_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stream_stateful_user_agg"](spark, SF).collect()
    ev = _events()
    g = ev.groupby("user_id")["value"].agg(["size", "sum"])
    assert [r.user_id for r in rows] == sorted(g.index.astype(int))
    for r in rows:
        assert r.n_events == int(g.loc[r.user_id, "size"])
        assert abs(r.total_value - g.loc[r.user_id, "sum"]) <= TOL2


def test_stream_stream_interval_join_double_loop_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stream_stream_join"](spark, SF).collect()
    ev = _events()
    hour = pd.Timedelta(hours=1)
    views: dict = defaultdict(list)
    buys: dict = defaultdict(list)
    for u, t, ts in zip(ev.user_id, ev.event_type, ev.ts):
        if t == "view":
            views[int(u)].append(ts)
        elif t == "purchase":
            buys[int(u)].append(ts)
    counts = {
        u: sum(
            1
            for v in vs
            for p in buys.get(u, ())
            if v <= p <= v + hour
        )
        for u, vs in views.items()
    }
    want = sorted((u, n) for u, n in counts.items() if n > 0)
    assert [(r.user_id, r.n_pairs) for r in rows] == want


def test_stream_dedup_and_type_totals_replay(spark):
    registry.load_all()
    ev = _events()
    per_type = ev.groupby("event_type")["value"].agg(["size", "sum"])
    distinct_users = ev.groupby("event_type")["user_id"].nunique()

    rows = registry.QUERIES["stream_dedup"](spark, SF).collect()
    assert [(r.event_type, r.n_users) for r in rows] == [
        (t, int(n)) for t, n in distinct_users.sort_index().items()
    ]
    # three independent drain paths must all equal the same totals
    for name in (
        "stream_dedup_within_watermark",
        "stream_trigger_available_now",
        "stream_parquet_sink",
    ):
        rows = registry.QUERIES[name](spark, SF).collect()
        assert [r.event_type for r in rows] == sorted(per_type.index)
        for r in rows:
            assert r.n == int(per_type.loc[r.event_type, "size"]), name
            assert (
                abs(r.total_value - per_type.loc[r.event_type, "sum"])
                <= TOL2
            ), name


def test_stream_static_join_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stream_static_join"](spark, SF).collect()
    ev = _events()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    seg = c.set_index("c_custkey")["c_mktsegment"]
    ev = ev[ev.user_id.astype(int).isin(set(seg.index.astype(int)))]
    g = ev.assign(seg=ev.user_id.map(seg)).groupby("seg")["value"].agg(
        ["size", "sum"]
    )
    assert [r.c_mktsegment for r in rows] == sorted(g.index)
    for r in rows:
        assert r.n == int(g.loc[r.c_mktsegment, "size"])
        assert abs(r.total_value - g.loc[r.c_mktsegment, "sum"]) <= TOL2


def test_stream_foreachbatch_upsert_final_state_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stream_foreachbatch_upsert"](spark, SF).collect()
    ev = _events()
    g = ev.groupby("user_id").agg(
        n=("value", "size"), v=("value", "sum"), last=("ts", "max")
    )
    assert [r.user_id for r in rows] == sorted(g.index.astype(int))
    for r in rows:
        assert r.n_events == int(g.loc[r.user_id, "n"])
        assert abs(r.total_value - g.loc[r.user_id, "v"]) <= TOL2
        assert pd.Timestamp(r.last_ts) == g.loc[r.user_id, "last"]


def test_stream_late_data_drop_expectation_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["stream_late_data"](spark, SF).collect()
    ev = _events()
    max_day = ev.ts.max().floor("D")
    keep = ev[
        (ev.ts >= pd.Timestamp("2024-01-03"))
        & (ev.ts.dt.floor("D") < max_day)
    ]
    cells: dict = defaultdict(lambda: [0, 0.0])
    for d, v in zip(keep.ts.dt.floor("D"), keep.value):
        cells[d][0] += 1
        cells[d][1] += float(v)
    assert [pd.Timestamp(r.day) for r in rows] == sorted(cells)
    for r in rows:
        n, tv = cells[pd.Timestamp(r.day)]
        assert r.n == n and abs(r.total_value - tv) <= TOL2
