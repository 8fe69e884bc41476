"""Independent-model replays, batch 13 (round 11): the as-of joins
replayed through pandas.merge_asof (a genuinely independent as-of
implementation — the shipped operator is union+carry-forward, the
oracle is DuckDB ASOF, this is a third), Levenshtein against a
from-scratch DP, the core window family against pandas
cumsum/rolling/shift, and gaps-and-islands / retention against direct
Python scans that never use the date-minus-row_number trick the
shipped plan and oracle share."""

from __future__ import annotations

import datetime as dt
import re
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL4 = 6e-5
TOL2 = 6e-3


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _events_us() -> pd.DataFrame:
    ev = _tbl("events")
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    return ev


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def test_asof_backward_vs_pandas_merge_asof(spark):
    registry.load_all()
    rows = registry.QUERIES["asof_join_events_orders"](
        spark, SF
    ).collect()
    ev = _events_us()
    p = ev[ev.event_type == "purchase"][
        ["user_id", "event_id", "ts"]
    ].sort_values("ts")
    v = (
        ev[ev.event_type == "view"][["user_id", "event_id", "ts"]]
        .rename(columns={"event_id": "view_event_id", "ts": "view_ts"})
        .sort_values("view_ts")
    )
    m = pd.merge_asof(
        p,
        v,
        left_on="ts",
        right_on="view_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.event_id): (
            int(r.user_id),
            _us(r.ts),
            None if pd.isna(r.view_event_id) else int(r.view_event_id),
            None if pd.isna(r.view_ts) else _us(r.view_ts),
        )
        for r in m.itertuples()
    }
    assert len(rows) == len(want)
    for r in rows:
        assert (
            r.user_id, r.purchase_us, r.prior_view_id, r.prior_view_us
        ) == want[r.event_id]


def test_asof_forward_vs_pandas_merge_asof(spark):
    registry.load_all()
    rows = registry.QUERIES["asof_join_forward"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 100][["o_orderkey", "o_custkey"]].assign(
        t=pd.to_datetime(_tbl("orders").loc[lambda d: d.o_custkey < 100, "o_orderdate"])
    )
    ev = _events_us()
    e = ev[ev.user_id < 100][["user_id", "value", "ts"]].sort_values("ts")
    m = pd.merge_asof(
        o.sort_values("t"),
        e,
        left_on="t",
        right_on="ts",
        left_by="o_custkey",
        right_by="user_id",
        direction="forward",
        allow_exact_matches=True,
    )
    want = {
        int(r.o_orderkey): (
            0 if pd.isna(r.value) else 1,
            -1.0 if pd.isna(r.value) else float(r.value),
        )
        for r in m.itertuples()
    }
    assert len(rows) == len(want)
    for r in rows:
        has, val = want[r.o_orderkey]
        assert r.has_next == has
        assert abs(r.next_value - round(val, 2)) <= TOL2


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_levenshtein_vs_python_dp(spark):
    registry.load_all()
    rows = registry.QUERIES["fuzzy_match"](spark, SF).collect()
    p = _tbl("part")
    names = {
        int(k): n for k, n in zip(p.p_partkey, p.p_name) if k < 300
    }
    brands = {
        int(k): b for k, b in zip(p.p_partkey, p.p_brand) if k < 300
    }
    assert len(rows) == len(names)
    for r in rows:
        toks = names[r.p_partkey].split(" ")
        assert r.lev_within == _lev(toks[0], toks[1])
        assert r.lev_brand == _lev(brands[r.p_partkey], "Brand#1")
        assert r.long_words == "\x1f".join(
            re.findall(r"[a-z]{4,}", names[r.p_partkey])
        )


def test_window_family_vs_pandas(spark):
    registry.load_all()
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)

    # running sum
    rows = registry.QUERIES["window_running_sum"](spark, SF).collect()
    o_s = o.sort_values(["d", "o_orderkey"])
    run = o_s.groupby("o_custkey")["o_totalprice"].cumsum()
    want = dict(zip(o_s.o_orderkey.astype(int), run))
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r.running_spend - want[r.o_orderkey]) <= TOL2

    # lag delta
    rows = registry.QUERIES["window_lag_delta"](spark, SF).collect()
    prev = o_s.groupby("o_custkey")["d"].shift()
    delta = (o_s.d - prev).dt.days
    want = dict(zip(o_s.o_orderkey.astype(int), delta))
    for r in rows:
        w = want[r.o_orderkey]
        if pd.isna(w):
            assert r.days_since_prev is None
        else:
            assert r.days_since_prev == int(w)

    # top-3 per priority
    rows = registry.QUERIES["window_topk_per_group"](spark, SF).collect()
    got = [(r.o_orderpriority, r.o_orderkey, r.rn) for r in rows]
    want_rows = []
    for pr, g in o.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).groupby("o_orderpriority"):
        for i, k in enumerate(g.o_orderkey.head(3), 1):
            want_rows.append((pr, int(k), i))
    assert sorted(got) == sorted(want_rows)


def test_moving_avg_vs_pandas_rolling(spark):
    registry.load_all()
    rows = registry.QUERIES["window_moving_avg"](spark, SF).collect()
    ev = _events_us().sort_values(["ts", "event_id"])
    mov = ev.groupby("user_id")["value"].transform(
        lambda s: s.rolling(4, min_periods=1).mean()
    )
    want = dict(zip(ev.event_id.astype(int), mov))
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r.mov_avg - want[r.event_id]) <= TOL4


def test_streak_islands_direct_scan_replay(spark):
    """Both the plan and oracle use the date-minus-row_number trick;
    the replay walks the sorted day list and counts runs directly."""
    registry.load_all()
    rows = registry.QUERIES["streak_islands"](spark, SF).collect()
    ev = _events_us()
    ev["day"] = ev.ts.dt.floor("D").dt.date
    days_by_user: dict = defaultdict(set)
    for u, d in zip(ev.user_id, ev.day):
        days_by_user[int(u)].add(d)
    assert {r.user_id for r in rows} == set(days_by_user)
    for r in rows:
        ds = sorted(days_by_user[r.user_id])
        streaks = []
        run = 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                run += 1
            else:
                streaks.append(run)
                run = 1
        streaks.append(run)
        assert r.max_streak == max(streaks)
        assert r.n_streaks == len(streaks)
        assert r.active_days == len(ds)


def test_sequence_gaps_direct_scan_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["sequence_gap_detection"](spark, SF).collect()
    ks = sorted(
        {
            int(k)
            for k in _tbl("orders").o_orderkey
            if k < 3000 and k % 97 != 0
        }
    )
    want = [
        (a, b - a - 1) for a, b in zip(ks, ks[1:]) if b - a > 1
    ]
    assert [(r.gap_after, r.missing) for r in rows] == want
    assert rows, "the punched holes must make the detector fire"


def test_retention_cohorts_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["retention_cohorts"](spark, SF).collect()
    ev = _events_us()
    ev["day"] = ev.ts.dt.floor("D")
    acts = ev[["user_id", "day"]].drop_duplicates()
    cohort = acts.groupby("user_id")["day"].min().rename("c")
    j = acts.join(cohort, on="user_id")
    cells = (
        j.groupby(["c", (j.day - j.c).dt.days]).size().to_dict()
    )
    got = {
        (pd.Timestamp(r.cohort_day), r.day_offset): r.n_users
        for r in rows
    }
    assert got == {(c, int(off)): int(n) for (c, off), n in cells.items()}
