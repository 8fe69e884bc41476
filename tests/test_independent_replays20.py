"""Independent-model replays, batch 20 (round 11): the ETL / change-
data-capture semantics cluster — MERGE upsert, last-writer-wins CDC
collapse, SCD2 version intervals, high-watermark increments, snapshot
diff classification, MDM survivorship, and the order-insensitive
table checksum rebuilt digit-for-digit with hashlib — replayed as
direct dict/scan algorithms with no joins or windows."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL2 = 6e-3


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_merge_upsert_source_wins_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["merge_upsert"](spark, SF).collect()
    o = _tbl("orders")
    o["d"] = pd.to_datetime(o.o_orderdate)
    target = o[o.d < pd.Timestamp("1999-01-01")]
    source = o[o.d >= pd.Timestamp("1998-01-01")]
    merged: dict = {}
    for r in target.itertuples():
        merged[int(r.o_orderkey)] = (r.o_orderstatus, float(r.o_totalprice))
    for r in source.itertuples():  # source wins
        merged[int(r.o_orderkey)] = (
            r.o_orderstatus, float(r.o_totalprice) * 1.1,
        )
    agg: dict = defaultdict(lambda: [0, 0.0])
    for status, price in merged.values():
        agg[status][0] += 1
        agg[status][1] += price
    assert [r.o_orderstatus for r in rows] == sorted(agg)
    for r in rows:
        n, total = agg[r.o_orderstatus]
        assert r.n == n
        assert abs(r.total - total) <= TOL2


def test_cdc_last_writer_wins_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["cdc_apply_changes"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 50]
    last: dict = {}
    for r in o.itertuples():
        k = int(r.o_orderkey)
        key = (pd.Timestamp(r.o_orderdate), k)  # (ts, seq) recency
        op = "D" if k % 11 == 0 else "U"
        if k not in last or key > last[k][0]:
            last[k] = (key, op, r.o_orderpriority)
    want = sorted(
        (k, val) for k, (_, op, val) in last.items() if op != "D"
    )
    assert [(r.k, r.val) for r in rows] == want


def test_scd2_version_intervals_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["scd2_dimension"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_custkey < 100].copy()
    o["od"] = pd.to_datetime(o.o_orderdate)
    want = []
    sentinel = pd.Timestamp("2200-01-01")
    for ck, g in o.sort_values(["od", "o_orderkey"]).groupby("o_custkey"):
        versions = []
        prev = None
        for r in g.itertuples():
            if prev is None or r.o_orderpriority != prev:
                versions.append((r.o_orderpriority, r.od))
            prev = r.o_orderpriority
        for i, (attr, vf) in enumerate(versions):
            vt = versions[i + 1][1] if i + 1 < len(versions) else sentinel
            want.append(
                (int(ck), attr, vf, vt, i + 1 == len(versions))
            )
    got = [
        (
            r.o_custkey,
            r.attr,
            pd.Timestamp(r.valid_from),
            pd.Timestamp(r.valid_to),
            r.is_current,
        )
        for r in rows
    ]
    assert sorted(got) == sorted(want)


def test_high_watermark_increment_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["incremental_high_watermark"](spark, SF).collect()
    ev = _tbl("events")
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    wm = ev.ts.max() - pd.Timedelta(days=7)
    inc = ev[ev.ts > wm]
    g = inc.groupby("event_type").agg(n=("value", "size"), v=("value", "sum"))
    assert [r.event_type for r in rows] == sorted(g.index)
    for r in rows:
        assert r.n_new == int(g.loc[r.event_type, "n"])
        assert abs(r.value_new - g.loc[r.event_type, "v"]) <= TOL2


def test_snapshot_diff_classification_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["snapshot_diff"](spark, SF).collect()

    def r2(x: float) -> float:
        return math.floor(x * 100 + 0.5) / 100

    o = _tbl("orders")
    old = {
        int(r.o_orderkey): (r.o_orderstatus, r2(float(r.o_totalprice)))
        for r in o.itertuples()
        if r.o_orderkey < 4000
    }
    new = {
        int(r.o_orderkey): (
            r.o_orderstatus,
            r2(
                float(r.o_totalprice)
                * (1.1 if r.o_orderkey % 10 == 0 else 1.0)
            ),
        )
        for r in o.itertuples()
        if r.o_orderkey < 4500 and r.o_orderkey % 7 != 0
    }
    counts: dict = defaultdict(int)
    for k in old.keys() | new.keys():
        if k not in old:
            counts["insert"] += 1
        elif k not in new:
            counts["delete"] += 1
        elif old[k] != new[k]:
            counts["update"] += 1
        else:
            counts["unchanged"] += 1
    assert {r.change: r.n for r in rows} == dict(counts)


def test_survivorship_per_field_recency_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["survivorship_golden_record"](spark, SF).collect()
    ev = _tbl("events")
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    per_user: dict = defaultdict(list)
    for r in ev.itertuples():
        per_user[int(r.user_id)].append(r)
    assert {r.user_id for r in rows} == set(per_user)
    for row in rows:
        evs = sorted(
            per_user[row.user_id],
            key=lambda r: (r.ts, r.event_id),
            reverse=True,
        )
        last_action = next(
            (r.event_type for r in evs if r.event_type != "error"), None
        )
        big = next(
            (float(r.value) for r in evs if r.value > 100), None
        )
        assert row.last_seen_us == int(evs[0].ts.value // 1_000)
        assert row.last_action == last_action
        want_big = 0.0 if big is None else big
        assert abs(row.last_big_value - round(want_big, 2)) <= TOL2
        assert row.n_sources == len(evs)


def test_table_checksum_rebuilt_with_hashlib(spark):
    registry.load_all()
    row = registry.QUERIES["table_checksum_audit"](spark, SF).collect()[0]
    o = _tbl("orders")
    total = 0
    for r in o.itertuples():
        cents = int(math.floor(float(r.o_totalprice) * 100 + 0.5))
        s = "|".join(
            [
                str(int(r.o_orderkey)),
                str(int(r.o_custkey)),
                r.o_orderstatus,
                f"{cents // 100}.{cents % 100:02d}",
                r.o_orderpriority,
                str(pd.Timestamp(r.o_orderdate).date()),
            ]
        )
        total += int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert row.n_rows == len(o)
    assert int(row.content_checksum) == total
