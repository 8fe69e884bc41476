"""Independent-model replays, batch 22 (round 11): timezone
conversions vs Python's zoneinfo (a third tz database consumer),
calendar-clamped interval arithmetic, the codec string family vs the
base64/str stdlib, extended string functions, and the higher-order
array predicate quartet vs list comprehensions."""

from __future__ import annotations

import base64
import calendar
import datetime as dt
import re
from zoneinfo import ZoneInfo

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_timezone_conversions_vs_zoneinfo(spark):
    registry.load_all()
    rows = registry.QUERIES["timezone_conversions"](spark, SF).collect()
    ev = _tbl("events")
    ev["ts"] = pd.to_datetime(ev.ts).dt.floor("us")
    stamps = {
        int(i): t.to_pydatetime()
        for i, t in zip(ev.event_id, ev.ts)
        if i < 2000
    }
    utc = dt.timezone.utc
    ny, tokyo = ZoneInfo("America/New_York"), ZoneInfo("Asia/Tokyo")
    assert len(rows) == len(stamps)
    for r in rows:
        t = stamps[r.event_id]
        ny_wall = t.replace(tzinfo=utc).astimezone(ny).replace(tzinfo=None)
        assert pd.Timestamp(r.ny_ts).to_pydatetime() == ny_wall
        assert r.tokyo_hour == (
            t.replace(tzinfo=utc).astimezone(tokyo).hour
        )
        assert r.roundtrip_ok


def test_interval_arithmetic_calendar_clamp_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["interval_arithmetic"](spark, SF).collect()
    o = _tbl("orders")
    dates = {
        int(k): pd.Timestamp(d).date()
        for k, d in zip(o.o_orderkey, o.o_orderdate)
        if k < 400
    }
    assert len(rows) == len(dates)
    for r in rows:
        d = dates[r.o_orderkey]
        m = d.month - 1 + 3
        y, m = d.year + m // 12, m % 12 + 1
        plus3m = dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))
        due = plus3m + dt.timedelta(days=10)
        assert pd.Timestamp(r.due_ts).date() == due
        assert r.days_to_eoy == (dt.date(2024, 12, 31) - d).days
        assert r.months_to_2025 == 12 * (2024 - d.year) + (12 - d.month)


def test_string_codec_family_vs_stdlib(spark):
    registry.load_all()
    rows = registry.QUERIES["string_funcs_codec"](spark, SF).collect()
    d = _tbl("documents")
    texts = {int(i): t for i, t in zip(d.doc_id, d.text) if i < 200}
    tr = str.maketrans("aeiou", "01234")
    assert len(rows) == len(texts)
    for r in rows:
        t = texts[r.doc_id]
        assert r.devoweled == t[:30].translate(tr)
        assert r.first_code == ord(t[0])
        assert r.row_letter == chr(65 + r.doc_id % 26)
        assert r.head_b64 == base64.b64encode(t[:12].encode()).decode()
        assert r.head_back == t[:12]
        parts = t.split(" ")
        assert r.first_three == (
            t if len(parts) <= 3 else " ".join(parts[:3])
        )


def test_string_funcs_extended_vs_stdlib(spark):
    registry.load_all()
    rows = registry.QUERIES["string_funcs_extended"](spark, SF).collect()
    p = _tbl("part")
    meta = {
        int(k): (n, b, ty, int(sz))
        for k, n, b, ty, sz in zip(
            p.p_partkey, p.p_name, p.p_brand, p.p_type, p.p_size
        )
    }
    assert len(rows) == 200
    for r in rows:
        name, brand, ptype, size = meta[r.p_partkey]
        assert r.size_padded == str(size).rjust(4, "0")
        assert r.brand_padded == brand.ljust(10, ".")
        assert r.name_snake == name.replace(" ", "_")
        assert r.brand_rev == brand[::-1]
        assert r.type_2x == ptype[:2] * 2
        assert r.space_at == name.find(" ") + 1
        assert r.first_word == name.split(" ")[0]


def test_array_exists_forall_vs_comprehensions(spark):
    registry.load_all()
    rows = registry.QUERIES["array_exists_forall"](spark, SF).collect()
    p = _tbl("part")
    names = {
        int(k): n.split(" ")
        for k, n in zip(p.p_partkey, p.p_name)
        if k < 2000
    }
    assert len(rows) == len(names)
    for r in rows:
        w = names[r.p_partkey]
        assert r.any_long == any(len(x) > 6 for x in w)
        assert r.all_alpha == all(re.fullmatch(r"[a-z]+", x) for x in w)
        assert r.n_even_pos == sum(1 for i in range(len(w)) if i % 2 == 1)
        assert r.len_sum_x10 == sum(len(x) for x in w) * 10
