"""Independent-model replays, batch 18 (round 11): the calendar /
radix / JSON families vs Python's own datetime, calendar, int
formatting, and json modules — the cross-engine divergence hotspots
(week starts, dayofweek numbering, months_between's /31 rule,
add_months clamping) pinned by a third calendar implementation."""

from __future__ import annotations

import calendar
import datetime as dt
import json
import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL4 = 6e-5


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _odates() -> dict[int, dt.date]:
    o = _tbl("orders")
    return {
        int(k): pd.Timestamp(d).date()
        for k, d in zip(o.o_orderkey, o.o_orderdate)
    }


def _last_day(d: dt.date) -> dt.date:
    return d.replace(day=calendar.monthrange(d.year, d.month)[1])


def _add_months(d: dt.date, n: int) -> dt.date:
    m = d.month - 1 + n
    y, m = d.year + m // 12, m % 12 + 1
    return dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))


def test_date_funcs_vs_python_datetime(spark):
    registry.load_all()
    rows = registry.QUERIES["date_funcs"](spark, SF).collect()
    dates = _odates()
    y2k = dt.date(2000, 1, 1)
    assert len(rows) == 100
    for r in rows:
        d = dates[r.o_orderkey]
        assert (r.o_year, r.o_month, r.o_day) == (d.year, d.month, d.day)
        assert pd.Timestamp(r.month_start).date() == d.replace(day=1)
        assert r.days_to_y2k == (y2k - d).days


def test_date_builtins_extended_vs_python(spark):
    registry.load_all()
    rows = registry.QUERIES["date_builtins_extended"](spark, SF).collect()
    by_year: dict = defaultdict(list)
    for d in _odates().values():
        by_year[d.year].append(d)
    assert [r.y for r in rows] == sorted(by_year)
    utc = dt.timezone.utc
    for r in rows:
        ds = by_year[r.y]
        assert r.n_orders == len(ds)
        assert r.min_epoch == int(
            dt.datetime.combine(min(ds), dt.time(), utc).timestamp()
        )
        assert pd.Timestamp(r.max_month_end).date() == max(
            _last_day(d) for d in ds
        )
        assert pd.Timestamp(r.min_plus_3m).date() == min(
            _add_months(d, 3) for d in ds
        )


def test_date_builtins_wave3_vs_python(spark):
    registry.load_all()
    rows = registry.QUERIES["date_builtins_wave3"](spark, SF).collect()
    dates = _odates()
    anchor = dt.date(2023, 1, 15)
    for r in rows:
        d = dates[r.o_orderkey]
        # months_between: equal day-of-month → integer, else /31 rule
        mb = (
            (d.year - anchor.year) * 12
            + (d.month - anchor.month)
            + (d.day - anchor.day) / 31.0
        )
        assert abs(r.mb_anchor - mb) <= TOL4
        # next Monday STRICTLY after d (Python weekday: Monday = 0)
        days = (0 - d.weekday()) % 7 or 7
        assert pd.Timestamp(r.next_monday).date() == d + dt.timedelta(
            days=days
        )
        assert r.iso_week == d.isocalendar()[1]
        assert r.qtr == (d.month - 1) // 3 + 1
        # Spark dayofweek: Sunday = 1 … Saturday = 7
        assert r.dow == (d.weekday() + 1) % 7 + 1


def test_date_trunc_week_quarter_vs_python(spark):
    registry.load_all()
    rows = registry.QUERIES["date_trunc_variants"](spark, SF).collect()
    cells: dict = defaultdict(int)
    for d in _odates().values():
        wk = d - dt.timedelta(days=d.weekday())  # ISO Monday start
        qtr = dt.date(d.year, 3 * ((d.month - 1) // 3) + 1, 1)
        cells[(wk, qtr)] += 1
    got = {
        (pd.Timestamp(r.wk).date(), pd.Timestamp(r.qtr).date()): r.n
        for r in rows
    }
    assert got == dict(cells)


def test_try_cast_family_vs_python(spark):
    registry.load_all()
    rows = registry.QUERIES["try_cast_family"](spark, SF).collect()
    o = _tbl("orders")
    meta = {
        int(k): (s, p)
        for k, s, p in zip(
            o.o_orderkey, o.o_orderstatus, o.o_orderpriority
        )
        if k < 500
    }
    assert len(rows) == len(meta)
    for r in rows:
        status, prio = meta[r.o_orderkey]
        assert r.bad_cast is None  # 'x' + status never parses
        assert r.narrow_cast == r.o_orderkey  # < 500 fits smallint
        first = prio[0]
        assert r.prio_digit == (int(first) if first.isdigit() else None)


def test_conv_bases_vs_python_format(spark):
    registry.load_all()
    rows = registry.QUERIES["conv_bases"](spark, SF).collect()
    ks = sorted(
        int(k) for k in _tbl("orders").o_orderkey if 0 < k < 600
    )
    assert [r.o_orderkey for r in rows] == ks
    for r in rows:
        k = r.o_orderkey
        assert r.hex == format(k, "X")
        assert r.bin == format(k, "b")
        assert r.oct == format(k, "o")


def test_json_extract_vs_python_json(spark):
    registry.load_all()
    rows = registry.QUERIES["json_extract"](spark, SF).collect()
    ev = _tbl("events")
    agg: dict = defaultdict(list)
    n_by: dict = defaultdict(int)
    for t, props in zip(ev.event_type, ev.props):
        n_by[t] += 1
        k = json.loads(props).get("k") if props else None
        if k is not None:
            agg[t].append(int(k))
    assert [r.event_type for r in rows] == sorted(n_by)
    for r in rows:
        ks = agg[r.event_type]
        assert r.n == n_by[r.event_type]
        assert r.sum_k == sum(ks)
        assert r.min_k == min(ks)
