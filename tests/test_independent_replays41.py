"""Independent-model replays, batch 41 (round 12): the remaining
relational-parity cohort with genuine data derivations — the DQ audit,
mixture weights, interval/range joins, NATURAL JOIN, the row-level
DELETE+UPDATE emulation, and date format roundtrips — each recomputed
in pandas/pure Python from raw parquet."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _r(x: float, nd: int) -> float:
    return float(
        Decimal(x).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP)
    )


def test_dq_audit_matches_pandas(spark):
    registry.load_all()
    row = registry.QUERIES["dq_audit"](spark, SF).collect()[0]
    li = _tbl("lineitem")
    o = _tbl("orders")
    orphans = set(li.l_orderkey.unique()) - set(o.o_orderkey.unique())
    assert row.n_rows == len(li)
    assert row.null_qty == int(li.l_quantity.isna().sum())
    assert row.bad_discount == int(
        ((li.l_discount < 0) | (li.l_discount > 0.5)).sum()
    )
    assert row.null_shipdate == int(li.l_shipdate.isna().sum())
    assert row.n_flags == li.l_returnflag.nunique()
    assert row.n_orphan_lines == len(orphans)


def test_mixture_weights_match_pandas(spark):
    registry.load_all()
    rows = registry.QUERIES["mixture_weights"](spark, SF).collect()
    d = _tbl("documents")
    per = {
        src: sum(len(t.split(" ")) for t in grp.text)
        for src, grp in d.groupby("source")
    }
    total, n_sources = sum(per.values()), len(per)
    want = {}
    for src, n in per.items():
        w = _r((total / n_sources) / n, 6)
        want[src] = (n, w, int(_r(n * w, 0)))
    got = {
        r.source: (r.n_tokens, r.weight, r.expected_tokens)
        for r in rows
    }
    assert got == want


def test_interval_overlap_matches_searchsorted(spark):
    import datetime as dt

    registry.load_all()
    rows = registry.QUERIES["interval_overlap_join"](spark, SF).collect()
    o = _tbl("orders")
    li = _tbl("lineitem")
    iv = o[o.o_orderkey < 1200]
    pts = np.sort(
        pd.to_datetime(
            li.loc[
                (li.l_orderkey >= 3000) & (li.l_orderkey < 4500),
                "l_shipdate",
            ]
        ).dt.date.to_numpy()
    )
    want = {}
    for k, d in zip(iv.o_orderkey, pd.to_datetime(iv.o_orderdate).dt.date):
        lo = np.searchsorted(pts, d, side="left")
        hi = np.searchsorted(pts, d + dt.timedelta(days=7), side="left")
        want[int(k)] = int(hi - lo)
    got = {r.o_orderkey: r.n_ships for r in rows}
    assert got == want


def test_range_dimension_matches_pandas_cut(spark):
    registry.load_all()
    rows = registry.QUERIES["range_dimension_lookup"](spark, SF).collect()
    o = _tbl("orders")
    brackets = (
        ("B1_small", 0, 50000),
        ("B2_mid", 50000, 150000),
        ("B3_large", 150000, 300000),
        ("B4_jumbo", 300000, 10**9),
    )
    cents = (o.o_totalprice * 100).round().astype("int64")
    want = {}
    for name, lo, hi in brackets:
        m = (o.o_totalprice >= lo) & (o.o_totalprice < hi)
        want[name] = (int(m.sum()), int(cents[m].sum()))
    got = {r.bracket: (r.n_orders, r.total_cents) for r in rows}
    assert got == want


def test_natural_join_matches_pandas_merge(spark):
    registry.load_all()
    rows = registry.QUERIES["natural_join_semantics"](spark, SF).collect()
    s = _tbl("supplier").groupby("s_nationkey").size()
    c = _tbl("customer").groupby("c_nationkey").size()
    want = {
        int(k): (int(s[k]), int(c[k]))
        for k in sorted(set(s.index) & set(c.index))
    }
    got = {r.nationkey: (r.suppliers, r.customers) for r in rows}
    assert got == want


def test_delete_update_matches_pandas(spark):
    registry.load_all()
    rows = registry.QUERIES["delete_update_emulation"](spark, SF).collect()
    o = _tbl("orders")
    o = o[(o.o_orderkey < 5000) & (o.o_orderstatus != "P")].copy()
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    urgent = o.o_orderpriority == "1-URGENT"
    o.loc[urgent, "cents"] = o.loc[urgent, "cents"] * 105 // 100
    want = {
        str(st): (len(g), int(g.cents.sum()))
        for st, g in o.groupby("o_orderstatus")
    }
    got = {r.o_orderstatus: (r.n, r.total_cents) for r in rows}
    assert got == want


def test_date_parse_matches_python_strftime(spark):
    """Third calendar engine: Python datetime strftime/strptime."""
    registry.load_all()
    rows = registry.QUERIES["date_parse_formats"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_orderkey < 400]
    dates = {
        int(k): pd.Timestamp(d).to_pydatetime()
        for k, d in zip(o.o_orderkey, o.o_orderdate)
    }
    assert len(rows) == len(dates)
    for r in rows:
        d = dates[r.o_orderkey]
        assert r.slash_form == d.strftime("%Y/%m/%d"), r.o_orderkey
        assert r.dmy_form == d.strftime("%d-%b-%Y"), r.o_orderkey
        reparsed = r.reparsed
        assert (
            reparsed.year,
            reparsed.month,
            reparsed.day,
            reparsed.hour,
        ) == (d.year, d.month, d.day, 0)
