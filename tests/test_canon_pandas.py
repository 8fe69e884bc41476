"""Unit lockstep for the pandas-path canonicalizer
(tools/check_oracle.canon_pdf) — the local replica of the driver's
value compare. Pins BOTH directions: the dtype coercions that must
FAIL (HUGEINT→float64 vs int64 — the r7 red-row mechanism) and the
renderings that must MATCH (Spark date object vs DuckDB midnight
datetime64 — driver-green since r1)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd

from tools.check_oracle import canon_pdf


def test_int64_vs_float64_mismatch():
    """103 (int64) and 103.0 (float64) must NOT canonicalize equal —
    this is exactly what fetchall() masked in r7."""
    a = pd.DataFrame({"n": pd.array([103], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([103.0], dtype="float64")})
    assert canon_pdf(a) != canon_pdf(b)


def test_date_object_equals_midnight_timestamp():
    """Spark renders DATE as object datetime.date; DuckDB .df()
    renders it as datetime64 midnight — driver-green equivalence."""
    a = pd.DataFrame({"d": [datetime.date(2020, 1, 5)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2020-01-05"])})
    assert canon_pdf(a) == canon_pdf(b)


def test_nonmidnight_timestamp_still_distinct_from_date():
    a = pd.DataFrame({"d": [datetime.date(2020, 1, 5)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2020-01-05 01:00:00"])})
    assert canon_pdf(a) != canon_pdf(b)


def test_nat_matches_across_renderings():
    a = pd.DataFrame({"d": pd.to_datetime([None])})
    b = pd.DataFrame({"d": [pd.NaT]})
    assert canon_pdf(a) == canon_pdf(b)


def test_ndarray_cell_equals_list_cell():
    """Array columns: Spark toPandas yields ndarray cells, DuckDB
    yields lists — containers canonicalize structurally."""
    a = pd.DataFrame({"v": [np.array([1, 2, 3])]})
    b = pd.DataFrame({"v": [[1, 2, 3]]})
    assert canon_pdf(a) == canon_pdf(b)


def test_float_rounding_and_negzero():
    a = pd.DataFrame({"x": [0.1234564999, -0.0]})
    b = pd.DataFrame({"x": [0.123456, 0.0]})
    assert canon_pdf(a) == canon_pdf(b)


def test_column_order_insensitive_row_order_insensitive():
    a = pd.DataFrame({"x": [1, 2], "y": ["b", "a"]})
    b = pd.DataFrame({"y": ["a", "b"], "x": [2, 1]})
    assert canon_pdf(a) == canon_pdf(b)


def test_bytearray_cell_equals_bytes_cell():
    """Binary columns: Spark toPandas yields bytearray cells, DuckDB
    .df() yields bytes — same value, container canonicalized (the
    ndarray-vs-list rule applied to binary; r8 advice)."""
    a = pd.DataFrame({"b": [bytearray(b"\x01\x02")]})
    b = pd.DataFrame({"b": [b"\x01\x02"]})
    assert canon_pdf(a) == canon_pdf(b)
    c = pd.DataFrame({"b": [b"\x01\x03"]})
    assert canon_pdf(a) != canon_pdf(c)


def test_nan_distinct_from_none_object():
    """Strictness preserved where the driver is strict: float NaN in a
    numeric column vs None in an object column stay distinct."""
    a = pd.DataFrame({"x": pd.array([np.nan], dtype="float64")})
    b = pd.DataFrame({"x": pd.Series([None], dtype="object")})
    assert canon_pdf(a) != canon_pdf(b)
