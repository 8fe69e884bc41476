"""§2.1 relational core: every query runs at sf0.001, matches its DuckDB
oracle, and keeps its scale-critical plan shape."""

from __future__ import annotations

from tests.conftest import oracle_compare

import __spark_entry__ as entrymod
from hdsp_hive_release_src_spark import registry
from hdsp_hive_release_src_spark.plans import (
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
)

registry.load_all()

# r17 (r16 verdict item 1 — the suite outgrew the driver's pytest
# window): the full-registry parity parametrization that lived here
# duplicated tests/test_all_oracles.py::test_oracle_parity_all, which
# runs a strict SUPERSET of the same check on every registered query
# (same oracle_compare, plus the non-empty-at-smoke and
# pandas-survival assertions, plus coverage of oracle-less names).
# 494 duplicate Spark+DuckDB executions ≈ 6-9 min of suite time for
# zero added coverage. The representative single-name smoke below
# keeps this module self-contained when run alone; the plan-shape
# tests that are this file's real subject are untouched.
def test_oracle_parity_smoke(spark, sf_dir, duck):
    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    oracle_compare(df, duck, registry.ORACLES["q1_pricing_summary"])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["n_name", "revenue"]


def test_q6_filter_pushdown(spark, sf_dir):
    df = registry.QUERIES["q6_revenue_forecast"](spark, sf_dir)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf and "l_quantity" in pf, pf


def test_q5_broadcasts_dims_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_q1_column_pruning(spark, sf_dir):
    from hdsp_hive_release_src_spark.plans import explain_str

    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = explain_str(df)
    # scan must not read join keys it doesn't need
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
