"""Plan-shape assertion for the round-11 q18 re-plan: the single-pass
form must scan lineitem exactly once (the per-order quantity aggregate
serves both the HAVING filter and the output sum) and carry no
semi-join — the shape the two-scan textbook plan was replaced for."""

from __future__ import annotations

from hdsp_hive_release_src_spark import registry
from hdsp_hive_release_src_spark.plans import explain_str

SF = "/root/testdata/sf0.001"


def test_q18_single_lineitem_scan_no_semi_join(spark):
    registry.load_all()
    df = registry.QUERIES["q18_large_volume_customer"](spark, SF)
    plan = explain_str(df)
    assert "LeftSemi" not in plan, "semi-join crept back into q18"
    # formatted mode: each scan owns one Location: line naming its file
    li_locs = [
        ln
        for ln in plan.splitlines()
        if "Location" in ln and "lineitem" in ln
    ]
    assert len(li_locs) == 1, f"{len(li_locs)} lineitem scans"
    # column pruning: the lineitem ReadSchema carries only the two
    # used columns, never the price/discount columns
    schemas = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "l_quantity" in ln
    ]
    assert len(schemas) == 1
    assert "l_orderkey" in schemas[0]
    assert "l_extendedprice" not in schemas[0]
