"""Plan-shape assertions for the round-9 operators — the scale
contracts the docstrings claim, checked against the actual physical
plans: no pair join in the skyline, broadcast joins in the
graph/centroid queries, column pruning at the parquet scan for the
rollup-based statistics."""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skyline_has_no_join(spark):
    """The window formulation must compile to sort+window — any Join
    node means the quadratic dominance join snuck back in."""
    plan = _plan(registry.QUERIES["skyline_pareto_front"](spark, SF))
    assert "Join" not in plan
    assert "Window" in plan


def test_skyline_matches_quadratic_dominance_definition(spark):
    """Independent value replay (r14 spot-audit finding): the DuckDB
    oracle shares the sort+running-min REFORMULATION, so a
    reformulation bug would pass both engines. This replay computes
    the Pareto front from the quadratic dominance DEFINITION — point
    p survives iff no q has q.size <= p.size and q.cents <= p.cents
    with at least one strict — in pure Python over the per-
    (brand, size) min-cents rollup the query starts from."""
    rows = registry.QUERIES["skyline_pareto_front"](
        spark, SF
    ).collect()
    got = {(r[0], r[1], r[2]) for r in rows}

    import collections

    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF}/part.parquet", columns=["p_brand", "p_size", "p_retailprice"]
    ).to_pylist()
    pts: dict = {}
    for r in t:
        k = (r["p_brand"], int(r["p_size"]))
        c = int(round(r["p_retailprice"] * 100))
        pts[k] = min(pts.get(k, c), c)
    by_brand = collections.defaultdict(list)
    for (b, s), c in pts.items():
        by_brand[b].append((s, c))
    want = set()
    for b, ps in by_brand.items():
        for s, c in ps:
            dominated = any(
                (s2 <= s and c2 <= c) and (s2 < s or c2 < c)
                for s2, c2 in ps
            )
            if not dominated:
                want.add((b, s, c))
    assert got == want


def test_skyline_scan_prunes_columns(spark):
    plan = _plan(registry.QUERIES["skyline_pareto_front"](spark, SF))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "p_brand" in scan and "p_size" in scan
    assert "p_name" not in scan and "p_type" not in scan


def test_hits_uses_broadcast_joins(spark):
    """Degree/score tables are node-sized: every per-iteration join
    must broadcast them, never shuffle the edge list. r13: a2/h2 are
    checkpointed (each iteration executes once), so the iteration
    joins run at build time behind B() hints and the FINAL plan reads
    the node-sized checkpoints — assert no sort-merge shuffle remains
    and the iteration results come from RDD leaves."""
    plan = _plan(registry.QUERIES["hits_hub_authority"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "ExistingRDD" in plan


def test_centroid_cosine_broadcasts_totals(spark):
    # the centroid table is a checkpoint (no stats), so the tiny
    # self-join carries an explicit broadcast hint — a SortMergeJoin
    # here means the hint was dropped
    plan = _plan(registry.QUERIES["source_centroid_cosine"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_scan_prunes_to_two_columns(spark):
    """r13: the daily rollup is checkpointed (both band-join sides
    read it), so the parquet scan runs at build time and the final
    plan's leaves are the 3-column (d, cents, rn) checkpoint — the
    materialization itself must stay that narrow (no order columns
    dragged along); the single build-time scan is pinned by the
    runtime scan counter."""
    plan = _plan(registry.QUERIES["ewma_halving_window"](spark, SF))
    rdd_lines = [
        ln for ln in plan.splitlines() if "ExistingRDD" in ln
    ]
    assert rdd_lines
    for ln in rdd_lines:
        assert "o_comment" not in ln and "o_orderpriority" not in ln
    assert "ReadSchema" not in plan  # no lazy re-scan survived


def test_gini_scan_prunes_columns(spark):
    """r13: with_global_rank materializes its (per-customer) input, so
    the orders scan runs at build time (runtime-pinned at 1) and the
    final plan reads the checkpoint — the materialization must stay
    free of unneeded order columns, and no lazy re-scan may remain."""
    plan = _plan(
        registry.QUERIES["gini_concentration_index"](spark, SF)
    )
    rdd_lines = [ln for ln in plan.splitlines() if "ExistingRDD" in ln]
    assert rdd_lines
    for ln in rdd_lines:
        assert "o_orderpriority" not in ln and "o_comment" not in ln
    assert "ReadSchema" not in plan


def test_budget_selection_single_global_window(spark):
    """One global cumulative-sum window; the quality scoring must
    stay inside the scan projection (no explode shuffle)."""
    plan = _plan(registry.QUERIES["budget_greedy_selection"](spark, SF))
    assert "Window" in plan
    assert "Generate" not in plan  # no explode anywhere


def test_mann_kendall_pair_join_is_on_rollup(spark):
    """The O(days²) join must sit ABOVE an aggregation of the scan —
    joining raw orders would be rows² and is the 100 TB failure."""
    df = registry.QUERIES["mann_kendall_trend"](spark, SF)
    plan = _plan(df)
    first_join = min(
        i
        for i in (
            plan.find("SortMergeJoin"),
            plan.find("BroadcastHashJoin"),
            plan.find("BroadcastNestedLoopJoin"),
        )
        if i >= 0
    )
    first_agg = plan.find("HashAggregate")
    # reading bottom-up in toString: aggregates appear BELOW (after)
    # the join text — assert an aggregate exists deeper than the
    # first join mention
    assert first_agg >= 0 and first_join >= 0
    assert "HashAggregate" in plan[first_join:]
