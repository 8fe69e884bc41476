"""Pin the r13 subtree-re-execution discipline (tools/subtree_sweep.py).

The full-registry sweep runs as a round-start gate; this test keeps the
defect class from silently returning between rounds by re-checking the
queries that were the WORST offenders before the r13 re-plans:

- shortest_path_bfs / topo_sort_layers: the two-consumer loop doubled
  the plan per round (round-1 subtree appeared 8x).
- triangle_clustering_coeff: the 3-way union re-inlined the O(m^1.5)
  wedge subtree.
- pagerank_trade_graph / hits_hub_authority: per-iteration re-execution
  of the contribution / iteration chains.
- ks_two_sample / association_rules_lift / kmv_set_operations: 3-4x
  re-aggregation fan-outs.

Any flagged subtree in these plans is a regression of a fixed defect,
not a new finding.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from subtree_sweep import _details, _fingerprint, _flag, _parse, _tree_lines  # noqa: E402

WORST_OFFENDERS = [
    "shortest_path_bfs",
    "topo_sort_layers",
    "triangle_clustering_coeff",
    "pagerank_trade_graph",
    "hits_hub_authority",
    "ks_two_sample",
    "association_rules_lift",
    "kmv_set_operations",
    "source_centroid_cosine",
    "cosupply_bipartite_projection",
]


@pytest.mark.parametrize("name", WORST_OFFENDERS)
def test_no_repeated_expensive_subtrees(spark, sf_dir, name):
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.plans import explain_str

    registry.load_all()
    plan = explain_str(registry.QUERIES[name](spark, sf_dir))
    root = _parse(_tree_lines(plan), _details(plan))
    assert root is not None
    _fingerprint(root)
    hits = _flag(root)
    assert hits == [], (
        f"{name} re-executes a join/aggregate subtree again: {hits} — "
        "a fixed r13 defect regressed (see tools/subtree_sweep.py)"
    )


def test_tool_import_does_not_mutate_keep_plan_env():
    """r15 regression pin: the plan-only sweep tools set
    SPARK_GRAFT_KEEP_PLAN inside main(), NEVER at import — this test
    module imports subtree_sweep at collection time, and an
    import-time env mutation would silently bypass the checkpoint
    discipline for the entire test process (caught as a full-suite
    failure of the ranking cache-release pins in r15)."""
    import importlib
    import os

    saved = os.environ.pop("SPARK_GRAFT_KEEP_PLAN", None)
    try:
        import bnlj_audit
        import scan_sweep
        import subtree_sweep

        importlib.reload(subtree_sweep)
        importlib.reload(bnlj_audit)
        importlib.reload(scan_sweep)
        assert "SPARK_GRAFT_KEEP_PLAN" not in os.environ
    finally:
        if saved is not None:
            os.environ["SPARK_GRAFT_KEEP_PLAN"] = saved


def test_cache_read_repeats_are_opaque_but_joins_above_still_flag():
    """r17: the cache-build plan EXPLAIN prints under every
    InMemoryTableScan executes once, so its operators must not leak
    into ancestor fingerprints (a repeated cheap cache-read chain
    false-flagged as 'expensive' when the printed build plan held a
    join — first hit by the r17 persist-tier materializations). A
    repeated join ABOVE the cache leaves must still flag."""

    def tree(plan: str):
        root = _parse(_tree_lines(plan), _details(plan))
        _fingerprint(root)
        return _flag(root)

    # two identical Sort->Exchange chains over a cache whose printed
    # build plan contains a join: must NOT flag
    benign = """== Physical Plan ==
Union (9)
:- Sort (4)
:  +- Exchange (3)
:     +- InMemoryTableScan (1)
:           +- InMemoryRelation (2)
:                 +- SortMergeJoin Inner (8)
:                    :- Scan parquet (6)
:                    +- Scan parquet (7)
+- Sort (4)
   +- Exchange (3)
      +- InMemoryTableScan (1)
            +- InMemoryRelation (2)
                  +- SortMergeJoin Inner (8)
                     :- Scan parquet (6)
                     +- Scan parquet (7)

"""
    assert tree(benign) == []
    # two identical joins OF cache reads: the join sits above the
    # truncation point and must flag
    guilty = """== Physical Plan ==
Union (9)
:- HashAggregate (5)
:  +- SortMergeJoin Inner (4)
:     :- InMemoryTableScan (1)
:     +- InMemoryTableScan (2)
+- HashAggregate (5)
   +- SortMergeJoin Inner (4)
      :- InMemoryTableScan (1)
      +- InMemoryTableScan (2)

"""
    hits = tree(guilty)
    assert hits and hits[0]["occurrences"] == 2
