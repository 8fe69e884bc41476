"""Query registry: the single source of truth wiring SURVEY.md §2 names
to (a) a Spark DataFrame implementation and (b) an optional DuckDB oracle
SQL string. ``__spark_entry__.py`` re-exports these for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hdsp_hive_release_src_spark.certification import LAST_CERTIFIED

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under its SURVEY.md §2 name.

    ``oracle`` is ANSI/DuckDB SQL over the pre-registered parquet views
    (region nation customer supplier part orders lineitem events
    documents embeddings). Omit it only for genuinely non-SQL ops —
    the driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# Verification walk order (the standing rotation policy, r10 verdict
# item 2): the driver samples the FIRST 50 registry names each round,
# so the walk order IS the certification schedule. It is computed, not
# hand-maintained:
#
#   1. _CHANGED_THIS_ROUND — queries whose plan or operator changed
#      this round. Their old green rows predate the change, so they
#      re-certify first. Hand-edited each round alongside the change.
#   2. _NEVER_CERTIFIED — queries with no driver correctness row ever
#      (tests/test_verify_rotation.py proves this list exhaustive).
#      Kept in wave order. Empty once the r11 window lands.
#   3. Everything else, ascending (last-certified round, name) from
#      the generated certification.LAST_CERTIFIED map — so the stalest
#      certifications (r1/r2 rows that predate the r4 testdata
#      migration and r8 canonicalization hardening) recycle first,
#      oldest-first, ~44-50 per round.
#
# Regenerate certification.py each round with
# tools/gen_certification.py after the driver lands the previous
# round's CORRECTNESS file.

# round 13 (advice items + the new RUNTIME executed-scan audit,
# tests/test_scan_counts.py::RUNTIME_SCANS):
# - q11: the global threshold is now a 1-row broadcast joined back to
#   the checkpointed per-part aggregate — no driver collect, the
#   comparison never leaves the engine.
# - five fact-ROW-sized intermediates moved from localCheckpoint to
#   persist(DISK_ONLY) (operators/materialize.py: fact rows on
#   non-reliable local storage die with their executor; persist keeps
#   lineage). cohort_ltv also re-planned: window-MIN first-week
#   replaces the groupBy+self-join (2 scans -> 1).
# - semantic_dedup: the distinct-vector group table is materialized
#   once (4 executed corpus scans -> 2); ann_product_quantization:
#   one exploded multi-query scoring pass over the codes table
#   (5 executed -> 3). Values identical everywhere; all eight
#   re-verified at both scales.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # r13 verdict item 1: the triangle close is now an equi semi-join
    # (union of both edge orientations) and the corners explode in one
    # pass — the wedge subtree runs once; values identical.
    "triangle_clustering_coeff",
    # r13 verdict item 2 (subtree sweep): re-executed plan subtrees
    # re-planned — BFS and topo-layering checkpoint each node-sized
    # frontier (the two-consumer loop doubled the plan per round);
    # ks checkpoints the grid-sized gap table; kl checkpoints the
    # vocab aggregate. Values identical everywhere.
    "shortest_path_bfs",
    "topo_sort_layers",
    "ks_two_sample",
    "kl_divergence_drift",
    # ... and the full-registry subtree sweep's 32 further re-plans:
    # multi-consumer reduced tables (degree/vocab/grid/stratum-sized)
    # checkpointed once, two window-rewrites (per-group totals folded
    # into the same pass), one DISK_ONLY persist (rake's token rows),
    # semantic_dedup's cell cap as a checkpointed keep-list semi-join.
    "pagerank_trade_graph",
    "hits_hub_authority",
    "lorenz_curve_deciles",
    "source_centroid_cosine",
    "association_rules_lift",
    "cosupply_bipartite_projection",
    "autocorr_daily_events",
    "ewma_halving_window",
    "benford_distribution",
    "ra_link_prediction",
    "binseg_changepoint_gain",
    "boilerplate_position_bias",
    "char_entropy_filter",
    "degree_assortativity",
    "zipf_rank_frequency",
    "jensen_shannon_drift",
    "cusum_drift_detection",
    "kmv_distinct_estimate",
    "kmv_set_operations",
    "largest_remainder_allocation",
    "mixture_weights",
    "mom_waterfall_contribution",
    "neyman_allocation_sampling",
    "pca_power_iteration_exact",
    "rake_keyword_phrases",
    "supplier_concentration_hhi",
    "weekday_seasonality_index",
    "theil_index_inequality",
    "two_hop_reach",
    "stratified_ate_gcomputation",
    "abc_pareto_class",
    "hll_sketch_union",
    "table_sample_percent_rows",
    # ranking-operator input materialization (with_global_rank /
    # exact_ntile / range_prefix_sum checkpoint their input once —
    # rfm's 14 executed events scans were the worst case; rfm also
    # folds the anchor into the user-grain rollup)
    "rfm_segmentation",
    "histogram_equi_depth",
    "window_ntile",
    "gini_concentration_index",
    "quantile_normalize",
    "trimmed_mean",
    "roc_auc_exact",
    "kmeans_clusters",
    "asof_join_events_orders",
    "q11_important_parts",
    "mad_outliers",
    "funnel_windowed_strict",
    "table_diff_reconcile",
    "conformal_prediction_interval",
    "cohort_ltv_matrix",
    "semantic_dedup",
    "ann_product_quantization",
)

# Empty as of r11: every registered query now has a driver correctness
# row (CORRECTNESS_r11 landed all 44 wave-19-29 names). New queries go
# here until their first driver row lands.
_NEVER_CERTIFIED: tuple[str, ...] = ()

_VERIFY_FIRST = (
    _CHANGED_THIS_ROUND
    + _NEVER_CERTIFIED
    + tuple(
        sorted(
            (
                n
                for n in LAST_CERTIFIED
                if n not in _CHANGED_THIS_ROUND
                and n not in _NEVER_CERTIFIED
            ),
            key=lambda n: (LAST_CERTIFIED[n], n),
        )
    )
)


def load_all() -> None:
    """Import every query module so registration side effects run, then
    apply the _VERIFY_FIRST walk order (see its comment)."""
    from hdsp_hive_release_src_spark.queries import (  # noqa: F401
        tpch,
        tpch_extra,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        modern_surface,
        modern_surface2,
        warehouse_surface,
        etl_surface,
        multimodal2,
        engine_surface2,
        functions_suite2,
        schema_surface,
        functions_suite3,
        functions_suite4,
        graph,
        product_analytics,
        analytics2,
        stats2,
        llm6,
        llm7,
        llm8,
        events2,
        functions_suite5,
        functions_suite6,
        streaming,
        sources,
        events,
        timeseries,
        analytics,
        engine_surface,
        extras,
        extras2,
        extras3,
        functions_suite,
        hive_surface,
        hive_gaps,
        olap_surface,
        udf_surface,
        catalog_surface,
        llm9,
        governance_surface,
        round7,
        functions_suite7,
        llm10,
        functions_suite8,
        math_datetime_suite,
        geo_suite,
        functions_suite9,
        analytics3,
        modern_surface3,
        modern_surface4,
        round8,
        round8b,
        round9,
        round9b,
        round9c,
        round9d,
        round9e,
        round9f,
        round9g,
        round9h,
        round9i,
        round9j,
        round9k,
        round9l,
        round9m,
        round9n,
        round9o,
        round9p,
        round9q,
        round9r,
        round9s,
        round9t,
        round9u,
        round9v,
        round9w,
        round9x,
        round9y,
        round9z,
        round9aa,
        round9ab,
        round9ac,
    )

    ordered = {n: QUERIES[n] for n in _VERIFY_FIRST if n in QUERIES}
    ordered.update(
        (n, f) for n, f in QUERIES.items() if n not in ordered
    )
    QUERIES.clear()
    QUERIES.update(ordered)
