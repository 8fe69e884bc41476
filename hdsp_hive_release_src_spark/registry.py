"""Query registry: the single source of truth wiring SURVEY.md §2 names
to (a) a Spark DataFrame implementation and (b) an optional DuckDB oracle
SQL string. ``__spark_entry__.py`` re-exports these for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

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


# Registry walk order = verification-freshness order: queries that have
# never had a driver correctness row, were changed this round, or are
# brand new come FIRST, so a prefix-sampling verifier always re-checks
# exactly the entries whose pass status is least established. Names not
# listed keep their registration (module import) order after these.
_VERIFY_FIRST = (
    # --- round 10: every name below has NEVER had a driver
    # correctness row (91 such queries remain after the r9 window —
    # all judge-swept green at r9 through the driver-identical pandas
    # path, all locally gate-checked at sf0.01). Positions 1-50 =
    # the r10 driver window = round-9 waves 4-18 in wave order;
    # positions 51-91 (waves 19-29) queue to lead the r11 window.
    # The full r9 window (streaming re-certs, rfm re-plan,
    # explain_cbo/hll changes, waves 1-3) landed 50/50 green in
    # CORRECTNESS_r09 and rotates out per the freshness rule.
    #
    # Positions 1-2: changed THIS round — the customer-spend ranking
    # now runs through operators/ranking.with_global_rank instead of a
    # partitionless Window.orderBy (r9 advice; the per-customer
    # dimension grows with the fact table). Identical output by
    # tests/test_prefix_sum_lockstep.py's swap tests, but the green r9
    # rows predate the plan change, so they re-certify first and
    # displace the window's last two names into the r11 queue.
    "gini_concentration_index", "lorenz_curve_deciles",
    # Positions 3-4: also changed THIS round — connected components
    # behind both queries swapped from min-label propagation to
    # alternating large-star/small-star (operators/components.py;
    # 2× faster at stress scale, bounded fan-out at 100 TB).
    # Lockstep-equal to the old loop on the real pair graph
    # (tests/test_components_star.py), but their green r2/r3 rows
    # predate the plan change.
    "dedup_components", "dedup_keep_best",
    "hapax_legomena_ratio",
    "qualify_emulation", "soundex_phonetic_blocking",
    "hive_uniontype_emulation", "multibyte_length_semantics",
    "pca_power_iteration_exact", "rebalance_hint_partitioning",
    "stream_chained_windows", "mann_kendall_trend",
    "hits_hub_authority",
    "source_centroid_cosine", "orc_bloom_filter_write",
    "abtest_proportions_ztest", "burstiness_fano_factor",
    "seasonal_decompose_additive", "tukey_fences_grouped",
    "fleiss_kappa_raters", "theil_index_inequality",
    "csv_write_quote_escape_matrix", "json_lines_gzip_roundtrip",
    "fiscal_calendar_445", "largest_remainder_allocation",
    "skyline_pareto_front", "budget_greedy_selection",
    "creditcard_luhn_scan", "winsorized_stats_clip",
    "histogram2d_bins",
    "mom_waterfall_contribution", "iso_week_boundaries",
    "interval_union_coverage", "tiered_commission_brackets",
    "two_hop_reach", "neyman_allocation_sampling",
    "roc_auc_exact", "kendall_tau_b_grid",
    "clamped_running_inventory", "funnel_pattern_match",
    "cosupply_bipartite_projection", "natural_join_semantics",
    "readability_proxy_bands", "association_rules_lift",
    "calibration_curve_bins", "cohort_ltv_matrix",
    "kcore_peeling_profile", "kmv_set_operations",
    "ra_link_prediction", "binseg_changepoint_gain",
    "markov_two_step", "stratified_ate_gcomputation",
    "rake_keyword_phrases", "try_arith_family",
    "km_survival_hazard",
    "vwap_rolling", "max_drawdown_profile", "rsi_indicator",
    "bollinger_breach", "yoy_revenue_growth", "abc_pareto_class",
    "dataframe_transpose", "approx_top_k_contract",
    "sql_scripting_block",
    "table_diff_reconcile", "sessionization_capped",
    "business_days_lag", "share_of_parent_rollup",
    "python_datasource_kvlog", "pandas_grouped_agg_udaf",
    "python_datasource_stream", "python_datasource_writer",
    "python_datasource_stream_sink",
    "fetch_with_ties_emulation", "user_path_trigrams",
    "theta_sketch_set_ops", "kll_quantile_sketch_contract",
    "approx_top_k_merge_contract", "bitmap_set_algebra",
    "epoch_timezone_matrix", "try_conversion_matrix",
    "regr_full_family", "string_bit_misc_matrix",
    "hyperbolic_trig_matrix",
    "st_wkb_surface", "window_time_semantics",
    "morton_zorder_clustering",
    "ivm_delta_aggregate", "cascading_erasure_audit",
    "k_anonymity_audit", "touch_attribution",
    "conformal_prediction_interval", "quantile_treatment_effect",
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
