"""Fact-table scan-count pins for the TPC-H set (r11 verdict item 6).

q18's two-scan shape hid for ten rounds because correctness and even
decent wall-clock don't expose an avoidable extra scan of the biggest
table — at 100 TB a second lineitem pass is ~100 TB of wasted IO. This
test counts the `Location ... lineitem|orders` leaves in each query's
formatted plan and pins the expected number, so any re-plan (or an
optimizer change) that adds a fact scan fails loudly.

Pins of 2 are deliberate and commented; anything unexplained is a
re-plan candidate, not a new pin.
"""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark.plans import explain_str

SF_DIR = "/root/testdata/sf0.001"

# name -> (lineitem scans, orders scans). Comments justify every
# non-obvious pin.
EXPECTED = {
    "q1_pricing_summary": (1, 0),
    # no partsupp table in this schema — lineitem plays its role, so
    # the min-cost-supplier aggregation reads lineitem once
    "q2_min_cost_supplier": (1, 0),
    "q3_shipping_priority": (1, 1),
    "q4_order_priority": (1, 1),
    "q5_local_supplier_volume": (1, 1),
    "q6_revenue_forecast": (1, 0),
    "q7_volume_shipping": (1, 1),
    "q8_market_share": (1, 1),
    "q9_product_profit": (1, 0),
    "q10_returned_items": (1, 1),
    # r12 re-plan: per-part aggregate is localCheckpoint-ed and the
    # global threshold collected from it, so the FINAL plan reads the
    # checkpoint — zero parquet scans; the one real lineitem scan
    # happens when the query function materializes the checkpoint
    "q11_important_parts": (0, 0),
    "q12_priority_shipping": (1, 1),
    "q13_customer_distribution": (0, 1),
    "q14_promo_effect": (1, 0),
    # scalar-max-of-view shape: the revenue view feeds both the output
    # rows and the max() subquery, and the view is supplier-sized at
    # the JOIN key level, so the second scan is the cheaper trade vs a
    # single-partition global window (r11 verdict: pin 2)
    "q15_top_supplier": (2, 0),
    "q16_supplier_count": (1, 0),
    # correlated per-part avg: the per-part aggregate must join back
    # to the base lineitem rows, and lineitem itself is too big to
    # checkpoint — the second scan is irreducible (r11 verdict: pin 2)
    "q17_small_quantity_revenue": (2, 0),
    "q18_large_volume_customer": (1, 1),
    "q19_discount_revenue": (1, 0),
    "q20_promo_shippers": (1, 0),
    # r12 re-plan: one lineitem+orders join with a two-level pair
    # aggregate replaced the separate multi-supplier and late-pair
    # subplans (was 2 lineitem scans)
    "q21_sole_late_supplier": (1, 1),
    "q22_global_sales": (0, 1),
}


def _scan_counts(plan: str) -> tuple[int, int]:
    li = sum(
        1
        for ln in plan.splitlines()
        if "Location" in ln and "lineitem" in ln
    )
    od = sum(
        1
        for ln in plan.splitlines()
        if "Location" in ln and "orders" in ln
    )
    return li, od


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_fact_scan_count_pinned(spark, name):
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    plan = explain_str(registry.QUERIES[name](spark, SF_DIR))
    assert _scan_counts(plan) == EXPECTED[name], (
        f"{name}: fact-table scan count drifted from the pinned "
        f"(lineitem, orders)={EXPECTED[name]} — an added scan is "
        f"~100 TB of extra IO at scale; re-plan or justify a new pin"
    )


# Corpus-table pins for the LLM-pipeline set: documents and
# embeddings are the 100 TB tables in production, so an avoidable
# re-scan there is the same class of defect as a second lineitem
# pass. Counts are Location leaves in the FINAL plan — queries that
# eagerly localCheckpoint/materialize (the multi-consumer idiom) show
# fewer visible scans than real ones; the comment states the real
# total. name -> (documents scans, embeddings scans).
EXPECTED_CORPUS = {
    "dedup_exact": (1, 0),
    "dedup_ngram_jaccard": (1, 0),
    "dedup_simhash": (1, 0),
    "dedup_containment": (1, 0),
    "dedup_keep_best": (1, 0),
    # components operator checkpoints its pair graph (0 visible; one
    # real scan at build)
    "dedup_components": (0, 0),
    # corpus vs batch are two ROLES of one test table; in production
    # they are different tables — 2 is the honest shape
    "incremental_dedup": (2, 0),
    "incremental_dedup_minhash": (2, 0),
    # signature build + the verify self-join reading the shingle
    # projection for each pair side; production verifies against the
    # stored signature/doc table, so the two verify reads are storage
    # reads either way
    "dedup_minhash_lsh": (3, 0),
    # full training-side gram scan + the eval-shard branch (predicate
    # pushdown makes it shard-sized) + the column-pruned per-source
    # doc counts
    "decontaminate_ngrams": (3, 0),
    # r12 re-plan: model stats checkpointed (1 build scan) + the
    # visible scoring scan — was 5
    "dsir_importance_weights": (1, 0),
    # r12 re-plan: TF table checkpointed — 1 real scan at build (was
    # 4 and 3)
    "jensen_shannon_drift": (0, 0),
    "kl_divergence_drift": (0, 0),
    # r12 re-plan: df folded into the tf aggregation chain (was 3);
    # the second scan is the column-pruned count(*) for N
    "tfidf_top_terms": (2, 0),
    # r12 re-plan: tf checkpointed — 1 real scan at build (was 2)
    "bm25_ranked_retrieval": (0, 0),
    "text_quality": (1, 0),
    "gopher_quality_rules": (1, 0),
    "text_langid": (1, 0),
    "token_count": (1, 0),
    "doc_fingerprint": (1, 0),
    # queries (vec_id < 5) and corpus are two roles of one table;
    # production queries arrive separately — 2 is the honest shape
    "ann_bruteforce_topk": (0, 2),
    "ann_lsh_topk": (0, 2),
    "embedding_cosine_pairs": (0, 2),
    # codebook build + assignment + query-probe branches; production
    # stores codebook and assignment (semantic_dedup demonstrates the
    # materialized form of exactly this pipeline)
    "ann_ivf_topk": (0, 4),
    "ann_product_quantization": (0, 3),
    # assignment + membership materialized to scratch parquet — one
    # real corpus scan at build
    "semantic_dedup": (0, 1),
    # r12 fixes (see the changed-this-round comment in registry.py):
    # two-pass MG with the total folded into the checkpointed recount
    # (0 visible; 2 real scans at build, was 3)
    "heavy_hitters_topk": (0, 0),
    # pair scan + the checkpointed signature table build (was 3)
    "minhash_estimate_accuracy": (1, 0),
    # checkpointed reference-shard model + the visible scoring scan
    # (was 4)
    "bigram_lm_score": (1, 0),
    # both n-gram count tables checkpointed — 2 real scans at build,
    # the documented "two aggregation passes" (was 5)
    "phrase_mining_pmi": (0, 0),
    # token-count table checkpointed — 1 real scan at build (was 3)
    "vocab_coverage_audit": (0, 0),
    # pair-generation scan + two column-pruned (doc_id, source) label
    # reads — the heavy scan is single; the label reads are two-column
    # parquet chunks at any scale
    "cross_source_dedup_matrix": (3, 0),
}


# Iterative / multi-consumer queries fixed by the r12 full-registry
# scan sweep (tools/scan_sweep.py): each re-ran its fact scan 6-94x at
# runtime before its derived base table was checkpointed. Their FINAL
# plans must now contain ZERO parquet fact scans — everything reads
# the checkpoint; the one real scan happens at build.
ITERATIVE_ZERO_SCAN = (
    "triangle_clustering_coeff",
    "shortest_path_bfs",
    "pagerank_trade_graph",
    "hits_hub_authority",
    "association_rules_lift",
    "kmv_set_operations",
    "pca_power_iteration_exact",
    "ks_two_sample",
    "conformal_prediction_interval",
    "funnel_windowed_strict",
    "degree_assortativity",
    "ra_link_prediction",
    # second wave: the 3-5 scan orders/events tier, same fix
    "approx_count_distinct_rsd",
    "bloom_filter_membership",
    "chi_square_independence",
    "cohort_ltv_matrix",
    "column_profile",
    "cosupply_bipartite_projection",
    "cramers_v_effect",
    "gapfill_daily",
    "kendall_tau_b_grid",
    "largest_remainder_allocation",
    "mad_outliers",
    "mann_kendall_trend",
    "markov_two_step",
    "neyman_allocation_sampling",
    "quantile_treatment_effect",
    "seasonal_decompose_additive",
    "share_of_parent_rollup",
    "table_diff_reconcile",
)

_FACT_TABLES = ("lineitem", "orders", "events", "documents",
                "embeddings")


@pytest.mark.parametrize("name", sorted(ITERATIVE_ZERO_SCAN))
def test_iterative_query_reads_its_checkpoint(spark, name):
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    plan = explain_str(registry.QUERIES[name](spark, SF_DIR))
    leaks = {
        t: sum(
            1
            for ln in plan.splitlines()
            if "Location" in ln and t in ln
        )
        for t in _FACT_TABLES
    }
    leaks = {t: c for t, c in leaks.items() if c}
    assert not leaks, (
        f"{name}: fact scans crept back above the checkpoint "
        f"({leaks}) — each loop iteration would re-scan the fact "
        f"table at 100 TB"
    )


def _corpus_scan_counts(plan: str) -> tuple[int, int]:
    dd = sum(
        1
        for ln in plan.splitlines()
        if "Location" in ln and "documents" in ln
    )
    ee = sum(
        1
        for ln in plan.splitlines()
        if "Location" in ln and "embeddings" in ln
    )
    return dd, ee


@pytest.mark.parametrize("name", sorted(EXPECTED_CORPUS))
def test_corpus_scan_count_pinned(spark, name):
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    plan = explain_str(registry.QUERIES[name](spark, SF_DIR))
    assert _corpus_scan_counts(plan) == EXPECTED_CORPUS[name], (
        f"{name}: corpus-table scan count drifted from the pinned "
        f"(documents, embeddings)={EXPECTED_CORPUS[name]}"
    )


def test_every_tpch_query_is_pinned():
    """A new §2.1 query must land with a scan-count pin."""
    import re

    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    tpch = {n for n in registry.QUERIES if re.match(r"q\d+_", n)}
    assert tpch == set(EXPECTED)
