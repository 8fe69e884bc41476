"""Standing non-vacuity gate (the r6 verdict's ask): a green oracle
row proves nothing if the query's thresholds produce the empty set at
the sf0.01 gate scale — both engines agree on nothing. Two layers:

1. tests/test_all_oracles.py asserts >= 1 row for EVERY query at
   smoke scale (sf0.001), with a two-name documented whitelist.
2. This module runs the whitelisted queries plus the detector-style
   family (anomaly / outlier / gap / dedup finders, whose thresholds
   are the usual way output silently goes empty) at the EXACT gate
   scale and asserts each clears a per-query signal floor pinned
   well below its current output (so data drift flags loudly but
   real regressions to near-empty still fail).
"""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark.registry import QUERIES, load_all
from tests.conftest import SF_ORACLE

load_all()

#: name -> minimum gate-scale rows. Floors are ~half the observed
#: driver-row counts (r1-r6 CORRECTNESS records), never 0.
DETECTOR_FLOORS = {
    # whitelisted as smoke-empty; must be real at gate scale
    "item_cooccurrence_support": 100,
    "q7_volume_shipping": 1,
    # anomaly / outlier / drift detectors
    "event_count_anomaly": 50,
    "sequence_gap_detection": 10,
    "zscore_outliers": 2,
    "mad_outliers": 2,
    "embedding_norm_outliers": 1,
    "cusum_drift_detection": 1,
    "funnel_windowed_strict": 1,
    # dedup finders — 0 found duplicates would be vacuous on data
    # that is known to contain clusters
    "dedup_exact": 100,
    "dedup_minhash_lsh": 10,
    "dedup_simhash": 50,
    "dedup_ngram_jaccard": 10,
    "dedup_containment": 10,
    "semantic_dedup": 5,
    "heavy_hitters_topk": 1,
    "decontaminate_ngrams": 5,
    # round-7 prefix-fingerprint family (keyed on the 64-char prefix
    # precisely because full-hash structure is empty at gate scale)
    "duplicate_cluster_histogram": 2,  # needs a size>1 bucket to exist
    "prefix_fingerprint_dedup": 10,
}


@pytest.mark.parametrize("name", sorted(DETECTOR_FLOORS))
def test_detector_signal_at_gate_scale(name, spark):
    from hdsp_hive_release_src_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    n = QUERIES[name](spark, SF_ORACLE).count()
    assert n >= DETECTOR_FLOORS[name], (
        f"{name}: {n} rows at gate scale, floor "
        f"{DETECTOR_FLOORS[name]} — threshold gone vacuous?"
    )


def test_bloom_filter_exhibits_false_positives(spark):
    """bloom_filter_membership is one row; its vacuity lives in the
    values. The filter is sized small on purpose so gate-scale output
    shows real false positives — and the defining contract (zero
    false negatives) must hold."""
    from hdsp_hive_release_src_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    r = QUERIES["bloom_filter_membership"](spark, SF_ORACLE).collect()[0]
    assert r.n_false_neg == 0
    assert r.n_false_pos > 0
    assert r.n_flagged == r.n_members + r.n_false_pos


def test_cms_never_undercounts(spark):
    from hdsp_hive_release_src_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    rows = QUERIES["count_min_sketch_freq"](spark, SF_ORACLE).collect()
    assert rows and all(r.never_undercounts for r in rows)


def test_leakage_audit_reports_real_leaks(spark):
    """eval_overlap_leakage always emits exactly one row — vacuity
    lives in its VALUES: all-zero leak counters would verify nothing.
    The prefix-fingerprint key guarantees real cross-split families
    at gate scale."""
    from hdsp_hive_release_src_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    r = QUERIES["eval_overlap_leakage"](spark, SF_ORACLE).collect()[0]
    assert r.leaked_texts > 0 and r.leaked_pairs >= r.leaked_texts
    assert r.contaminated_eval_docs > 0
