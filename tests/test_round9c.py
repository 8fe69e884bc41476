"""Round-9 third-wave properties beyond oracle parity: NFC collapse
identities, statistic bounds, fold balance, BPE pair shape, JS
boundedness."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_nfc_collapses_exactly_the_injected_divergence(spark):
    rows = registry.QUERIES["unicode_nfc_dedup"](spark, SF).collect()
    assert rows
    for r in rows:
        # composed and decomposed spellings differ raw exactly where
        # an 'e' exists, and ALWAYS collapse under NFC
        assert r.n_raw_differ == r.n_with_e
        assert r.n_nfc_equal == r.n_docs
    assert sum(r.n_with_e for r in rows) > 0


def test_assortativity_bounds(spark):
    r = registry.QUERIES["degree_assortativity"](spark, SF).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_directed_edges > 0 and r.n_directed_edges % 2 == 0


def test_zipf_rank1_is_unity_and_ranks_total(spark):
    rows = (
        registry.QUERIES["zipf_rank_frequency"](spark, SF)
        .orderBy("rnk")
        .collect()
    )
    assert rows[0].rnk == 1
    assert rows[0].zipf_ratio_permille == 1000
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r.zipf_ratio_permille > 0 for r in rows)


def test_kfold_covers_all_folds_and_balances(spark):
    rows = registry.QUERIES["stratified_kfold_assignment"](
        spark, SF
    ).collect()
    langs = {r.lang for r in rows}
    for lang in langs:
        folds = {r.fold for r in rows if r.lang == lang}
        assert folds == {0, 1, 2, 3, 4}, (lang, folds)
    # shares sum to ~1000 per lang (floor-division loss < k)
    for lang in langs:
        s = sum(r.share_permille for r in rows if r.lang == lang)
        assert 995 <= s <= 1000


def test_ttr_bounds_and_coverage(spark):
    rows = registry.QUERIES["type_token_ratio_buckets"](
        spark, SF
    ).collect()
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 < r.ttr_permille <= 1000
        assert r.sum_distinct <= r.sum_tokens


def test_bpe_pairs_shape(spark):
    rows = (
        registry.QUERIES["bpe_merge_pair_counts"](spark, SF)
        .orderBy("rnk")
        .collect()
    )
    assert len(rows) == 40
    assert all(len(r.pair) == 2 for r in rows)
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_js_bounded_by_ln2(spark):
    rows = registry.QUERIES["jensen_shannon_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.js_nats <= math.log(2) + 1e-9


def test_hapax_identities(spark):
    rows = registry.QUERIES["hapax_legomena_ratio"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_hapax <= r.n_types <= r.n_tokens
        assert 0 <= r.hapax_permille <= 1000
