"""Round-7 additions: focused behavior tests beyond the oracle parity
that tests/test_all_oracles.py already gives every registered query.

- cluster_by_clause: the LAYOUT property itself (row-set parity can't
  see partition boundaries) — every output partition is sorted by the
  cluster key and no key spans two partitions.
- bm25_ranked_retrieval: float determinism under partitioning changes
  (the dsir lesson — scores must not depend on accumulation order).
- distinct_set_algebra: internal set-identity invariants.
- boilerplate_position_bias: exact-integer output + head-share sanity.
- crypto_funcs_roundtrip: AES invariants independent of the oracle.
- item_cooccurrence_support: NON-VACUOUS at the sf0.01 gate scale
  (the r6 verdict's weak item: a support floor of 20 produced 0 rows,
  so the oracle verified the empty set).
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_cluster_by_layout(spark, sf_dir):
    from hdsp_hive_release_src_spark.queries.round7 import (
        cluster_by_clause,
    )

    df = cluster_by_clause(spark, sf_dir)

    def partition_keys(it):
        rows = list(it)
        keys = [r.l_suppkey for r in rows]
        yield (keys == sorted(keys), set(keys))

    parts = df.rdd.mapPartitions(partition_keys).collect()
    assert all(ok for ok, _ in parts), "partition not sorted by key"
    seen: set = set()
    for _, keys in parts:
        if keys:
            assert not (seen & keys), "cluster key split across partitions"
            seen |= keys
    assert seen, "no rows came back"


def test_bm25_partitioning_invariant(spark, sf_dir):
    from hdsp_hive_release_src_spark.queries.round7 import (
        bm25_ranked_retrieval,
    )

    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        a = bm25_ranked_retrieval(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    b = bm25_ranked_retrieval(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(b) > 0 and all(r.bm25 is not None for r in b)


def test_distinct_set_algebra_identities(spark, sf_dir):
    from hdsp_hive_release_src_spark.queries.round7 import (
        distinct_set_algebra,
    )

    r = distinct_set_algebra(spark, sf_dir).collect()[0]
    assert r.n_union == r.n_intersect + r.n_purchase_only + r.n_click_only
    assert r.n_purchase == r.n_intersect + r.n_purchase_only
    assert r.n_click == r.n_intersect + r.n_click_only
    assert 0 <= r.jaccard_permille <= 1000


def test_boilerplate_bias_exact_integers(spark, sf_dir):
    from hdsp_hive_release_src_spark.queries.round7 import (
        boilerplate_position_bias,
    )

    rows = boilerplate_position_bias(spark, sf_dir).collect()
    assert rows, "vocabulary should clear the min-total floor"
    for r in rows:
        assert r.n_head <= r.n_total
        # uniform synthetic vocabulary: bias should hover around 1000
        assert 0 < r.head_bias_permille < 5000


def test_crypto_roundtrip_invariants(spark, sf_dir):
    from hdsp_hive_release_src_spark.queries.round7 import (
        crypto_funcs_roundtrip,
    )

    rows = crypto_funcs_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.decrypted.startswith("Customer#")
        assert r.cipher_len % 16 == 0
        assert r.wrong_key_is_null is True
        assert len(r.sha_hex) == 64


def test_explain_surface_pins_plan(spark, sf_dir):
    from hdsp_hive_release_src_spark.queries.round7 import (
        _PLAN_FEATURES,
        explain_plan_surface,
    )

    got = {
        r.feature: r.present
        for r in explain_plan_surface(spark, sf_dir).collect()
    }
    assert got == dict(_PLAN_FEATURES)


def test_item_cooccurrence_nonvacuous_at_gate_scale(spark):
    """The r6 weak item: support >= 20 yielded 0 rows at sf0.01 and the
    oracle matched the empty set. The floor is now scale-aware — assert
    real signal at the exact gate scale so a future threshold bump
    can't go vacuous again."""
    from hdsp_hive_release_src_spark.queries.llm9 import (
        item_cooccurrence_support,
    )

    rows = item_cooccurrence_support(spark, SF_ORACLE).collect()
    assert len(rows) >= 50, f"expected real support pairs, got {len(rows)}"
    assert all(r.support >= 5 and r.i1 < r.i2 for r in rows)
