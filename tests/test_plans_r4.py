"""Round-4 operator plan shapes: broadcast scalars, anti-join probes,
map-only pipelines (SURVEY.md §4)."""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark import registry
from hdsp_hive_release_src_spark.plans import explain_str

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


@pytest.mark.parametrize(
    "name",
    ["balanced_class_sample", "mixture_weights",
     "incremental_high_watermark"],
)
def test_scalar_side_is_broadcast(spark, name):
    """Queries joining a scalar/target aggregate against the corpus
    must broadcast the scalar side — the corpus never shuffles for a
    one-row join."""
    df = registry.QUERIES[name](spark, SF)
    plan = explain_str(df, "simple")
    assert (
        "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    ), plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dq_orphan_probe_is_anti_join(spark):
    """The referential-orphan check must be an anti join over the
    DISTINCT key set, never a row-level inner join."""
    df = registry.QUERIES["dq_audit"](spark, SF)
    plan = explain_str(df, "simple")
    assert "LeftAnti" in plan, plan


@pytest.mark.parametrize(
    "name", ["doc_chunk_overlap", "embedding_quantize",
             "frame_sample_plumbing", "nested_struct_json"]
)
def test_map_only_ops_have_no_exchange_before_output(spark, name):
    """Chunking/quantization/frame-sampling/struct-export are map-only:
    no join and no aggregation shuffle (the only allowed exchange is
    the final presentation orderBy's range partitioning)."""
    df = registry.QUERIES[name](spark, SF)
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    hash_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert not hash_exchanges, plan


def test_scd2_single_shuffle(spark):
    """Both SCD2 window passes share the custkey partitioning — the
    plan must contain exactly one hash exchange."""
    df = registry.QUERIES["scd2_dimension"](spark, SF)
    plan = explain_str(df, "simple")
    hash_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(hash_exchanges) == 1, plan


def test_simhash_pair_generation_is_join_free(spark):
    """Simhash band pairs come from grouped postings + nested explode —
    no self-join recomputing the 64-aggregate pipeline per side."""
    df = registry.QUERIES["dedup_simhash"](spark, SF)
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan


@pytest.mark.parametrize(
    "name", ["dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash"]
)
def test_pair_outputs_are_strictly_ordered(spark, name):
    """Postings-slice pair generation must emit each unordered pair
    once, as (d1 < d2) — no self-pairs, no mirrored duplicates (relies
    on per-doc distinct index entries; this guards that invariant)."""
    rows = registry.QUERIES[name](spark, SF).collect()
    seen = set()
    for r in rows:
        assert r[0] < r[1], (name, r)
        assert (r[0], r[1]) not in seen, (name, r)
        seen.add((r[0], r[1]))


def test_join_hints_select_their_operators(spark):
    """Each strategy hint must reach its physical operator."""
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    ).where(F.col("c_custkey") < 500)
    for hint, op in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        j = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        plan = explain_str(j, "simple")
        assert op in plan, (hint, plan)
