"""Standing full-registry EXECUTED-scan sweep (r13's ad-hoc pass,
promoted to a reusable round-start gate per the r13 verdict item 5).

Runs every registered query to completion at sf0.001 and counts the
scans that ACTUALLY EXECUTED per fact table via plans/runtime.py (the
SQL status store: build-time checkpoint/persist/collect jobs included,
cache hits excluded). This is the audit that is blind to nothing — it
caught the build-time re-execution class (collects across separate
SQL executions) that neither the plan-leaf scan sweep nor the
physical-subtree sweep can see: rfm_segmentation at 14 executed
events scans, kmeans_clusters at 4.

Flag threshold: >= 3 executed scans of one table. Entries in
KNOWN_LEGITIMATE (documented multi-read semantics, each pinned in
tests/test_scan_counts.py::RUNTIME_SCANS where applicable) are
recorded but not counted as actionable; anything NEW — or a known
entry whose count GREW — is a regression to fix, not a finding to
document.

r15: the sweep also checks SESSION-CACHE HYGIENE per query (verdict
item 5 registry-wide): a DISK_ONLY persist still registered after a
query's completed lifecycle (collect + the r16 deferred-release
boundary flush) is a session leak. KNOWN_RETAINED_CACHES is EMPTY as
of r16 — the deferral boundary closed the asof exception. This
extends the r14 TestQueryCacheRelease sample to every one of the
494 names.

Usage: PYTHONPATH=/root/repo python tools/runtime_sweep.py [sf] [round]
Writes tools/RUNTIME_SWEEP_r{round}.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("lineitem", "orders", "events", "documents", "embeddings",
          "customer")

# documented multi-read semantics as of r13 (RUNTIME_SWEEP_r13.json);
# the sweep fails a name only if it exceeds its documented count
KNOWN_LEGITIMATE = {
    "ann_ivf_topk": {"embeddings": 3},
    "ann_product_quantization": {"embeddings": 3},
    "ann_recall_audit": {"embeddings": 4},
    "decontaminate_ngrams": {"documents": 3},
    "insert_into_overwrite_semantics": {"orders": 3},
    "merge_upsert": {"orders": 3},
    "not_in_null_semantics": {"orders": 3},
    "parquet_compression_codecs": {"orders": 3},
    "set_ops": {"orders": 3},
    "set_ops_all": {"customer": 4},
    "stream_foreachbatch_upsert": {"events": 3},
    "stream_late_data": {"events": 3},
    "table_sample_percent_rows": {"orders": 3},
}

WHY = {
    "ann_ivf_topk": "codebook + assignment + probe branches; pinned",
    "ann_product_quantization": (
        "two driver-side setup reads + one exploded scoring pass; pinned"
    ),
    "ann_recall_audit": (
        "runs the LSH path AND the exact twin by definition; pinned"
    ),
    "decontaminate_ngrams": (
        "training grams + eval shard + per-source doc counts; pinned"
    ),
    "insert_into_overwrite_semantics": (
        "two INSERT INTO loads + one INSERT OVERWRITE ARE the "
        "demonstrated write semantics"
    ),
    "merge_upsert": (
        "MERGE emulation reads target + source + validation by design"
    ),
    "not_in_null_semantics": (
        "NOT IN vs anti-join comparison runs both plans by design"
    ),
    "parquet_compression_codecs": (
        "one write per codec under test by design"
    ),
    "set_ops": (
        "UNION/INTERSECT/EXCEPT branches each read the table by design"
    ),
    "set_ops_all": (
        "the ALL-variant branches each read the (dimension) table "
        "by design"
    ),
    "stream_foreachbatch_upsert": (
        "three micro-batches each scan their OWN input slice - "
        "streaming progress, not re-reads"
    ),
    "stream_late_data": "same: per-micro-batch slice scans",
    "table_sample_percent_rows": (
        "two TABLESAMPLE scans (sampling at the scan) + one "
        "conditional aggregate; pinned"
    ),
}


# r16: EMPTY — the deferred-release boundary (operators/materialize.
# defer_release, flushed by the registry's query wrapper at the next
# call) closed the one r15 exception (asof_join_events_orders: its
# consumer-built cache now unpersists at the query boundary instead
# of living for the session). The sweep replicates the harness
# boundary — collect, then flush_pending_releases() — before counting
# retained caches, so a persist that is neither released in-query nor
# registered for deferral is flagged on every one of the 494 names.
KNOWN_RETAINED_CACHES: dict[str, str] = {}


def _disk_only_rdd_count(spark) -> int:
    """Session-retained DISK_ONLY persists (the leak class; reduced-
    tier localCheckpoints legitimately register MEMORY_AND_DISK)."""
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().values().iterator()
    n = 0
    while it.hasNext():
        lvl = it.next().getStorageLevel()
        if lvl.useDisk() and not lvl.useMemory() and not lvl.useOffHeap():
            n += 1
    return n


def main() -> None:
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.operators.materialize import (
        flush_pending_releases,
    )
    from hdsp_hive_release_src_spark.plans.runtime import (
        executed_scans,
        snapshot_executions,
    )
    from hdsp_hive_release_src_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rnd = sys.argv[2] if len(sys.argv) > 2 else "14"
    spark = get_spark(app_name="runtime_sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    known: dict[str, dict] = {}
    actionable: dict[str, dict] = {}
    errors: dict[str, str] = {}
    retained_known: dict[str, int] = {}
    retained_actionable: dict[str, int] = {}
    for name in sorted(registry.QUERIES):
        spark.catalog.clearCache()
        cache_before = _disk_only_rdd_count(spark)
        before = snapshot_executions(spark)
        try:
            registry.QUERIES[name](spark, sf).collect()
        except Exception as ex:
            errors[name] = f"{type(ex).__name__}: {ex}"[:120]
            continue
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        # the harness boundary: the driver/bench release deferred
        # caches when they call the NEXT query; the sweep flushes
        # explicitly so the retained count below measures what
        # survives a completed query lifecycle, not the gap between
        # collect and the next call
        flush_pending_releases()
        retained = _disk_only_rdd_count(spark) - cache_before
        if retained > 0:
            if name in KNOWN_RETAINED_CACHES:
                retained_known[name] = retained
            else:
                retained_actionable[name] = retained
                print(f"!! RETAINED CACHE: {name} ({retained})",
                      flush=True)
        counts = {
            t: executed_scans(spark, before, t)
            for t in TABLES
        }
        hot = {t: c for t, c in counts.items() if c >= 3}
        if not hot:
            continue
        allowed = KNOWN_LEGITIMATE.get(name)
        if allowed is not None and all(
            c <= allowed.get(t, 0) for t, c in hot.items()
        ):
            known[name] = {**hot, "why": WHY.get(name, "documented")}
            print(f"# known: {name} {hot}", flush=True)
        else:
            actionable[name] = hot
            print(f"!! ACTIONABLE: {name} {hot}", flush=True)
    out = {
        "round": int(rnd),
        "what": (
            "Full-registry EXECUTED-scan sweep (plans/runtime.py "
            "counter, sf0.001, cold cache per query). Flag threshold "
            ">= 3 executed scans of one table; KNOWN_LEGITIMATE "
            "entries (documented multi-read semantics, r13 baseline) "
            "are recorded but not actionable; any NEW name or grown "
            "count is a regression."
        ),
        "n_actionable": len(actionable),
        "actionable": actionable,
        "known_legitimate": known,
        # r15: per-query session-cache hygiene, all 494 names — a
        # DISK_ONLY persist surviving a query's collect is a leak
        # unless documented in KNOWN_RETAINED_CACHES
        "n_retained_cache_actionable": len(retained_actionable),
        "retained_cache_actionable": retained_actionable,
        "retained_cache_known": {
            n: {"count": c, "why": KNOWN_RETAINED_CACHES[n]}
            for n, c in retained_known.items()
        },
        "errors": errors,
    }
    path = Path(__file__).parent / f"RUNTIME_SWEEP_r{rnd}.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=False))
    print(f"wrote {path}: {len(actionable)} actionable, "
          f"{len(known)} known, {len(retained_actionable)} retained-"
          f"cache actionable, {len(errors)} errors")


if __name__ == "__main__":
    main()
