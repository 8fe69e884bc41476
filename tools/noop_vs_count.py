"""Guide §1.4 measurement audit: count() vs the noop sink.

The bench has timed ``.count()`` since r1. count() lets the optimizer
prune aggregate values, drop final sorts (EliminateSorts), and
sometimes skip whole subtrees — so a count-timed number can undercount
the real query cost. This tool times every headliner both ways at the
bench scale (best-of-2, after the same sf0.001 warmup) and prints the
per-query delta, so OPTIMIZATION_r16.md can say with numbers whether
the historical series has a measurement bug and how big it is.

Usage: PYTHONPATH=/root/repo python tools/noop_vs_count.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _best2(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINERS

    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.session import (
        bench_driver_mem,
        get_spark,
    )

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", bench_driver_mem())
    registry.load_all()
    spark = get_spark(app_name="noop_vs_count")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    for name in HEADLINERS:
        registry.QUERIES[name](spark, warm).count()
        registry.QUERIES[name](spark, warm).write.format("noop").mode(
            "overwrite"
        ).save()
    out = {}
    for name in HEADLINERS:
        fn = registry.QUERIES[name]
        count_s = _best2(lambda: fn(spark, sf_dir).count())
        noop_s = _best2(
            lambda: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        out[name] = {
            "count_s": count_s,
            "noop_s": noop_s,
            "noop_over_count": (
                round(noop_s / count_s, 2) if count_s > 0 else None
            ),
        }
        print(f"# {name}: count {count_s}s  noop {noop_s}s", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
