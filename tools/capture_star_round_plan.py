"""Capture the physical plan of ONE star round (simple + formatted) —
the unit the r16 window rewrite changed. The full dedup_components
plan is checkpoint-rooted (the loop materializes each round), so the
query-level capture cannot show the round's internal shape; this one
can.

Usage: PYTHONPATH=<repo> python tools/capture_star_round_plan.py <outfile>
"""

from __future__ import annotations

import sys
from pathlib import Path


def main() -> None:
    from pyspark.sql import functions as F

    from hdsp_hive_release_src_spark.operators.components import (
        _canon,
        _large_star,
        _small_star,
    )
    from hdsp_hive_release_src_spark.plans import explain_str
    from hdsp_hive_release_src_spark.session import get_spark

    outfile = sys.argv[1]
    spark = get_spark("capture_star_round", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.range(100).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 100).alias("dst")
    )
    rnd = _small_star(_large_star(_canon(src, "src", "dst")))
    text = (
        "== one large-star + small-star round, simple mode ==\n"
        + explain_str(rnd, "simple")
        + "\n\n== formatted ==\n"
        + explain_str(rnd, "formatted")
    )
    Path(outfile).write_text(text + "\n")
    print(f"# wrote {outfile} ({len(text)} chars)")


if __name__ == "__main__":
    main()
