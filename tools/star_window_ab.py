"""A/B probe: window-min star ops vs the shipped groupBy+join form.

The shipped ``_large_star`` / ``_small_star`` each compute a per-node
min with a groupBy and JOIN it back onto the edge stream (guide §2.4:
"two operations keyed the same way can often share one exchange").
The candidate rewrite computes the same min with
``F.min(...).over(Window.partitionBy("u"))`` — the min rides the SAME
exchange the edge stream needs anyway, deleting the join (and for
small-star the union as well: each input row maps to exactly one
output row via a CASE, since the unique row with v == m per u IS the
parent edge).

Protocol: interleaved A/B/A/B... shots of the full dedup_components
query on the 10× replica (same clearCache + count() action as
bench.py's stress tier), after one untimed warmup of each variant.
Equality of results is asserted every shot via (count,
bit_xor(xxhash64(*))) over the output frame.

Usage: python tools/star_window_ab.py [replica_dir] [shots_per_variant]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.operators import components
from hdsp_hive_release_src_spark.session import (
    bench_driver_mem,
    get_spark,
)

# The pre-r16-window forms, inlined verbatim so the A/B stays
# reproducible after the rewrite shipped (capturing
# components._large_star at import would now alias the window form).


def _large_star_join(e: DataFrame) -> DataFrame:
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star_join(e: DataFrame) -> DataFrame:
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    joined = e.join(mins, "u")
    moved = joined.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    parent = mins.select("u", F.col("m").alias("v"))
    return moved.unionByName(parent).distinct()


_ORIG_LARGE = _large_star_join
_ORIG_SMALL = _small_star_join


def _large_star_window(e: DataFrame) -> DataFrame:
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    return (
        sym.withColumn(
            "m", F.least(F.min("v").over(w), F.col("u"))
        )
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star_window(e: DataFrame) -> DataFrame:
    w = Window.partitionBy("u")
    return (
        e.withColumn("m", F.min("v").over(w))
        .select(
            F.when(F.col("v") != F.col("m"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("u"),
            F.col("m").alias("v"),
        )
        .distinct()
    )


def _set_variant(name: str) -> None:
    if name == "window":
        components._large_star = _large_star_window
        components._small_star = _small_star_window
    else:
        components._large_star = _ORIG_LARGE
        components._small_star = _ORIG_SMALL


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / "_scratch" / "stress10x"
    )
    shots = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", bench_driver_mem())
    spark = get_spark("star-window-ab")
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    fn = registry.QUERIES["dedup_components"]

    def run(tag: str) -> tuple[float, tuple]:
        _set_variant(tag)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ab:{tag}")
        t0 = time.time()
        df = fn(spark, replica)
        sig_row = df.agg(
            F.count(F.lit(1)),
            F.expr("bit_xor(xxhash64(component, n_members, members))"),
        ).collect()[0]
        wall = time.time() - t0
        return wall, (sig_row[0], sig_row[1], components.LAST_RUN_ROUNDS)

    # Warmup both variants (codegen compile, worker pool)
    spark.range(0, 100_000, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for tag in ("orig", "window"):
        w, sig = run(tag)
        print(f"warmup {tag}: {w:.2f}s sig={sig}", flush=True)

    results: dict[str, list[float]] = {"orig": [], "window": []}
    sigs: dict[str, set] = {"orig": set(), "window": set()}
    for i in range(shots):
        for tag in ("orig", "window"):
            w, sig = run(tag)
            results[tag].append(round(w, 3))
            sigs[tag].add(sig)
            print(f"shot {i} {tag}: {w:.2f}s sig={sig}", flush=True)
    print("RESULTS", results, flush=True)
    print("SIGS equal:", sigs["orig"] == sigs["window"],
          sigs, flush=True)
    # r16 ADVICE: fail loudly on a label divergence — the A/B is only
    # evidence if result equality is ASSERTED every run, not printed
    assert sigs["orig"] == sigs["window"], (
        f"variant outputs diverged: {sigs}"
    )


if __name__ == "__main__":
    main()
