"""Stage budget for semantic_dedup at stress scale (guide §1: measure
first, isolate with the noop sink). Times, best-of-2 each after one
warmup, the cumulative prefixes of the operator's pipeline:

  1. grp parquet write          (exact-dedup groupBy on the raw array)
  2. members parquet write      (raw ⋈ grp on v, broadcast expected)
  3. assigned parquet write     (codebook broadcast + argmax window)
  4. rep_pairs                  (within-cell self-join + distinct)
  5. full query                 (expansion joins + union + orderBy)

Usage: python tools/semantic_profile.py [replica_dir]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.functions.vectors import (
    dot,
    l2_norm,
    to_double,
)
from hdsp_hive_release_src_spark.queries.llm7 import SEMANTIC_MAX_CELL
from hdsp_hive_release_src_spark.session import (
    bench_driver_mem,
    get_spark,
)
from hdsp_hive_release_src_spark.sources.io import scratch_path

B = F.broadcast


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_all(spark, sf_dir, upto):
    """Re-run the pipeline from scratch up to stage `upto`."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", to_double("embedding").alias("v")
    )
    grp = e.groupBy("v").agg(F.min("vec_id").alias("rep"))
    gpath = scratch_path("semprof_groups", sf_dir)
    shutil.rmtree(gpath, ignore_errors=True)
    grp.write.parquet(gpath)
    spark.catalog.refreshByPath(gpath)
    grp = spark.read.parquet(gpath)
    if upto == 1:
        return
    members = e.join(grp, "v").select("rep", "vec_id")
    mpath = scratch_path("semprof_members", sf_dir)
    shutil.rmtree(mpath, ignore_errors=True)
    members.write.parquet(mpath)
    spark.catalog.refreshByPath(mpath)
    members = spark.read.parquet(mpath)
    if upto == 2:
        return
    n = grp.select(
        F.col("rep").alias("vec_id"), "v", l2_norm(F.col("v")).alias("nrm")
    )
    cent = n.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sim_to_cent = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cid")
    assigned = (
        n.join(B(cent))
        .select("vec_id", "v", "nrm", "cid", sim_to_cent.alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") <= 2)
        .select("cid", "vec_id", "v", "nrm")
    )
    path = scratch_path("semprof_cells", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    assigned.write.parquet(path)
    spark.catalog.refreshByPath(path)
    if upto == 3:
        return
    keep_cells = (
        spark.read.parquet(path)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("_csz"))
        .where(F.col("_csz") <= SEMANTIC_MAX_CELL)
        .select("cid")
        .localCheckpoint()
    )
    cells = spark.read.parquet(path).join(B(keep_cells), "cid", "leftsemi")
    a = cells.alias("a")
    b = cells.alias("b")
    cos = F.round(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    rep_pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("r1"),
            F.col("b.vec_id").alias("r2"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= 0.45)
        .distinct()
    )
    if upto == 4:
        noop(rep_pairs)
        return
    m1 = members.select(F.col("rep").alias("r1"), F.col("vec_id").alias("mv1"))
    m2 = members.select(F.col("rep").alias("r2"), F.col("vec_id").alias("mv2"))
    cross_pairs = (
        rep_pairs.join(m1, "r1")
        .join(m2, "r2")
        .select(
            F.least("mv1", "mv2").alias("v1"),
            F.greatest("mv1", "mv2").alias("v2"),
            "cos",
        )
    )
    self_cos = F.round(
        dot(F.col("v"), F.col("v")) / (F.col("nrm") * F.col("nrm")), 6
    )
    intra_pairs = (
        n.select(F.col("vec_id").alias("rep"), self_cos.alias("cos"))
        .join(members.select("rep", F.col("vec_id").alias("mv1")), "rep")
        .join(members.select("rep", F.col("vec_id").alias("mv2")), "rep")
        .where(F.col("mv1") < F.col("mv2"))
        .select(F.col("mv1").alias("v1"), F.col("mv2").alias("v2"), "cos")
    )
    noop(cross_pairs.unionAll(intra_pairs).orderBy("v1", "v2"))


def main():
    import os

    replica = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / "_scratch" / "stress10x"
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", bench_driver_mem())
    spark = get_spark("semantic-profile")
    spark.range(0, 100_000, 1, 32).mapInPandas(lambda it: it, "id long").count()
    labels = {
        1: "grp write",
        2: "+ members write",
        3: "+ assigned write",
        4: "+ rep_pairs (noop)",
        5: "full query (noop)",
    }
    # warmup full pipeline once
    stage_all(spark, replica, 5)
    for upto in (1, 2, 3, 4, 5):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            stage_all(spark, replica, upto)
            best = min(best, time.time() - t0)
        print(f"stage {upto} ({labels[upto]}): {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
