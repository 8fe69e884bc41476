"""Distributed Lloyd k-means over an array<double> column.

The canonical iterative-algorithm shape on Spark: per iteration the
corpus is scanned ONCE (assignment against a broadcast codebook), the
new codebook is a per-(cluster, dim) average — a mergeable aggregation
— and only the k×dim codebook ever reaches the driver (legitimate at
any corpus scale; k is small by construction). No rand(): the initial
codebook is a deterministic modulo sample, so reruns and retries
produce identical clusterings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.functions.vectors import dot


def _sq_dist(v, c):
    # |v|² - 2v·c + |c|² ranks identically to true distance for a
    # FIXED v; the |v|² term can't change the argmin, so rank on
    # -2v·c + |c|² and skip one fold per pair.
    return -2 * dot(v, c) + dot(c, c)


def kmeans(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    init_mod: int = 25,
    iterations: int = 3,
) -> DataFrame:
    """Return (id_col, cluster) assignments after ``iterations`` Lloyd
    rounds, seeded with rows where ``id % init_mod == 0``."""
    spark = vectors.sparkSession
    n = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    centroids = [
        (i, row.v)
        for i, row in enumerate(
            n.where(F.col("vid") % init_mod == 0)
            .orderBy("vid")
            .collect()
        )
    ]
    assign = None
    for _ in range(iterations):
        cent_df = F.broadcast(
            spark.createDataFrame(
                centroids, "cid int, c array<double>"
            )
        )
        w = Window.partitionBy("vid").orderBy("d", "cid")
        assign = (
            n.join(cent_df)
            .select(
                "vid", "v", "cid", _sq_dist(F.col("v"), F.col("c")).alias("d")
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "v", "cid")
        )
        new_cent = (
            assign.select(
                "cid", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("pairs")
            )
            .select(
                "cid",
                F.expr("transform(pairs, p -> p.m)").alias("c"),
            )
            .collect()
        )
        centroids = [(r.cid, r.c) for r in new_cent]
    return assign.select(
        F.col("vid").alias(id_col), F.col("cid").alias("cluster")
    )
