"""SURVEY.md §2.4 round-5 additions — cluster-blocked semantic
near-dup (SemDeDup-style): the scale-safe replacement for the exact
O(n²) cosine baseline.

The exact all-pairs query (`embedding_cosine_pairs`, llm.py) is the
verification twin: correct, oracle-matched, and incapable of running
at 100× (an unbounded n² self-join). Hyperplane LSH cannot prune at
τ=0.45 (the math in its docstring). What a real 100 TB curation
pipeline runs instead is semantic blocking: assign every vector to
its nearest coarse-centroid cells, then compare exactly ONLY within
cells — the SemDeDup shape (Abbas et al., 2023, arXiv:2303.09540):
near-duplicate pairs are overwhelmingly co-located in embedding
space, so per-cell exact comparison recovers them at O(Σ cell²) ≪
O(n²) cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.functions.vectors import (
    dot,
    l2_norm,
    to_double,
)
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

# IVF-style deterministic blocking, multi-probe: every vector lands in
# its 2 nearest cells of the every-25th-vector codebook (the same
# rand()-free codebook as ann_ivf_topk). DuckDB replays the identical
# assignment, so parity is full.
_DUCK_BLOCKED = """
    n AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
             WHERE vec_id % 25 = 0),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, cent.cid,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                   round(list_sum(list_transform(range(1, 65),
                         i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn), 6)
                   DESC, cent.cid) AS rn
        FROM n CROSS JOIN cent)
      WHERE rn <= 2),
    m AS (
      SELECT a.cid, a.vec_id, n.v, n.nrm
      FROM assigned a JOIN n ON n.vec_id = a.vec_id)
"""


@query(
    "semantic_dedup",
    oracle=f"""
    WITH {_DUCK_BLOCKED}
    SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2,
           round(list_sum(list_transform(range(1, 65),
                 i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cos
    FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(range(1, 65),
          i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= 0.45
    ORDER BY v1, v2
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-blocked semantic near-dup pairs (cos ≥ 0.45), SemDeDup
    shape with 2-probe assignment: each vector joins its TWO nearest
    cells of the deterministic IVF codebook (multi-probe recovers
    boundary-straddling pairs single-cell blocking misses — measured
    11/14 of the exact pairs at sf0.01 vs 0/14 single-probe on this
    near-threshold corpus); exact cosine then runs ONLY within cells —
    a cid-keyed shuffle join whose per-cell pair count is (cell
    size)², never the corpus². At 100 TB: one corpus scan for
    assignment (codebook broadcast, per-vector argmax, no corpus
    shuffle), one shuffle on cid, pair work Σ cell² with E[cell] =
    2n/ncells — raise ncells to hold cell size constant as the corpus
    grows. Recall trade (inherent to blocking): pairs sharing NO cell
    are missed; the oracle replays the identical blocking, so parity
    checks the operator's own contract, while `embedding_cosine_pairs`
    remains the exhaustive test-scale twin that measures the recall
    gap.

    The assignment is MATERIALIZED to parquet before the pair join —
    Catalyst plans a self-join's two sides as two full subtrees (no
    exchange reuse across the alias), which would run the
    scan+broadcast+argmax pipeline twice; writing the (cid, vec_id,
    v, nrm) table once and joining the table against itself is
    exactly what a production pipeline does (the assignment table is
    also the artifact later stages — cluster stats, re-probing —
    read)."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", to_double("embedding").alias("v")
    )
    n = e.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
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
    path = scratch_path("semantic_cells", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    assigned.write.parquet(path)
    spark.catalog.refreshByPath(path)
    cells = spark.read.parquet(path)
    a = cells.alias("a")
    b = cells.alias("b")
    cos = F.round(
        dot(F.col("a.v"), F.col("b.v"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= 0.45)
        .distinct()
        .orderBy("v1", "v2")
    )
