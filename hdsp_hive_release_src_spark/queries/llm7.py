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

# Max members per blocking cell before the cell is dropped from the
# pair join (pair work per cell is size², so one degenerate cluster —
# all-zero vectors, a constant-embedding bug upstream — could
# otherwise dominate the whole stage). 20× the by-construction
# expected cell size of 50; replayed verbatim in the DuckDB oracle.
SEMANTIC_MAX_CELL = 1000

# IVF-style deterministic blocking, multi-probe, EXACT-DEDUP-FIRST
# (r6): identical embeddings collapse to one representative (min
# vec_id) BEFORE the codebook / assignment / pair join, and pairs are
# expanded back through group membership afterwards. On a corpus with
# no verbatim copies this is bit-identical to blocking the raw
# vectors (reps == vectors); on a clone-heavy corpus it removes the
# (clones per cell)² blow-up, making pair-join cost a function of
# DISTINCT density and the emitted output — run like a real pipeline:
# exact dedup first, semantic blocking second, one operator. DuckDB
# replays the identical grouping + assignment, so parity is full.
# The cell cap is interpolated from SEMANTIC_MAX_CELL so both engines
# share one definition (a drifted hardcode would break parity
# silently instead of failing at the definition site).
_DUCK_BLOCKED = f"""
    raw AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    grp AS (SELECT v, min(vec_id) AS rep FROM raw GROUP BY v),
    members AS (SELECT g.rep, raw.vec_id FROM raw JOIN grp g
                ON raw.v = g.v),
    n AS (
      SELECT rep AS vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM grp),
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
    m0 AS (
      SELECT a.cid, a.vec_id, n.v, n.nrm
      FROM assigned a JOIN n ON n.vec_id = a.vec_id),
    m AS (
      SELECT cid, vec_id, v, nrm FROM (
        SELECT *, count(*) OVER (PARTITION BY cid) AS csz FROM m0)
      WHERE csz <= {SEMANTIC_MAX_CELL})
"""


@query(
    "semantic_dedup",
    oracle=f"""
    WITH {_DUCK_BLOCKED},
    rp AS (
      SELECT DISTINCT a.vec_id AS r1, b.vec_id AS r2,
             round(list_sum(list_transform(range(1, 65),
                   i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cos
      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(range(1, 65),
            i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= 0.45),
    cross_pairs AS (
      SELECT least(m1.vec_id, m2.vec_id) AS v1,
             greatest(m1.vec_id, m2.vec_id) AS v2, rp.cos
      FROM rp JOIN members m1 ON m1.rep = rp.r1
              JOIN members m2 ON m2.rep = rp.r2),
    intra_pairs AS (
      SELECT m1.vec_id AS v1, m2.vec_id AS v2,
             round(list_sum(list_transform(n.v, x -> x * x))
                   / (n.nrm * n.nrm), 6) AS cos
      FROM n JOIN members m1 ON m1.rep = n.vec_id
             JOIN members m2 ON m2.rep = n.vec_id
                            AND m1.vec_id < m2.vec_id)
    SELECT v1, v2, cos FROM cross_pairs
    UNION ALL
    SELECT v1, v2, cos FROM intra_pairs
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

    Exact-dedup-first (r6): identical embeddings collapse to a
    min-vec_id representative before anything else — the codebook,
    assignment, cap, and pair join all run on DISTINCT vectors, and
    pairs expand back through the membership table at the end (clone
    pairs are trivially semantic dups; a clone-heavy corpus made the
    raw-vector pair join (clones/cell)²-bound, 70 s at the 10× clone
    stress vs output-proportional after this change). On a corpus
    with no verbatim copies the result is bit-identical to blocking
    raw vectors. This is exactly the production ordering: exact dedup
    → semantic dedup, fused into one operator.

    The assignment is MATERIALIZED before the pair join — Catalyst
    plans a self-join's two sides as two full subtrees (no exchange
    reuse across the alias), which would run the
    scan+broadcast+argmax pipeline twice; materializing the (cid,
    vec_id, v, nrm) table once and joining the table against itself
    is exactly what a production pipeline does (the assignment table
    is also the artifact later stages — cluster stats, re-probing —
    read).

    r17 (guide §5/§6, r16 verdict item 3): the materializations are
    ``localCheckpoint`` (reduced tiers: grp and assigned are
    Aggregate-rooted distinct-vector tables) and a DISK_ONLY persist
    with a query-boundary ``defer_release`` (members — fact-row
    count, one row per corpus vector), replacing three scratch
    PARQUET write+read roundtrips per call. The parquet scaffolding
    cost 3 write jobs + 3 read-back scans of real file I/O on every
    invocation — a fixed per-job cost locally, real distributed-FS
    traffic at scale; checkpoints keep the same single-build
    lifecycle (and the same 2 executed corpus scans, pinned in
    tests/test_scan_counts.py) with block reads instead of files.
    Measured at the 10× replica (count-timed, clearCache between
    shots, fresh process per variant, 3 interleaved rounds of
    best-of-4): old bests 3.263/3.314/2.901 s → new bests
    2.200/2.464/2.480 s (~25%), identical 93,800 rows every shot."""
    from hdsp_hive_release_src_spark.operators.materialize import (
        checkpoint_reduced,
        defer_release,
        persist_fact_rows,
    )

    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", to_double("embedding").alias("v")
    )
    # exact-dedup first: identical vectors collapse to one
    # representative (min vec_id); blocking and the pair join run on
    # DISTINCT vectors only, pairs expand back through membership at
    # the end. Grouping is on the raw double array — exact binary
    # equality, no string formatting to diverge between engines.
    # r13 runtime-scan fix: grp feeds FOUR downstream subtrees
    # (members, n, cent, assigned) and Catalyst replans each from the
    # corpus scan (4 executed embeddings scans measured); building the
    # distinct-vector table once drops that to 2 — the grp build and
    # the members raw-id join, the two reads that genuinely need the
    # corpus. The group table is also the exact-dedup artifact a
    # production pipeline keeps.
    grp = checkpoint_reduced(
        e.groupBy("v").agg(F.min("vec_id").alias("rep"))
    )
    members = persist_fact_rows(
        e.join(grp, "v").select("rep", "vec_id")
    )
    defer_release(lambda: members.unpersist(blocking=False))
    n = grp.select(
        F.col("rep").alias("vec_id"),
        "v",
        l2_norm(F.col("v")).alias("nrm"),
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
    assigned = checkpoint_reduced(
        n.join(B(cent))
        .select("vec_id", "v", "nrm", "cid", sim_to_cent.alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") <= 2)
        .select("cid", "vec_id", "v", "nrm")
    )
    # Cell-size cap (same design as the dedup band/df caps): a
    # spillable no-orderBy Window count drops any pathological cell
    # whose (size)² pair work would go quadratic — a degenerate
    # embedding cluster (e.g. a sea of zero vectors) cannot take the
    # join down with it. E[cell] = 50 by construction (2 probes,
    # every-25th codebook) at ANY corpus size, so the 1000 cap is 20×
    # headroom that never fires on healthy data (asserted in tests);
    # the oracle replays the identical cap, so parity checks the
    # documented recall contract, not luck.
    # r13 subtree-sweep fix: the cap was a cid-partitioned window that
    # both pair-join sides re-executed (two shuffles of the assigned
    # table). The keep-list is cell-dimension-sized: aggregate it
    # once, checkpoint, and broadcast-semi-join — both sides are now
    # map-side over the materialized assignment table.
    keep_cells = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("_csz"))
        .where(F.col("_csz") <= SEMANTIC_MAX_CELL)
        .select("cid")
        .localCheckpoint()
    )
    # r16 (guide §2.5, measured): the pair join's input is tiny in
    # BYTES (the assignment table) but quadratic in WORK (Σ cell²
    # candidate pairs, each a 64-dim cosine), so AQE's byte-based
    # partition coalescing (minPartitionSize=1m) merges the cid
    # exchange down to 1-2 tasks and the candidate stage runs nearly
    # serial (shot_diag: cpu_over_wall ~6 vs 16-23 on healthy
    # queries). An explicit cid-hash repartition sized to the core
    # count pins the quadratic stage's parallelism — rep_pairs noop
    # best-of-3 at the 10× replica: 1.76 s → 0.81 s. Scale-adaptive
    # by construction (defaultParallelism, not a constant); at real
    # scale per-cid groups stay ≤ SEMANTIC_MAX_CELL rows while cell
    # count grows, so a cid-hash spread over 2× cores stays balanced.
    cells = (
        assigned.join(B(keep_cells), "cid", "leftsemi")
        .repartition(
            spark.sparkContext.defaultParallelism * 2, "cid"
        )
    )
    a = cells.alias("a")
    b = cells.alias("b")
    cos = F.round(
        dot(F.col("a.v"), F.col("b.v"))
        / (F.col("a.nrm") * F.col("b.nrm")),
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
    # expand representative pairs back to member pairs (the exact-dup
    # groups collapsed above): cross pairs through the two membership
    # joins, intra-group pairs (identical vectors — cosine computed
    # the same way, numerically 1.0) from the group self-join. Output
    # size is the true pair count — the operator's cost is now
    # distinct-density pair work + O(output) expansion.
    m1 = members.select(
        F.col("rep").alias("r1"), F.col("vec_id").alias("mv1")
    )
    m2 = members.select(
        F.col("rep").alias("r2"), F.col("vec_id").alias("mv2")
    )
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
        .join(
            members.select("rep", F.col("vec_id").alias("mv1")), "rep"
        )
        .join(
            members.select("rep", F.col("vec_id").alias("mv2")), "rep"
        )
        .where(F.col("mv1") < F.col("mv2"))
        .select(
            F.col("mv1").alias("v1"), F.col("mv2").alias("v2"), "cos"
        )
    )
    return cross_pairs.unionAll(intra_pairs).orderBy("v1", "v2")


_PQ_M = 8       # subspaces
_PQ_DSUB = 8    # dims per subspace (8 x 8 = 64)
_PQ_K = 16      # centroids per subspace
_PQ_NQ = 3      # query vectors (vec_id < 3)


def _pq_oracle() -> str:
    """Unrolled PQ replay: md5-ranked 16-seed codebook per subspace,
    per-(vector, subspace) argmin codes (distances rounded to 9
    before the tie-break so ulp noise can't flip a code), ADC
    distance = sum over subspaces of query-to-assigned-centroid d²."""
    return f"""
    WITH emb AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    seeds AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
             v
      FROM (SELECT * FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_PQ_K})),
    sub AS (
      SELECT e.vec_id, m.m, s.k,
             round(list_sum(list_transform(range(1, {_PQ_DSUB + 1}),
               i -> (e.v[m.m * {_PQ_DSUB} + i]
                     - s.v[m.m * {_PQ_DSUB} + i])
                  * (e.v[m.m * {_PQ_DSUB} + i]
                     - s.v[m.m * {_PQ_DSUB} + i]))), 9) AS d2
      FROM emb e CROSS JOIN range(0, {_PQ_M}) m(m) CROSS JOIN seeds s),
    codes AS (
      SELECT vec_id, m, k AS code FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2, k) AS rn
        FROM sub) WHERE rn = 1),
    qd AS (
      SELECT vec_id AS query_id, m, k, d2 FROM sub
      WHERE vec_id < {_PQ_NQ}),
    adist AS (
      SELECT qd.query_id, c.vec_id AS neighbor_id,
             round(sum(qd.d2), 6) AS approx_d2
      FROM codes c
      JOIN qd ON qd.m = c.m AND qd.k = c.code
      WHERE c.vec_id <> qd.query_id
      GROUP BY qd.query_id, c.vec_id)
    SELECT query_id, neighbor_id, approx_d2,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY approx_d2, neighbor_id) AS rnk FROM adist)
    WHERE rnk <= 5
    ORDER BY query_id, rank
    """


@query("ann_product_quantization", oracle=_pq_oracle())
def ann_product_quantization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): each 64-dim
    vector compresses to 8 one-byte codes (one 16-way argmin per
    8-dim subspace against a deterministic md5-ranked codebook), and
    query-to-vector distance is approximated ADC-style — the query's
    precomputed distance to each subspace centroid, summed over the
    vector's codes. This is the memory-side ANN scale lever the
    IVF/LSH queries don't cover: the corpus shrinks 64 doubles → 8
    bytes (64×), so a 100 TB embedding store scans as ~1.5 TB of
    codes with NO per-pair float math (8 table lookups per
    candidate). Encoding is map-only (literal codebook, like the
    kmeans assignment); the 3 queries' 8×16 distance tables are
    driver-computed literals (the classic ADC lookup table). Code
    distances are rounded to 9 before the argmin tie-break in BOTH
    engines so an ulp cannot flip a code. In production the codes
    table is materialized once (as semantic_dedup materializes its
    cells) and re-encoded only on codebook refresh."""
    import hashlib as _hl

    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", to_double("embedding").alias("v")
    )
    seed_rows = (
        e.orderBy(
            F.md5(F.col("vec_id").cast("string")), "vec_id"
        )
        .limit(_PQ_K)
        .collect()
    )
    cents = [list(r.v) for r in seed_rows]  # 16 × 64

    def sub_d2_expr(m: int, k: int):
        cslice = F.array(
            *[
                F.lit(float(cents[k][m * _PQ_DSUB + i]))
                for i in range(_PQ_DSUB)
            ]
        )
        vslice = F.slice("v", m * _PQ_DSUB + 1, _PQ_DSUB)
        return F.round(
            F.aggregate(
                F.zip_with(vslice, cslice, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        )

    code_cols = [
        F.array_min(
            F.array(
                *[
                    F.struct(
                        sub_d2_expr(m, k).alias("d"),
                        F.lit(k).alias("k"),
                    )
                    for k in range(_PQ_K)
                ]
            )
        )["k"].alias(f"c{m}")
        for m in range(_PQ_M)
    ]
    codes = e.select("vec_id", *code_cols)

    qrows = {
        r.vec_id: list(r.v)
        for r in e.where(F.col("vec_id") < _PQ_NQ).collect()
    }

    def py_d2(q: list, m: int, k: int) -> float:
        s = 0.0
        for i in range(_PQ_DSUB):
            dlt = q[m * _PQ_DSUB + i] - cents[k][m * _PQ_DSUB + i]
            s += dlt * dlt
        return round(s, 9)

    # r13 runtime-scan fix: a union of per-query branches made
    # Catalyst re-run the encode scan once per query (3 executed
    # embeddings scans in the scoring job alone; 5 total with the two
    # setup collects). All queries' ADC sums are literal lookup
    # tables over the SAME code columns, so one pass computes every
    # (query, neighbor) distance: build a struct per query, explode —
    # the scoring job now scans the corpus exactly once however many
    # queries ride it.
    per_query = []
    for qid, qv in sorted(qrows.items()):
        dist = None
        for m in range(_PQ_M):
            tab = F.array(
                *[F.lit(py_d2(qv, m, k)) for k in range(_PQ_K)]
            )
            term = F.element_at(tab, F.col(f"c{m}") + 1)
            dist = term if dist is None else dist + term
        per_query.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                F.round(dist, 6).alias("approx_d2"),
            )
        )
    scored = (
        codes.select(
            "vec_id", F.explode(F.array(*per_query)).alias("q")
        )
        .where(F.col("vec_id") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("q.approx_d2").alias("approx_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        "approx_d2", "neighbor_id"
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )
