"""SURVEY.md §2.4 continued — the end-to-end curation pipeline:
raw corpus → quality gate → near-dup removal → per-language retention
report, i.e. the composite flow every stage query (text_quality,
dedup_ngram_jaccard, …) exists to serve, wired together with one
oracle over the whole chain.

Scale shape: the quality gate is map-only; near-dup pairs come from
the inverted-index join (bounded candidates, see llm.py); the drop
set is tiny and broadcast into an anti join; one final shuffle on
language for the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.queries.llm import (
    _DUCK_SH_CAPPED,
    _DUCK_SHINGLES,
    _jaccard_pair_edges,
)
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast


def _kmeans_oracle_sql(k: int = 20, iterations: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd k-means as DuckDB CTEs: md5-ranked seeding, then
    per iteration a CROSS JOIN against the ≤k centroids with a
    row_number argmin (ties -> lowest cid, matching the Spark struct
    ordering) and a per-(cid, dim) average rebuild. Exact replay of the
    operator; centroid averages differ only in double summation order,
    which cannot flip an argmin on the well-separated corpus."""

    def dot(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}),"
            f" i -> {a}[i] * {b}[i]))"
        )

    ctes = [
        """emb AS (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)""",
        f"""cent0 AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
             v
      FROM (SELECT * FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}))""",
    ]
    for t in range(iterations):
        ctes.append(
            f"""d{t} AS (
      SELECT e.vec_id, e.v, s.cid,
             -2 * {dot('e.v', 's.v')}
               + list_sum(list_transform(s.v, x -> x * x)) AS d
      FROM emb e CROSS JOIN cent{t} s)"""
        )
        ctes.append(
            f"""a{t} AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, cid) AS rn
        FROM d{t}) WHERE rn = 1)"""
        )
        if t < iterations - 1:
            ctes.append(
                f"""m{t} AS (
      SELECT cid, i, avg(v[i]) AS m
      FROM a{t}, range(1, {dim + 1}) r{t}(i) GROUP BY cid, i)"""
            )
            ctes.append(
                f"""cent{t + 1} AS (
      SELECT cid, list(m ORDER BY i) AS v FROM m{t} GROUP BY cid)"""
            )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n_members
    FROM a{iterations - 1} GROUP BY cid ORDER BY cluster"""
    )


@query("kmeans_clusters", oracle=_kmeans_oracle_sql())
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (3 iterations, deterministic k=20
    md5-ranked seeding) over the embeddings — the iterative-algorithm
    class (driver sees only the k×64 codebook per round; corpus scanned
    once per iteration; assignment is a map-only literal-codebook
    expression, so the only per-round shuffle is the k×dim partial-agg
    centroid update). The oracle replays all 3 Lloyd rounds as unrolled
    DuckDB CTEs; tests additionally verify against an independent numpy
    implementation at sf0.001."""
    from hdsp_hive_release_src_spark.functions.vectors import to_double
    from hdsp_hive_release_src_spark.operators.kmeans import kmeans

    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", to_double("embedding").alias("v")
    )
    # the per-cluster rollup runs as kmeans' finalize so the operator
    # can release its corpus-sized DISK_ONLY cache before returning
    # (r13 advice: no session-lifetime persist leak) while keeping the
    # pinned single executed embeddings scan
    return kmeans(
        e,
        id_col="vec_id",
        vec_col="v",
        finalize=lambda a: (
            a.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("cluster")
        ),
    )


@query(
    "quality_filter_pipeline",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    jp AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    dups AS (
      SELECT DISTINCT d2 FROM jp
      JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5),
    docs AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    flagged AS (
      SELECT doc_id, lang,
             (len(ws) >= 30
              AND len(list_distinct(ws)) * 1.0 / len(ws) >= 0.35) AS ok,
             ((len(ws) >= 30
               AND len(list_distinct(ws)) * 1.0 / len(ws) >= 0.35)
              AND doc_id NOT IN (SELECT d2 FROM dups)) AS final
      FROM docs)
    SELECT lang,
           count(*) AS n_raw,
           CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_quality,
           CAST(count(*) FILTER (WHERE final) AS BIGINT) AS n_final,
           round(count(*) FILTER (WHERE final) * 1.0 / count(*), 4)
               AS retention
    FROM flagged GROUP BY lang ORDER BY lang
    """,
)
def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation chain end-to-end: (1) quality gate — ≥30 tokens and
    ≥0.35 distinct-token ratio (map-only); (2) near-dup removal —
    keep-first over Jaccard ≥ 0.5 pairs (drop set broadcast into an
    anti join); (3) per-language retention report. One oracle checks
    the WHOLE chain, not just its stages."""
    d = Catalog(spark, sf_dir).documents
    ws = F.split("text", " ")
    ok = (F.size(ws) >= 30) & (
        F.size(F.array_distinct(ws)) * 1.0 / F.size(ws) >= 0.35
    )
    flagged = d.select("doc_id", "lang", ok.alias("ok"))
    dups = (
        # r17: unsorted form — feeds a distinct, order-insensitive
        _jaccard_pair_edges(spark, sf_dir)
        .select(F.col("d2").alias("dup_id"))
        .distinct()
    )
    final = (
        flagged.join(
            B(dups), flagged.doc_id == F.col("dup_id"), "left"
        )
        .select(
            "lang",
            "ok",
            (F.col("ok") & F.col("dup_id").isNull()).alias("final"),
        )
    )
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.count_if("ok").alias("n_quality"),
            F.count_if("final").alias("n_final"),
            F.round(F.count_if("final") * 1.0 / F.count(F.lit(1)), 4).alias(
                "retention"
            ),
        )
        .orderBy("lang")
    )
