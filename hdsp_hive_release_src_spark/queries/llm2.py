"""SURVEY.md §2.4 continued — LLM-training-data pipeline, second wave:
PII redaction, stratified sampling, TF-IDF term ranking, n-gram counts,
length-bucketed sharding, near-dup connected components (iterative
label propagation with a recursive-CTE oracle), per-label embedding
centroids, and IVF-style ANN (coarse quantizer + probed cluster scan).

Scale notes are per-query; the common theme is: one shuffle per
logical reduction, candidate sets bounded before any pairwise work,
and every hot path in JVM built-ins (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.components import (
    connected_components_star,
)
from hdsp_hive_release_src_spark.functions.vectors import (
    dot,
    l2_norm,
    to_double,
)
from hdsp_hive_release_src_spark.queries.llm import (
    _DUCK_SH_CAPPED,
    _DUCK_SHINGLES,
    _jaccard_pair_edges,
    _parallel_docs,
)
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             substring(text, 1, 40) || ' contact user' || doc_id ||
             '@example.com or +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents WHERE doc_id < 300)
    SELECT doc_id,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS INTEGER)
               AS n_phones
    FROM synth ORDER BY doc_id
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regexp redaction of emails/phones plus per-doc
    match counts (the audit column a compliance pipeline keeps). The
    corpus has no real PII, so a deterministic synthetic contact line
    is appended first — the redaction path itself is the product.
    Pure JVM regexp — at 100 TB this is a map-only stage, no shuffle."""
    d = Catalog(spark, sf_dir).documents
    raw = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return (
        d.where(F.col("doc_id") < 300)
        .select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            ).alias("redacted"),
            F.regexp_count("raw", F.lit(_EMAIL_RE)).alias("n_emails"),
            F.regexp_count("raw", F.lit(_PHONE_RE)).alias("n_phones"),
        )
        .orderBy("doc_id")
    )


@query(
    "stratified_sample",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (WHERE doc_id % 10 < 2) AS n_sampled,
           round(count(*) FILTER (WHERE doc_id % 10 < 2) * 1.0 / count(*), 4)
               AS rate
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% systematic sample per language stratum — the
    rand()-free (doc_id mod) form: reproducible across retries and
    engines, no sampleBy() seed drift. Verification counts per
    stratum prove the rate landed."""
    d = Catalog(spark, sf_dir).documents
    sampled = F.count_if(F.col("doc_id") % 10 < 2)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            sampled.alias("n_sampled"),
            F.round(sampled * 1.0 / F.count(F.lit(1)), 4).alias("rate"),
        )
        .orderBy("lang")
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term,
           round(sum(tf) * ln(n_docs * 1.0 / df), 4) AS tfidf_sum,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           CAST(df AS BIGINT) AS doc_freq
    FROM tf JOIN df USING (term), n
    GROUP BY term, df, n_docs
    ORDER BY tfidf_sum DESC, term LIMIT 20
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF term ranking: tf per (doc, term), df per
    term, score = Σtf · ln(N/df). Two shuffles on term (tf is keyed by
    (doc,term) then re-keyed); N is a 1-row broadcast. Ordering is on
    the ROUNDED score + term so float noise can't reorder the top-k."""
    d = _parallel_docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # r12 scan-count re-plan: df is count(*) of the (doc, term) rows
    # per term — the tf table has exactly one row per (doc, term) —
    # so ONE aggregation chain serves tf-sum and df together instead
    # of a second tokenize scan for countDistinct. Remaining scans:
    # the tokenize pass + the column-pruned count(*) for N (parquet
    # footer metadata at any scale).
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.sum("tf").alias("total_tf"),
        F.count(F.lit(1)).alias("df"),
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        stats.join(B(n))
        .select(
            "term",
            F.round(
                F.col("total_tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf_sum"),
            F.col("total_tf").cast("long").alias("total_tf"),
            F.col("df").cast("long").alias("doc_freq"),
        )
        .orderBy(F.desc("tfidf_sum"), "term")
        .limit(20)
    )


@query(
    "ngram_counts",
    oracle="""
    WITH grams AS (
      SELECT unnest(list_transform(range(1, len(ws)),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM (SELECT string_split(text, ' ') AS ws FROM documents))
    SELECT bigram, count(*) AS n
    FROM grams GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30
    """,
)
def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency top-30 — the n-gram statistics pass of
    a data-quality pipeline. Bigrams are built array-side (JVM
    higher-order transform over the token array: no self-join, no
    window), then one count shuffle; integer counts order identically
    everywhere, ties broken by the bigram string."""
    d = _parallel_docs(spark, sf_dir)
    ws = F.split("text", " ")
    bigrams = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 2),"
        " i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(30)
    )


@query(
    "length_shard_stats",
    oracle="""
    SELECT CAST(len(string_split(text, ' ')) // 16 AS BIGINT) AS len_bucket,
           doc_id % 8 AS shard,
           count(*) AS n_docs,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
    FROM documents
    GROUP BY len_bucket, shard ORDER BY len_bucket, shard
    """,
)
def length_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed sharding audit: token-length bucket × mod-8
    shard occupancy — the layout check before writing training shards
    (balanced shards, length-homogeneous batches). One shuffle on the
    tiny (bucket, shard) key space."""
    d = Catalog(spark, sf_dir).documents
    n_tok = F.size(F.split("text", " "))
    return (
        d.groupBy(
            F.floor(n_tok / 16).alias("len_bucket"),
            (F.col("doc_id") % 8).alias("shard"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(n_tok), 4).alias("avg_tokens"),
        )
        .orderBy("len_bucket", "shard")
    )


def near_dup_component_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(id, lbl) labels: connected components over the Jaccard ≥ 0.5
    pair graph via alternating large-star/small-star
    (operators/components.py) — bounded message fan-out, O(log² n)
    rounds, each round contracting the edge list toward one star edge
    per node; on the 10× stress replica this halves the wall-clock of
    the min-label-propagation loop it replaced (5.9 s vs 10.7-19.6 s,
    identical 4770 labels), and at 100 TB it is the form that
    terminates on chain-shaped components. The replaced loop is kept
    as label_propagation_component_labels and the two are
    lockstep-equal by tests/test_components_star.py. Shared by
    dedup_components and dedup_keep_best."""
    # r17: unsorted pair form — the checkpoint/union consumers are
    # order-insensitive; the sorted form paid a range exchange
    pairs = _jaccard_pair_edges(spark, sf_dir).select("d1", "d2")
    return connected_components_star(pairs, "d1", "d2")


def label_propagation_component_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pre-r10 min-label-propagation fixpoint, kept as the
    independent reference implementation for the star operator's
    lockstep test: each round is one join + one min-agg, converging in
    O(component diameter) rounds (near-dup clusters are shallow)."""
    # r17: unsorted pair form — the checkpoint/union consumers are
    # order-insensitive; the sorted form paid a range exchange
    pairs = _jaccard_pair_edges(spark, sf_dir).select("d1", "d2")
    edges = (
        pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .unionByName(
            pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst"))
        )
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .cache()
    )
    # Convergence probe every 2nd round: sum(min-label) is monotonically
    # non-increasing, so equality across a two-round gap proves both
    # rounds were no-ops. Each probe (the action that materializes the
    # newest generation) unpersists every superseded cached generation.
    prev_sum = None
    superseded: list[DataFrame] = []
    for i in range(12):  # diameter bound; near-dup clusters are tiny
        msgs = edges.join(
            labels, edges.src == labels.id
        ).select(F.col("dst").alias("id"), "lbl")
        superseded.append(labels)
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .cache()
        )
        if i % 2 == 1:
            cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
            for gen in superseded:
                gen.unpersist()
            superseded = []
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    # the loop always exits just after a probe (i odd or break), so the
    # final generation is materialized and the edge cache is done
    edges.unpersist()
    return labels


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    {_DUCK_SH_CAPPED},
    jpairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT d1, d2 FROM jpairs
      JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5),
    edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
              UNION ALL SELECT d2, d1 FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT component, CAST(count(*) AS BIGINT) AS n_members,
           array_to_string(list_sort(list(id)), ',') AS members
    FROM comp GROUP BY component ORDER BY component
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters rolled up per component; the oracle computes
    the same fixpoint as a recursive CTE."""
    labels = near_dup_component_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("lbl").alias("component"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            # joined string, not array: scalar cells keep every driver-side
            # pandas canonicalization (sort/hash) well-defined
            F.concat_ws(",", F.array_sort(F.collect_list("id"))).alias(
                "members"
            ),
        )
        .orderBy("component")
    )


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, dim, round(avg(val), 6) AS centroid_val,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM (
      SELECT label,
             unnest(list_transform(embedding,
                    (x, i) -> {'dim': i - 1, 'val': CAST(x AS DOUBLE)}),
                    recursive := true)
      FROM embeddings)
    WHERE dim < 8
    GROUP BY label, dim ORDER BY label, dim
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (first 8 dims shown): posexplode
    to (label, dim, val) rows then a mergeable avg — the relational
    formulation of element-wise vector mean (no array re-assembly, so
    partial aggregation stays map-side combinable at any scale)."""
    e = Catalog(spark, sf_dir).embeddings
    return (
        e.select(
            "label", F.posexplode(to_double("embedding")).alias("dim", "val")
        )
        .where(F.col("dim") < 8)
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg("val"), 6).alias("centroid_val"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
        .orderBy("label", "dim")
    )


_DUCK_IVF = """
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
      WHERE rn = 1),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT n.vec_id AS query_id, cent.cid,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                   round(list_sum(list_transform(range(1, 65),
                         i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn), 6)
                   DESC, cent.cid) AS rn
        FROM n CROSS JOIN cent WHERE n.vec_id < 5)
      WHERE rn <= 3)
"""


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_DUCK_IVF},
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, 65),
                   i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos
      FROM probes p
      JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id
      JOIN n q ON q.vec_id = p.query_id
      JOIN n c ON c.vec_id = a.vec_id)
    SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rnk FROM scored)
    WHERE rnk <= 10
    ORDER BY query_id, rank
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a deterministic coarse codebook (every 25th
    vector — rand()-free so the oracle reproduces it), vectors assigned
    to their nearest centroid, queries probe their 3 nearest cells and
    scan only those cells' members. The 100 TB shape: corpus scanned
    once for assignment (broadcast codebook), per-query work is
    nprobe/ncells of the corpus; here ~12% vs the brute-force 100%."""
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
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), "cid"
    )
    assigned = (
        n.join(B(cent))
        .select("vec_id", "v", "nrm", "cid", sim_to_cent.alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    probes = (
        n.where(F.col("vec_id") < 5)
        .join(B(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "cid",
            sim_to_cent.alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")
            ),
        )
        .where(F.col("rn") <= 3)
        .select("query_id", "qv", "qn", F.col("cid").alias("pcid"))
    )
    scored = (
        assigned.join(
            B(probes),
            (F.col("cid") == F.col("pcid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )
