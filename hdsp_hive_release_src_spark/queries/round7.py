"""SURVEY.md §2 round-7 additions — the last HiveQL clause-family
polish plus new first-class LLM-pipeline operators:

- ``cluster_by_clause`` — HiveQL ``CLUSTER BY`` (the DISTRIBUTE BY +
  SORT BY shorthand), completing the layout-control clause family
  next to ``distribute_sort_by``.
- ``explain_plan_surface`` — the ``EXPLAIN FORMATTED`` SQL surface
  used as a plan-regression tripwire: the query inspects the plan of
  a representative broadcast-join aggregation and emits one boolean
  row per plan property (filters pushed to parquet, broadcast join
  chosen, no cartesian product, codegen active). The oracle pins the
  expected properties as literals, so any planner regression flips a
  boolean and hash-mismatches at the gate.
- ``bm25_ranked_retrieval`` — Okapi BM25 scoring of the corpus
  against a fixed term set: the classic lexical retrieval baseline
  every RAG/data-curation stack needs next to the ANN family.
- ``distinct_set_algebra`` — audience set algebra (union /
  intersection / differences / Jaccard) between two behavior
  cohorts, computed sketch-style with one shuffle.
- ``boilerplate_position_bias`` — positional token statistics:
  tokens over-represented in document heads (header/boilerplate
  detection for corpus cleaning). Pure integer arithmetic.
- ``crypto_funcs_roundtrip`` — aes_encrypt / aes_decrypt /
  try_aes_decrypt + sha2 (the Hive 4 column-crypto surface).
  DuckDB has no AES, so the oracle checks the invariants instead:
  decrypt(encrypt(x)) == x, the exact PKCS ciphertext length, NULL
  on a wrong key, and an independently computed sha256 digest.

Scale notes are per-query; none of these introduces a new shuffle
shape beyond one keyed exchange (bm25/boilerplate are map-side
scoring with a 1-row broadcast totals join — the established
"totals broadcast" pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "cluster_by_clause",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
)
def cluster_by_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL ``CLUSTER BY`` — shorthand for DISTRIBUTE BY k SORT BY k
    (same-key co-location + within-partition order, the pre-bucketing
    write layout). The contract is row-SET equality, matching
    ``distribute_sort_by``; tests/test_round7.py additionally asserts
    the layout property itself (each partition sorted by the cluster
    key, no key split across partitions)."""
    cat = Catalog(spark, sf_dir)
    cat.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 45
        CLUSTER BY l_suppkey
        """
    )


#: (feature, expected) rows for explain_plan_surface; the oracle is
#: generated from this table so both sides share one definition.
_PLAN_FEATURES = (
    ("batched_columnar_scan", True),
    ("broadcast_hash_join", True),
    ("cartesian_product", False),
    ("filters_pushed_to_scan", True),
    ("partial_aggregation", True),
)


def _plan_features_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, {str(exp).upper()} AS present"
        for name, exp in _PLAN_FEATURES
    )
    return f"SELECT feature, present FROM ({rows}) ORDER BY feature"


@query("explain_plan_surface", oracle=_plan_features_oracle())
def explain_plan_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXPLAIN FORMATTED`` as a first-class query surface AND a
    plan-regression tripwire. We explain a representative
    dim-broadcast aggregation (orders ⋈ customer with a selective
    pushable filter) and emit one row per graded plan property. The
    oracle pins the expected values, so a regression (filter no
    longer reaching the parquet scan, broadcast degrading to
    shuffle/cartesian, codegen lost) flips a boolean and fails the
    value-hash at the gate. The plan string is one driver-side row —
    the only collect here is the EXPLAIN output itself."""
    cat = Catalog(spark, sf_dir)
    cat.orders.createOrReplaceTempView("orders")
    cat.customer.createOrReplaceTempView("customer")
    plan = spark.sql(
        """
        EXPLAIN FORMATTED
        SELECT /*+ BROADCAST(customer) */ c_mktsegment,
               count(*) AS n, sum(o_totalprice) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 50000 AND c_mktsegment <> 'NONE'
        GROUP BY c_mktsegment
        """
    ).collect()[0][0]
    feats = {
        "batched_columnar_scan": "Batched: true" in plan,
        "broadcast_hash_join": "BroadcastHashJoin" in plan,
        "cartesian_product": "CartesianProduct" in plan,
        "filters_pushed_to_scan": "PushedFilters: [" in plan
        and "IsNotNull(o_custkey)" in plan,
        "partial_aggregation": "partial_count" in plan
        and "partial_sum" in plan,
    }
    return (
        spark.createDataFrame(
            [Row(feature=k, present=v) for k, v in feats.items()]
        )
        .orderBy("feature")
    )


#: Fixed BM25 query terms, in scoring order (the per-document score is
#: one fixed left-associated expression over these, so float addition
#: order is partition-independent — the dsir lesson).
_BM25_TERMS = ("join", "hash", "vector", "customer")
_BM25_K1 = "1.2"
_BM25_B = "0.75"


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    k1, b = _BM25_K1, _BM25_B
    terms = " + ".join(
        f"(ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * ({k1} + 1.0))"
        f" / (tf{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH tf AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl, {tf_cols}
      FROM documents),
    tot AS (
      SELECT count(*) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, {df_cols}
      FROM tf),
    scored AS (
      SELECT doc_id, round({terms}, 6) AS bm25
      FROM tf CROSS JOIN tot)
    SELECT doc_id, bm25,
           rank() OVER (ORDER BY bm25 DESC) AS rnk
    FROM scored ORDER BY rnk, doc_id LIMIT 50
    """


@query("bm25_ranked_retrieval", oracle=_bm25_oracle())
def bm25_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (k1=1.2, b=0.75) over the corpus
    for a fixed term set — the sparse-retrieval baseline next to the
    dense ANN family (ann_*). Scale shape: term frequencies are
    computed map-side with JVM higher-order lambdas (no explode, no
    per-token shuffle); the corpus statistics (N, avgdl, per-term
    document frequencies) are ONE row, broadcast back over the scored
    scan; top-k is a rank window over the rounded score. Float
    determinism: each document's score is a single fixed
    left-associated expression over literal terms — integer tf/df/dl
    plus one exact int/int average — so no accumulation-order
    sensitivity anywhere; the oracle mirrors the identical expression
    tree."""
    d = Catalog(spark, sf_dir).documents
    toks = F.split("text", " ")

    def term_freq(term: str):
        # a 1-arg lambda: a 2-arg one would be read as (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    # r12 scan-count re-plan: the corpus-stats aggregate derives from
    # tf and re-executed the tokenize scan (TWO corpus scans
    # measured). tf is six narrow columns per document — eagerly
    # localCheckpoint-ed, the whole query is ONE corpus scan plus a
    # doc-count-sized local materialization (at 100 TB: ~2% of the
    # text volume vs a second full scan + re-tokenize).
    tf = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            term_freq(t).alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint()
    tot = tf.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    k1, b = float(_BM25_K1), float(_BM25_B)
    joined = tf.crossJoin(F.broadcast(tot))
    score = None
    for i in range(len(_BM25_TERMS)):
        tfi, dfi = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n") - dfi + 0.5) / (dfi + 0.5)
        )
        part = (
            idf
            * (tfi * F.lit(k1 + 1.0))
            / (
                tfi
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            )
        )
        score = part if score is None else score + part
    from pyspark.sql import Window

    scored = joined.select(
        "doc_id", F.round(score, 6).alias("bm25")
    )
    # Distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # partial top-50, no global sort/shuffle), THEN rank inside the 50
    # survivors. Rank within the top-k set equals global rank for
    # every surviving row: rank counts strictly-greater scores, and
    # all of those sort into the top-k ahead of the row.
    topk = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(50)
    w = Window.orderBy(F.col("bm25").desc())
    return topk.withColumn("rnk", F.rank().over(w)).orderBy(
        "rnk", "doc_id"
    )


@query(
    "distinct_set_algebra",
    oracle="""
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS is_p,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS is_c
      FROM events
      WHERE event_type IN ('purchase', 'click')
      GROUP BY user_id)
    SELECT CAST(sum(is_p) AS BIGINT) AS n_purchase,
           CAST(sum(is_c) AS BIGINT) AS n_click,
           CAST(count(*) AS BIGINT) AS n_union,
           CAST(sum(is_p * is_c) AS BIGINT) AS n_intersect,
           CAST(sum(is_p * (1 - is_c)) AS BIGINT) AS n_purchase_only,
           CAST(sum(is_c * (1 - is_p)) AS BIGINT) AS n_click_only,
           CAST(sum(is_p * is_c) * 1000 // count(*) AS BIGINT)
               AS jaccard_permille
    FROM flags
    """,
)
def distinct_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra — |A|, |B|, |A∪B|, |A∩B|, |A\\B|, |B\\A|
    and integer-permille Jaccard between the purchase and click user
    sets. This is the exact-computation twin of the sketch set-ops
    family (hll_sketch_union / theta sketches in Hive): one shuffle
    keyed on user_id with map-side partial max() flags, then a single
    global fold — the plan that holds at 100 TB because the post-
    shuffle state is one bit per cohort per user. Jaccard is integer
    division (permille), so the output is all-BIGINT exact."""
    ev = Catalog(spark, sf_dir).events
    flags = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("is_p"),
            F.max(
                (F.col("event_type") == "click").cast("int")
            ).alias("is_c"),
        )
    )
    return flags.agg(
        F.sum("is_p").cast("long").alias("n_purchase"),
        F.sum("is_c").cast("long").alias("n_click"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.sum(F.col("is_p") * F.col("is_c"))
        .cast("long")
        .alias("n_intersect"),
        F.sum(F.col("is_p") * (1 - F.col("is_c")))
        .cast("long")
        .alias("n_purchase_only"),
        F.sum(F.col("is_c") * (1 - F.col("is_p")))
        .cast("long")
        .alias("n_click_only"),
        F.expr("sum(is_p * is_c) * 1000 div count(*)")
        .cast("long")
        .alias("jaccard_permille"),
    )


#: head window (tokens 0..HEAD-1) and minimum corpus frequency for
#: boilerplate_position_bias — shared by impl + oracle.
_BP_HEAD = 5
_BP_MIN_TOTAL = 100


@query(
    "boilerplate_position_bias",
    oracle=f"""
    WITH pos AS (
      SELECT unnest(list_transform(string_split(text, ' '),
                    (x, i) -> {{'token': x, 'pos': i - 1}}),
             recursive := true)
      FROM documents),
    per_tok AS (
      SELECT token, count(*) AS n_total,
             CAST(sum(CASE WHEN pos < {_BP_HEAD} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_head
      FROM pos GROUP BY token),
    tot AS (
      SELECT sum(n_total) AS all_total, sum(n_head) AS all_head
      FROM per_tok)
    SELECT token, n_total, n_head,
           CAST(n_head * all_total * 1000
                // (n_total * all_head) AS BIGINT)
               AS head_bias_permille
    FROM per_tok CROSS JOIN tot
    WHERE n_total >= {_BP_MIN_TOTAL}
    ORDER BY head_bias_permille DESC, token
    """,
)
def boilerplate_position_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positional token statistics for boilerplate/header detection:
    tokens over-represented in the first {HEAD} positions of
    documents relative to their corpus share (headers, nav text, and
    license banners show bias ≫ 1000‰; body vocabulary ≈ 1000‰).
    Used to build strip-lists when cleaning crawl corpora. Scale
    shape: posexplode → one token-keyed shuffle with map-side partial
    counts (head membership folds into the same agg — no second
    scan), the two corpus totals broadcast back as one row. All
    arithmetic is exact integers (bias is bigint permille via integer
    division) — zero float-order risk by construction."""
    d = Catalog(spark, sf_dir).documents
    # r13 subtree-sweep fix: the vocab table fed both the totals and
    # the output join, re-running the tokenize scan twice. Checkpoint
    # the vocab-sized table; the totals read it.
    per_tok = (
        d.select(
            F.posexplode(F.split("text", " ")).alias("pos", "token")
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                (F.col("pos") < _BP_HEAD).cast("int")
            ).alias("n_head"),
        )
        .localCheckpoint()
    )
    tot = per_tok.agg(
        F.sum("n_total").alias("all_total"),
        F.sum("n_head").alias("all_head"),
    )
    return (
        per_tok.crossJoin(F.broadcast(tot))
        .where(F.col("n_total") >= _BP_MIN_TOTAL)
        .select(
            "token",
            "n_total",
            "n_head",
            F.expr(
                "n_head * all_total * 1000 div (n_total * all_head)"
            )
            .cast("long")
            .alias("head_bias_permille"),
        )
        .orderBy(F.col("head_bias_permille").desc(), "token")
    )


#: 16-byte AES key used by crypto_funcs_roundtrip (a test vector, not
#: a secret — both sides of the parity check are in this repo).
_AES_KEY = "0123456789abcdef"


@query(
    "crypto_funcs_roundtrip",
    oracle="""
    SELECT c_custkey, c_name AS decrypted,
           CAST(16 * (strlen(c_name) // 16 + 1) AS BIGINT)
               AS cipher_len,
           TRUE AS wrong_key_is_null,
           sha256(c_name) AS sha_hex
    FROM customer WHERE c_custkey < 100 ORDER BY c_custkey
    """,
)
def crypto_funcs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level crypto surface (Hive 4 / Spark aes_* builtins):
    aes_encrypt → aes_decrypt round-trip in deterministic ECB/PKCS
    mode, try_aes_decrypt's NULL contract on a wrong key, and sha2
    digests. DuckDB has no AES, so the oracle verifies the
    INVARIANTS: decrypt(encrypt(x)) must equal x, the PKCS ciphertext
    length is exactly 16·(⌊len/16⌋+1) bytes, a wrong key yields NULL
    (not an error), and the sha256 hex digest matches DuckDB's
    independent implementation. All map-side, no shuffle."""
    c = Catalog(spark, sf_dir).customer
    key = F.lit(_AES_KEY).cast("binary")
    bad_key = F.lit("ffffffffffffffff").cast("binary")
    enc = F.aes_encrypt(
        F.col("c_name").cast("binary"), key, F.lit("ECB"), F.lit("PKCS")
    )
    return (
        c.where(F.col("c_custkey") < 100)
        .select(
            "c_custkey",
            F.aes_decrypt(enc, key, F.lit("ECB"), F.lit("PKCS"))
            .cast("string")
            .alias("decrypted"),
            F.length(enc).cast("long").alias("cipher_len"),
            F.try_aes_decrypt(enc, bad_key, F.lit("ECB"), F.lit("PKCS"))
            .isNull()
            .alias("wrong_key_is_null"),
            F.sha2(F.col("c_name").cast("binary"), 256).alias("sha_hex"),
        )
        .orderBy("c_custkey")
    )
