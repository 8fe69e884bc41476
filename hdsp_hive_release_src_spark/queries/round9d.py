"""SURVEY.md §2 round-9 fourth wave — Hive-parity surfaces plus one
exact iterative linear-algebra operator (queued for the r10
verification window; local gate green at both scales):

- ``qualify_emulation`` — the QUALIFY clause (window filter) Spark
  lacks, emulated as subquery + WHERE; the oracle uses DuckDB's REAL
  QUALIFY, so parity proves the emulation is the clause.
- ``soundex_phonetic_blocking`` — Hive/Spark ``soundex()`` semantics
  replayed letter-for-letter in the oracle (translate + H/W
  transparency + adjacent-code collapse + first-code drop), used the
  way a pipeline uses it: phonetic blocking for fuzzy matching.
- ``hive_uniontype_emulation`` — Hive's UNIONTYPE (create_union /
  tag-dispatch) emulated as a tagged struct with exactly one active
  branch.
- ``multibyte_length_semantics`` — char vs byte vs bit length on
  injected multibyte text (the length-function family splits only
  when the corpus stops being ASCII).
- ``pca_power_iteration_exact`` — two power-iteration rounds on the
  embedding second-moment matrix carried out ENTIRELY in exact
  integer arithmetic (quantized int64 components, DECIMAL(38,0) /
  HUGEINT accumulators), output as permille loadings — an iterative
  numerical-linear-algebra operator with bit-exact cross-engine
  parity and no float accumulation anywhere.
- ``rebalance_hint_partitioning`` — the REBALANCE hint surface (AQE
  skew-spreading before a write); result parity here, plan assertion
  in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# --------------------------------------------------------------------
# QUALIFY emulation
# --------------------------------------------------------------------


@query(
    "qualify_emulation",
    oracle=f"""
    SELECT o_orderpriority AS pri, o_orderkey, {_CENTS} AS cents
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey) <= 2
    ORDER BY pri, cents DESC, o_orderkey
    """,
)
def qualify_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUALIFY clause (filter on a window function) — DuckDB /
    Snowflake / BigQuery dialect sugar that Spark SQL lacks. The
    emulation is the standard expansion: compute the window in a
    subquery, filter in the outer WHERE; the oracle runs the REAL
    QUALIFY so value parity proves the expansion is semantically the
    clause. Top-2 per group with a total (price desc, key) order —
    the rank never ties across engines."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView("ord_r9q")
    return spark.sql(
        f"""
        SELECT pri, o_orderkey, cents FROM (
          SELECT o_orderpriority AS pri, o_orderkey, {_CENTS} AS cents,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM ord_r9q)
        WHERE rn <= 2
        ORDER BY pri, cents DESC, o_orderkey
        """
    )


# --------------------------------------------------------------------
# soundex phonetic blocking
# --------------------------------------------------------------------

#: American Soundex letter → code table (vowels+Y → '~' separator,
#: H/W → '-' transparent, consonants → digit)
_SX_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_SX_TO = "~~~~~~--111122222222334556"

_SOUNDEX_ORACLE = f"""
WITH words AS (
  SELECT DISTINCT x AS w
  FROM part, unnest(string_split(p_name, ' ')) AS u(x)
  WHERE x ~ '^[a-zA-Z]+$'),
s1 AS (
  SELECT w, upper(w) AS s,
         replace(translate(upper(w), '{_SX_FROM}', '{_SX_TO}'),
                 '-', '') AS d2
  FROM words),
s2 AS (
  SELECT w, s, d2, string_split(d2, '') AS ch FROM s1),
s3 AS (
  SELECT w, s,
         list_aggr(
           list_filter(ch, (x, i) -> i = 1 OR x <> ch[i - 1]),
           'string_agg', '') AS c
  FROM s2),
s4 AS (
  SELECT w, s,
         translate(substr(s, 1, 1), '{_SX_FROM}', '{_SX_TO}') AS fc,
         replace(coalesce(c, ''), '~', '') AS digits_all
  FROM s3),
sx AS (
  SELECT w,
         substr(s, 1, 1)
         || rpad(substr(CASE WHEN fc BETWEEN '1' AND '6'
                             THEN substr(digits_all, 2)
                             ELSE digits_all END, 1, 3), 3, '0')
             AS code
  FROM s4)
SELECT code,
       CAST(count(*) AS BIGINT) AS n_words,
       string_agg(w, ',' ORDER BY w) AS words
FROM sx GROUP BY code HAVING count(*) > 1
ORDER BY code
"""


@query("soundex_phonetic_blocking", oracle=_SOUNDEX_ORACLE)
def soundex_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive/Spark ``soundex()`` used as a phonetic BLOCKING key: all
    distinct part-name words that collide under the same code (the
    candidate sets a fuzzy matcher would compare within — blocking is
    what keeps fuzzy joins off the n² cliff at scale). The oracle
    rebuilds American Soundex letter-for-letter: translate to codes,
    make H/W TRANSPARENT (adjacent equal codes across h/w collapse —
    Ashcraft→A261 not A226), collapse adjacent duplicates with an
    index lambda (RE2 has no backreferences), vowels separate, and
    the first letter's own code is dropped only when the first letter
    HAS a code (so 'Wk'→W200, Pfister→P236). Verified against
    Spark's builtin on 23 probe names including every edge class."""
    p = Catalog(spark, sf_dir).part
    words = (
        p.select(F.explode(F.split("p_name", " ")).alias("w"))
        .where(F.col("w").rlike("^[a-zA-Z]+$"))
        .distinct()
    )
    sx = words.select("w", F.soundex("w").alias("code"))
    return (
        sx.groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias(
                "words"
            ),
        )
        .where(F.col("n_words") > 1)
        .orderBy("code")
    )


# --------------------------------------------------------------------
# Hive UNIONTYPE emulation
# --------------------------------------------------------------------


@query(
    "hive_uniontype_emulation",
    oracle=f"""
    WITH u AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS tag,
             CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END AS f0,
             CASE WHEN o_orderkey % 2 = 1
                  THEN o_orderpriority END AS f1,
             {_CENTS} AS cents
      FROM orders)
    SELECT tag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN f0 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f0_active,
           CAST(sum(CASE WHEN f1 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f1_active,
           coalesce(CAST(sum(f0) AS BIGINT), 0) AS f0_checksum,
           coalesce(min(f1), '') AS f1_min,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM u GROUP BY tag ORDER BY tag
    """,
)
def hive_uniontype_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's UNIONTYPE<bigint, string> (create_union / tag dispatch)
    emulated the way Spark represents it: a tagged struct with
    exactly one active branch per row (tag picks the field, the
    other stays NULL — the invariant n_fK_active == n per tag is the
    contract, asserted here as output columns). Branch dispatch is a
    codegen CASE; no per-row interpretation, so the emulation costs
    the same as the columns it wraps at any scale."""
    o = Catalog(spark, sf_dir).orders
    u = o.select(
        F.struct(
            F.when(F.col("o_orderkey") % 2 == 0, 0)
            .otherwise(1)
            .alias("tag"),
            F.when(
                F.col("o_orderkey") % 2 == 0, F.col("o_custkey")
            ).alias("f0"),
            F.when(
                F.col("o_orderkey") % 2 == 1, F.col("o_orderpriority")
            ).alias("f1"),
        ).alias("u"),
        F.expr(_CENTS).alias("cents"),
    )
    return (
        u.groupBy(F.col("u.tag").alias("tag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("u.f0").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_f0_active"),
            F.sum(
                F.when(F.col("u.f1").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_f1_active"),
            F.coalesce(F.sum("u.f0").cast("long"), F.lit(0)).alias(
                "f0_checksum"
            ),
            F.coalesce(F.min("u.f1"), F.lit("")).alias("f1_min"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("tag")
    )


# --------------------------------------------------------------------
# multibyte length semantics
# --------------------------------------------------------------------


@query(
    "multibyte_length_semantics",
    oracle="""
    WITH m AS (
      SELECT p_brand,
             replace(p_name, 'a', chr(233)) AS s
      FROM part)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(s)) AS BIGINT) AS sum_chars,
           CAST(sum(strlen(s)) AS BIGINT) AS sum_bytes,
           CAST(sum(bit_length(s)) AS BIGINT) AS sum_bits
    FROM m GROUP BY p_brand ORDER BY p_brand
    """,
)
def multibyte_length_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """char_length vs octet_length vs bit_length once the corpus
    stops being ASCII: every 'a' becomes é (2 bytes in UTF-8), so
    bytes > chars exactly by the é count and bits = 8·bytes — the
    three length families diverge measurably instead of aliasing
    each other (DuckDB: length counts chars, strlen counts BYTES —
    opposite of what the names suggest)."""
    p = Catalog(spark, sf_dir).part
    m = p.select(
        "p_brand",
        F.replace(F.col("p_name"), F.lit("a"), F.lit("é")).alias("s"),
    )
    return (
        m.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length("s")).cast("long").alias("sum_chars"),
            F.sum(F.octet_length("s")).cast("long").alias("sum_bytes"),
            F.sum(F.bit_length("s")).cast("long").alias("sum_bits"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------
# exact power-iteration PCA direction
# --------------------------------------------------------------------

#: embedding components quantized to 1e-6 (exact int64 on both
#: engines; round(x*1e6) can only land on .5 via float rounding, and
#: both engines round positive/negative halves away from zero)
_PCA_Q = 1000000

_PCA_ORACLE = f"""
WITH comp AS (
  SELECT e.vec_id AS id, g.i - 1 AS j,
         CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * {_PCA_Q}) AS BIGINT) AS v
  FROM embeddings e,
       unnest(generate_series(1, len(e.embedding))) AS g(i)),
cov AS (
  SELECT a.j AS j, b.j AS k,
         sum(CAST(a.v AS HUGEINT) * b.v) AS c
  FROM comp a JOIN comp b ON a.id = b.id
  GROUP BY a.j, b.j),
v1 AS (
  SELECT j, sum(c) AS w FROM cov GROUP BY j),
v2 AS (
  SELECT cov.j, sum(cov.c * v1.w) AS w2
  FROM cov JOIN v1 ON cov.k = v1.j
  GROUP BY cov.j),
mx AS (SELECT max(abs(w2)) AS m FROM v2)
SELECT CAST(j AS BIGINT) AS dim,
       CAST(w2 * 1000 // mx.m AS BIGINT) AS loading_permille
FROM v2, mx ORDER BY dim
"""


@query("pca_power_iteration_exact", oracle=_PCA_ORACLE)
def pca_power_iteration_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-eigenvector direction of the embedding second-moment
    matrix by TWO power-iteration rounds (v0 = 1; v2 = C·(C·1)),
    carried out entirely in exact integer arithmetic: components
    quantized to 1e-6 → int64, the 64×64 moment matrix and both
    mat-vecs accumulate in DECIMAL(38,0)/HUGEINT (v2 entries reach
    ~1e33 — still inside 38 digits), and the output is each
    dimension's loading in permille of the largest. Iterative linear
    algebra is normally the first place cross-engine float drift
    appears; here every intermediate is bit-exact, so DuckDB replays
    the iteration cell-for-cell. Scale shape: the covariance build is
    one self-join on the row id grouped by (j,k) — map-side combined,
    4096 cells of state — and each iteration is a broadcast-sized
    64-row mat-vec, independent of corpus size."""
    e = Catalog(spark, sf_dir).embeddings
    # r12 scan-count fix: the self-join's two sides plus each
    # iteration's reuse of cov re-executed the explode scan (8 fact
    # scans measured). Checkpoint the quantized component table once
    # (both join sides read it) and the 4096-cell moment matrix (both
    # mat-vec rounds read it).
    comp = (
        e.select(
            F.col("vec_id").alias("id"),
            F.posexplode("embedding").alias("j", "x"),
        )
        .select(
            "id",
            "j",
            F.expr(
                f"CAST(round(CAST(x AS DOUBLE) * {_PCA_Q}) AS BIGINT)"
            ).alias("v"),
        )
        .localCheckpoint()
    )
    a = comp.alias("a")
    b = comp.alias("b")
    cov = (
        a.join(b, F.col("a.id") == F.col("b.id"))
        .groupBy(F.col("a.j").alias("j"), F.col("b.j").alias("k"))
        .agg(
            F.sum(
                F.col("a.v").cast("decimal(38,0)") * F.col("b.v")
            ).alias("c")
        )
        .localCheckpoint()
    )
    v1 = cov.groupBy("j").agg(F.sum("c").alias("w")).select(
        F.col("j").alias("k"), "w"
    )
    # r13 subtree-sweep fix: the max probe and the output both re-ran
    # the second mat-vec off the cov checkpoint. 64 rows — checkpoint.
    v2 = (
        cov.join(B(v1), "k")
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("w")).alias("w2"))
        .localCheckpoint()
    )
    mx = v2.agg(F.max(F.abs(F.col("w2"))).alias("m"))
    return (
        v2.crossJoin(B(mx))
        .select(
            F.col("j").cast("long").alias("dim"),
            F.expr("CAST(w2 * 1000 div m AS BIGINT)").alias(
                "loading_permille"
            ),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------
# REBALANCE hint surface
# --------------------------------------------------------------------


@query(
    "rebalance_hint_partitioning",
    oracle=f"""
    SELECT o_orderpriority AS pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS cents
    FROM orders GROUP BY pri ORDER BY pri
    """,
)
def rebalance_hint_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REBALANCE hint — AQE's skew-spreading repartition used
    before writes so one hot partition can't produce one giant output
    file (unlike REPARTITION(n) it lets AQE split oversized
    partitions at runtime). Hints must never change results: the
    oracle aggregates the unhinted table, and the plan-level
    RebalancePartitions node is asserted in tests/test_round9d.py."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView("ord_r9h")
    return spark.sql(
        f"""
        SELECT /*+ REBALANCE(pri) */
               o_orderpriority AS pri,
               count(*) AS n,
               sum({_CENTS}) AS cents
        FROM ord_r9h GROUP BY pri ORDER BY pri
        """
    )
