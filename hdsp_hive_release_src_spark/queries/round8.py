"""SURVEY.md §2 round-8 additions — the remaining public-Hive long
tail the r7 verdict named (SHOW FUNCTIONS surface, EXPLAIN CBO
statistics, Python UDTF ≡ GenericUDTF parity, multi-char-delimiter
SerDe, multiLine JSON, JSON corrupt-record quarantine) plus three
training-pipeline depth operators (deterministic global corpus
shuffle, packing-bucket histogram, leakage-safe grouped split) and a
streaming output-mode parity check.

Every query carries a full DuckDB oracle; all arithmetic that crosses
an aggregation boundary is exact-integer (the standing float-order
rule), and datetime/numeric output dtypes are pinned to the pandas
renderings the driver canonicalizes through (see tools/check_oracle).
"""

from __future__ import annotations

import json
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import (
    fresh_managed_table,
    scratch_path,
)

# --------------------------------------------------------------------
# SHOW FUNCTIONS surface
# --------------------------------------------------------------------

#: Hive-parity builtins the engine must expose, by family. Each name
#: must appear in SHOW FUNCTIONS — a missing one breaks value parity
#: with the all-true oracle, which is the point: the check fails the
#: day a rename/removal shrinks the surface.
_HIVE_FN_FAMILIES: dict[str, list[str]] = {
    "agg": ["avg", "collect_list", "collect_set", "corr", "count",
            "covar_pop", "max", "min", "percentile_approx", "stddev",
            "sum", "variance"],
    "cond": ["coalesce", "greatest", "least", "nullif", "nvl", "when"],
    "complex": ["array_contains", "explode", "get_json_object",
                "inline", "json_tuple", "map_keys", "map_values",
                "posexplode", "sort_array", "xpath"],
    "date": ["add_months", "date_add", "date_sub", "datediff",
             "from_unixtime", "last_day", "months_between", "next_day",
             "trunc", "unix_timestamp"],
    "math": ["abs", "ceil", "exp", "factorial", "floor", "ln", "log10",
             "pmod", "pow", "round", "sign", "sqrt"],
    "string": ["concat", "instr", "lower", "lpad", "regexp_replace",
               "rpad", "soundex", "split", "substr", "translate",
               "trim", "upper"],
}


def _fn_values_sql() -> str:
    rows = ", ".join(
        f"('{fam}', '{fn}', true)"
        for fam, fns in sorted(_HIVE_FN_FAMILIES.items())
        for fn in fns
    )
    return (
        f"SELECT family, fn_name, present FROM (VALUES {rows}) "
        f"AS t(family, fn_name, present) ORDER BY family, fn_name"
    )


@query("show_functions_surface", oracle=_fn_values_sql())
def show_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW FUNCTIONS catalog surface: every Hive-parity builtin the
    engine commits to (62 names across six families) must be listed by
    ``SHOW FUNCTIONS`` — the oracle pins present=true for all, so a
    missing/renamed function breaks value parity instead of silently
    shrinking the surface. The SHOW output is a bounded catalog
    listing (~400 names, driver-side by design, like every metadata
    query); membership is evaluated via a broadcast hash join against
    the expected-name literals, not a collect-side loop."""
    shown = spark.sql("SHOW FUNCTIONS").select(
        F.col("function").alias("fn_name")
    )
    expected = spark.createDataFrame(
        [
            (fam, fn)
            for fam, fns in sorted(_HIVE_FN_FAMILIES.items())
            for fn in fns
        ],
        "family string, fn_name string",
    )
    return (
        expected.join(
            shown.withColumn("present", F.lit(True)), "fn_name", "left"
        )
        .select(
            "family", "fn_name", F.coalesce("present", F.lit(False))
            .alias("present"),
        )
        .orderBy("family", "fn_name")
    )


# --------------------------------------------------------------------
# EXPLAIN COST / CBO statistics surface
# --------------------------------------------------------------------


@query(
    "explain_cbo_stats",
    oracle="""
    SELECT 'cbo_customer' AS relation,
           CAST(count(*) AS BIGINT) AS plan_rowcount
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 'cbo_orders', CAST(count(*) AS BIGINT) FROM orders
    ORDER BY relation
    """,
)
def explain_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN COST surface: after ANALYZE TABLE, the cost-based
    optimizer's plan must carry the exact catalog rowCount on each
    relation node — that number is what join reordering and broadcast
    selection key on, so this checks the CBO actually SEES the stats,
    not merely that the catalog stores them (analyze_table_stats
    covers storage). The rowCounts are read from the optimized
    logical plan of a two-table join via the plan-statistics API
    (leaf.stats().rowCount()) and compared against exact counts —
    driver-side metadata only. r16: the API replaced a regex over the
    EXPLAIN COST text; the full-registry sf0.1 parity sweep caught
    the text rendering stats at 3 SIGNIFICANT DIGITS
    (rowCount=2.94E+3 for the exact catalog value 2943), which is
    lossless at the sf0.01 gate (≤3-digit counts) and silently lossy
    at any real scale — exactly the class a plan-text parse invites
    and the API cannot exhibit."""
    c = Catalog(spark, sf_dir).customer
    o = Catalog(spark, sf_dir).orders
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        fresh_managed_table(spark, "cbo_customer")
        c.where(F.col("c_mktsegment") == "BUILDING").write.saveAsTable(
            "cbo_customer"
        )
        fresh_managed_table(spark, "cbo_orders")
        o.write.saveAsTable("cbo_orders")
        for t in ("cbo_customer", "cbo_orders"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        joined = (
            spark.table("cbo_customer")
            .join(
                spark.table("cbo_orders"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .select("o_orderkey")
        )
        # exact BigInt statistics from the join's own leaf nodes —
        # the numbers the CBO actually keys on (EXPLAIN COST's text
        # rendering truncates to 3 significant digits; see docstring)
        leaves = joined._jdf.queryExecution().optimizedPlan().collectLeaves()
        found = {}
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            rc = leaf.stats().rowCount()
            n = int(str(rc.get())) if rc.isDefined() else -1
            for t in ("cbo_customer", "cbo_orders"):
                if t in leaf.toString():
                    found[t] = n
        out = [
            (t, found.get(t, -1))
            for t in ("cbo_customer", "cbo_orders")
        ]
        return spark.createDataFrame(
            out, "relation string, plan_rowcount long"
        ).orderBy("relation")
    finally:
        spark.conf.unset("spark.sql.cbo.enabled")


# --------------------------------------------------------------------
# Python UDTF (GenericUDTF parity)
# --------------------------------------------------------------------


@query(
    "udtf_python_lateral",
    oracle="""
    WITH toks AS (
      SELECT lang, x AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(x)
      WHERE x <> ''
    )
    SELECT lang, count(*) AS n_tokens,
           CAST(sum(strlen(token)) AS BIGINT) AS sum_len,
           CAST(count(DISTINCT token) AS BIGINT) AS n_distinct
    FROM toks GROUP BY lang ORDER BY lang
    """,
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF ≡ Hive GenericUDTF parity: a registered table
    function expanded per input row through a LATERAL join in SQL —
    the one-row-in/N-rows-out contract (eval → yield). The UDTF here
    tokenizes documents; the oracle replays it with unnest. NOTE this
    is the UDTF *surface* check — the engine's scale path for
    tokenization is the JVM-side split/explode (lateral_explode_tokens,
    posexplode_tokens); a Python UDTF is row-at-a-time by contract and
    is the right tool only for logic that genuinely needs Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, tlen int")
    class TokenizeUDTF:
        def eval(self, text: str):  # noqa: D102 - UDTF contract
            for t in (text or "").split(" "):
                if t:
                    yield t, len(t)

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    Catalog(spark, sf_dir).documents.createOrReplaceTempView(
        "docs_udtf_v"
    )
    return spark.sql(
        """
        SELECT lang, count(*) AS n_tokens,
               CAST(sum(t.tlen) AS BIGINT) AS sum_len,
               CAST(count(DISTINCT t.token) AS BIGINT) AS n_distinct
        FROM docs_udtf_v, LATERAL tokenize_udtf(text) AS t
        GROUP BY lang ORDER BY lang
        """
    )


# --------------------------------------------------------------------
# multiLine JSON source
# --------------------------------------------------------------------


@query(
    "multiline_json_source",
    oracle="""
    SELECT n_regionkey, count(*) AS n,
           min(n_name) AS first_nation,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def multiline_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiLine JSON read: one pretty-printed JSON ARRAY file (the
    config-dump / API-export shape that line-oriented JSON readers
    reject) parsed with multiLine=true and an explicit schema. The
    staging collect is the 25-row nation table — bounded metadata
    scale by construction. At 100 TB multiLine files are the
    exception path (each file is one task — no intra-file split), so
    the engine keeps them for small config/dimension drops exactly
    like this one, never for the fact stream."""
    n = Catalog(spark, sf_dir).nation
    rows = [r.asDict() for r in n.orderBy("n_nationkey").collect()]
    path = scratch_path("multiline_nation", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/nation.json", "w") as f:
        json.dump(rows, f, indent=2, default=str)
    spark.catalog.refreshByPath(path)
    back = (
        spark.read.schema(
            "n_nationkey long, n_name string, n_regionkey long, "
            "n_comment string"
        )
        .option("multiLine", "true")
        .json(path)
    )
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_name").alias("first_nation"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
        )
        .orderBy("n_regionkey")
    )


# --------------------------------------------------------------------
# multi-char-delimiter CSV (Hive MultiDelimitSerDe parity)
# --------------------------------------------------------------------


@query(
    "multichar_delim_csv",
    oracle="""
    SELECT s_nationkey, count(*) AS n,
           round(sum(s_acctbal), 2) AS total_bal,
           min(s_name) AS first_supplier
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def multichar_delim_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-character field delimiter ('||') — Hive's
    MultiDelimitSerDe surface, which single-char CSV readers can't
    parse. Spark's CSV source takes a multi-char ``sep`` directly:
    write supplier rows as '||'-joined text, read back with an
    explicit schema, aggregate; value parity vs the original parquet
    proves lossless round trip including doubles. Map-only write +
    scan — no shuffle until the final keyed agg."""
    s = Catalog(spark, sf_dir).supplier
    path = scratch_path("multidelim_supplier", sf_dir)
    (
        s.select(
            F.concat_ws(
                "||",
                F.col("s_suppkey").cast("string"),
                "s_name",
                F.col("s_nationkey").cast("string"),
                F.col("s_acctbal").cast("string"),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    back = (
        spark.read.schema(
            "s_suppkey long, s_name string, s_nationkey long, "
            "s_acctbal double"
        )
        .option("sep", "||")
        .csv(path)
    )
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.min("s_name").alias("first_supplier"),
        )
        .orderBy("s_nationkey")
    )


# --------------------------------------------------------------------
# JSON corrupt-record quarantine
# --------------------------------------------------------------------


@query(
    "json_corrupt_record",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt,
           CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders WHERE o_orderkey < 2000
    """,
)
def json_corrupt_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON parse with a _corrupt_record quarantine column
    (the JSON twin of csv_permissive_parse): 3 injected malformed
    lines (truncated object, bare text, wrong-type key) are captured,
    good rows parse, nothing is silently dropped — the sum over a
    parsed money column proves the good rows carry correct VALUES,
    not just the right count. At 100 TB ingest the quarantine column
    is what separates a poisoned batch from a dead pipeline."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    path = scratch_path("json_dirty_orders", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    o.select("o_orderkey", "o_totalprice").write.json(path)
    with open(f"{path}/zz_bad_rows.json", "w") as f:
        f.write('{"o_orderkey": 1, "o_totalprice":\n')
        f.write("this is not json at all\n")
        f.write('{"o_orderkey": "NaN---", "o_totalprice": "x"}\n')
    spark.catalog.refreshByPath(path)
    back = (
        spark.read.schema(
            "o_orderkey long, o_totalprice double, "
            "_corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # _corrupt_record requires one pass over raw
    )
    return back.agg(
        F.count_if(F.col("_corrupt_record").isNull())
        .cast("long")
        .alias("n_good"),
        F.count_if(F.col("_corrupt_record").isNotNull())
        .cast("long")
        .alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(),
                F.round(F.col("o_totalprice") * 100).cast("long"),
            )
        )
        .cast("long")
        .alias("total_cents"),
    )


# --------------------------------------------------------------------
# deterministic global corpus shuffle
# --------------------------------------------------------------------

#: affine-hash constants for the corpus shuffle (same exact-int64
#: idiom as the CMS/Bloom/KMV sketches — every intermediate stays in
#: int64 so DuckDB replays the permutation bit-for-bit).
_SHUF_A = 1103515245
_SHUF_B = 12345
_SHUF_P = 2147483647  # 2^31 - 1
_SHUF_SHARDS = 8


@query(
    "shuffle_text_global",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ((({_SHUF_A} * doc_id + {_SHUF_B}) % {_SHUF_P})
              + {_SHUF_P}) % {_SHUF_P} AS hv,
             len(list_filter(string_split(text, ' '),
                 x -> x <> '')) AS n_tokens
      FROM documents),
    pos AS (
      SELECT doc_id, hv % {_SHUF_SHARDS} AS shard, n_tokens,
             row_number() OVER (PARTITION BY hv % {_SHUF_SHARDS}
                                ORDER BY hv, doc_id) AS pos
      FROM h)
    SELECT shard, count(*) AS n_docs,
           CAST(sum(pos * doc_id) AS BIGINT) AS perm_checksum,
           CAST(max(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT)
               AS head_doc,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM pos GROUP BY shard ORDER BY shard
    """,
)
def shuffle_text_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-data shuffle: every document gets
    an affine-hash position h(doc_id); shard = h mod S; within-shard
    order = (h, doc_id). This is how a 100 TB corpus is shuffled for
    training WITHOUT a global sort over random() — the permutation is
    reproducible across engines, retries, and reruns (rand() is not),
    each shard is an independent hash-sorted partition (S-way
    parallelism, no cross-shard coordination), and appends re-shuffle
    only the new rows' positions. The output pins the permutation:
    perm_checksum = Σ position·doc_id changes if ANY document moves
    one slot. One hash-keyed shuffle + per-shard window sort — the
    sort is per-shard (spillable, bounded by shard size), never
    global. S=8 here keeps the oracle output compact; at cluster
    scale S is sized to ~4× executor count so each shard sorts
    ~corpus/S and shards write out in parallel — the checksum
    contract is S-independent."""
    d = Catalog(spark, sf_dir).documents
    hv = (
        (F.lit(_SHUF_A) * F.col("doc_id") + F.lit(_SHUF_B))
        % F.lit(_SHUF_P)
        + F.lit(_SHUF_P)
    ) % F.lit(_SHUF_P)
    from pyspark.sql.window import Window

    base = d.select(
        "doc_id",
        hv.alias("hv"),
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("n_tokens"),
    ).withColumn("shard", F.col("hv") % _SHUF_SHARDS)
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    pos = base.withColumn("pos", F.row_number().over(w))
    return (
        pos.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pos") * F.col("doc_id"))
            .cast("long")
            .alias("perm_checksum"),
            F.max(F.when(F.col("pos") == 1, F.col("doc_id")))
            .cast("long")
            .alias("head_doc"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------
# packing-bucket histogram
# --------------------------------------------------------------------

#: power-of-two context-length ladder for sequence packing. Fixed CASE
#: ladder (not log2) so both engines compute the bucket in exact
#: integer arithmetic.
_PACK_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _bucket_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _PACK_BUCKETS
    )
    return f"CASE {whens} ELSE {2 * _PACK_BUCKETS[-1]} END"


@query(
    "token_bucket_histogram",
    oracle=f"""
    WITH t AS (
      SELECT len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS n_tokens
      FROM documents),
    b AS (SELECT n_tokens, {_bucket_case_sql("n_tokens")} AS bucket
          FROM t)
    SELECT bucket, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(n_tokens) * 1000 // (count(*) * bucket) AS BIGINT)
               AS fill_permille
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def token_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing planner input: documents bucketed into the
    power-of-two context-length ladder, with the per-bucket fill ratio
    (Σtokens / capacity if each doc occupied one slot of its bucket) —
    the number a packing job reads to decide which buckets need
    greedy packing vs padding (fill ≪ 1000‰ → pack; ≈1000‰ → pad).
    Map-only classify + one bounded agg (≤ 8 bucket rows shuffle);
    all integer arithmetic. Complements sequence_packing (which packs)
    with the planning histogram over the whole corpus."""
    d = Catalog(spark, sf_dir).documents
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    bucket = F.expr(_bucket_case_sql("n_tokens"))
    return (
        d.select(n_tok.alias("n_tokens"))
        .select("n_tokens", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.expr(
                "sum(n_tokens) * 1000 div (count(*) * bucket)"
            )
            .cast("long")
            .alias("fill_permille"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------
# leakage-safe grouped split
# --------------------------------------------------------------------


@query(
    "grouped_train_test_split",
    oracle="""
    WITH keyed AS (
      SELECT source,
             (strpos('0123456789abcdef', substr(md5(source), 1, 1)) - 1)
               * 16
             + (strpos('0123456789abcdef', substr(md5(source), 2, 1))
                - 1) AS hb,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS n_tokens
      FROM documents),
    tagged AS (
      SELECT CASE WHEN hb % 5 = 0 THEN 'eval' ELSE 'train' END
                 AS split,
             source, n_tokens
      FROM keyed)
    SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def grouped_train_test_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leakage-safe train/eval split: the split unit is the GROUP
    (source), not the row — every document of a source lands on the
    same side, so near-duplicates within a crawl source can never
    straddle the boundary (the leakage mode row-level splits like
    stratified_eval_split cannot prevent). Assignment is the first
    md5 byte of the group key mod 5 (≈20% eval) — deterministic,
    engine-replayable, stable under appends. Map-only tag + one
    2-row agg; no join, no shuffle beyond the final groupBy."""
    d = Catalog(spark, sf_dir).documents
    hexs = "0123456789abcdef"
    h = F.md5(F.col("source"))
    hb = (
        (F.instr(F.lit(hexs), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(hexs), F.substring(h, 2, 1)) - 1)
    )
    split = F.when(hb % 5 == 0, "eval").otherwise("train")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return (
        d.select(
            split.alias("split"), "source", n_tok.alias("n_tokens")
        )
        .groupBy("split")
        .agg(
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------
# streaming output-mode parity
# --------------------------------------------------------------------


@query(
    "stream_output_modes",
    oracle="""
    WITH day_counts AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                  AS TIMESTAMP) AS day,
             event_type, count(*) AS n
      FROM events GROUP BY day, event_type)
    SELECT mode, day, event_type, n
    FROM day_counts
    CROSS JOIN (VALUES ('complete'), ('update')) AS m(mode)
    ORDER BY mode, day, event_type
    """,
)
def stream_output_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-mode parity: the SAME tumbling-day aggregation run in
    complete mode (memory sink holds the full result) and update mode
    (foreachBatch upserts last-write-wins into a dict keyed by group —
    the idempotent-merge contract update mode requires of its sink).
    Both must converge to the batch truth regardless of how the file
    source batches the input — which is exactly the guarantee a
    100 TB streaming backfill leans on when it replays history through
    the same query that serves live traffic."""
    from hdsp_hive_release_src_spark.streaming import jobs

    ev = jobs.read_events_stream(spark, sf_dir)
    agg = ev.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))

    # complete mode: memory sink IS the full result table
    name = jobs.run_to_memory(agg, "complete", "out_modes")
    complete = (
        spark.table(name)
        .select(
            F.lit("complete").alias("mode"),
            F.col("w.start").alias("day"),
            "event_type",
            "n",
        )
    )

    # update mode: last-write-wins upsert per group via foreachBatch
    state: dict[tuple, int] = {}

    def upsert(bdf: DataFrame, batch_id: int) -> None:
        for r in bdf.collect():
            state[(r["w"]["start"], r["event_type"])] = r["n"]

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    upd_rows = [
        ("update", day, et, n) for (day, et), n in state.items()
    ]
    update = spark.createDataFrame(
        upd_rows, "mode string, day timestamp, event_type string, n long"
    )
    return complete.unionByName(update).orderBy(
        "mode", "day", "event_type"
    )


# --------------------------------------------------------------------
# r9-queue wave: ANN recall audit, histogram_numeric contract,
# SHOW COLUMNS / SHOW VIEWS surface, Hive context_ngrams
# --------------------------------------------------------------------

# ann oracles must be registered before this module composes them
from hdsp_hive_release_src_spark.queries import llm as _llm  # noqa: E402,F401
from hdsp_hive_release_src_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ANN_RECALL_ORACLE = f"""
    WITH bf AS (SELECT * FROM ({_ORACLES["ann_bruteforce_topk"]}) b),
    l AS (SELECT * FROM ({_ORACLES["ann_lsh_topk"]}) x)
    SELECT bf.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(l.neighbor_id) * 1000 // count(*) AS BIGINT)
               AS recall_permille
    FROM bf LEFT JOIN l
      ON l.query_id = bf.query_id
     AND l.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id ORDER BY bf.query_id
"""


@query("ann_recall_audit", oracle=_ANN_RECALL_ORACLE)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH scale path against the exact brute-force
    twin — THE metric that justifies replacing an O(corpus) scan per
    query with an O(bucket) one, computed as a first-class query so
    a recall regression (plane change, bucket skew) is a red gate
    row, not a silent quality loss. Composes the two registered ANN
    queries; the oracle composes their registered oracles verbatim,
    so all three stay in lockstep by construction. Join is on the
    top-k result sets: k·|queries| rows, broadcast-size at any
    corpus scale."""
    from hdsp_hive_release_src_spark.queries.llm import (
        ann_bruteforce_topk,
        ann_lsh_topk,
    )

    bf = ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    lsh = ann_lsh_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("lsh_neighbor")
    )
    return (
        bf.join(
            lsh,
            (bf.query_id == lsh.query_id)
            & (F.col("neighbor_id") == F.col("lsh_neighbor")),
            "left",
        )
        .drop(lsh.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("lsh_neighbor").cast("long").alias("n_hits"),
            F.expr("count(lsh_neighbor) * 1000 div count(*)")
            .cast("long")
            .alias("recall_permille"),
        )
        .orderBy("query_id")
    )


@query(
    "histogram_numeric_contract",
    oracle="""
    SELECT CAST(16 AS BIGINT) AS n_bins,
           CAST(count(*) AS BIGINT) AS total_y,
           true AS x_lo_ok, true AS x_hi_ok, true AS x_sorted
    FROM lineitem WHERE l_orderkey < 4000
    """,
)
def histogram_numeric_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive's histogram_numeric UDAF (native in Spark): approximate
    equi-height bins whose centroids depend on merge order, so the
    pinned contract is what IS deterministic — bin count, Σy == exact
    row count (no mass lost or invented), centroid bounds inside
    [min, max], and centroids sorted. The same mergeable-sketch
    discipline as the CMS/KMV tier: assert the invariants, never the
    merge-order-dependent internals. One pass, sketch-sized shuffle."""
    li = Catalog(spark, sf_dir).lineitem.where(F.col("l_orderkey") < 4000)
    h = li.agg(
        F.expr("histogram_numeric(l_extendedprice, 16)").alias("h"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    return h.select(
        F.size("h").cast("long").alias("n_bins"),
        F.round(
            F.expr("aggregate(h, 0.0D, (acc, b) -> acc + b.y)")
        )
        .cast("long")
        .alias("total_y"),
        F.expr("aggregate(h, true, (acc, b) -> acc AND b.x >= lo)")
        .alias("x_lo_ok"),
        F.expr("aggregate(h, true, (acc, b) -> acc AND b.x <= hi)")
        .alias("x_hi_ok"),
        F.expr(
            "aggregate(sequence(1, size(h) - 1), true,"
            " (acc, i) -> acc AND h[i-1].x <= h[i].x)"
        ).alias("x_sorted"),
    )


#: columns of the managed table show_columns_views_surface creates —
#: shared by impl and oracle so the pin can't drift.
_SCV_COLS = ("p_partkey", "p_name", "p_type", "p_retailprice")


def _scv_oracle() -> str:
    rows = ", ".join(f"('column', '{c}')" for c in _SCV_COLS)
    return f"""
    SELECT kind, name
    FROM (VALUES {rows}, ('view', 'scv_view')) AS t(kind, name)
    ORDER BY kind, name
    """


@query("show_columns_views_surface", oracle=_scv_oracle())
def show_columns_views_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHOW COLUMNS IN <table> + SHOW VIEWS — the two metadata listing
    surfaces §2.2's SHOW family still lacked (partitions, functions,
    CREATE TABLE are covered). A catalog view over a managed table is
    created, then both listings are read back and pinned against the
    expected inventory — a dropped column or an unlisted view breaks
    parity. Metadata-only: no data scan at any scale."""
    p = Catalog(spark, sf_dir).part
    fresh_managed_table(spark, "scv_part")
    p.select(*_SCV_COLS).limit(50).write.saveAsTable("scv_part")
    spark.sql("DROP VIEW IF EXISTS scv_view")
    spark.sql(
        "CREATE VIEW scv_view AS SELECT p_partkey, p_retailprice "
        "FROM scv_part"
    )
    cols = spark.sql("SHOW COLUMNS IN scv_part").select(
        F.lit("column").alias("kind"), F.col("col_name").alias("name")
    )
    views = spark.sql("SHOW VIEWS LIKE 'scv_view'").select(
        F.lit("view").alias("kind"), F.col("viewName").alias("name")
    )
    return cols.unionByName(views).orderBy("kind", "name")


#: context word and result size for context_ngrams_top (Hive
#: context_ngrams(sentences(...), array("join", null), k) parity).
_CTX_WORD = "join"
_CTX_K = 15


@query(
    "context_ngrams_top",
    oracle=f"""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    big AS (
      SELECT u.b.w1 AS w1, u.b.w2 AS w2
      FROM toks, unnest(list_transform(range(2, len(t) + 1),
                        i -> {{'w1': t[i-1], 'w2': t[i]}})) AS u(b)),
    cnt AS (
      SELECT w2 AS next_token, count(*) AS n
      FROM big WHERE w1 = '{_CTX_WORD}' GROUP BY w2),
    rk AS (
      SELECT next_token, n,
             row_number() OVER (ORDER BY n DESC, next_token) AS rnk
      FROM cnt)
    SELECT next_token, n, CAST(rnk AS BIGINT) AS rank
    FROM rk WHERE rnk <= {_CTX_K} ORDER BY rank
    """,
)
def context_ngrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive context_ngrams parity: the top-k tokens FOLLOWING a fixed
    context word across the corpus (the 'what comes after X'
    completion table). Bigrams are generated positionally inside each
    document (an index transform over the token array — one scan, no
    self-join), filtered to the context BEFORE the shuffle so only
    matching bigrams ever leave the map side; the final top-k ranks a
    vocabulary-bounded count table. Deterministic tie-break (count
    desc, token asc) keeps the rank stable across engines."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("t")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    cnt = (
        bigrams.where(F.col("w1") == _CTX_WORD)
        .groupBy(F.col("w2").alias("next_token"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps, O(k) memory, no global sort of the vocabulary),
    # THEN rank inside the k survivors — the bm25 pattern; the global
    # window runs over ≤ k rows, never the count table
    top = cnt.orderBy(F.desc("n"), "next_token").limit(_CTX_K)
    w = Window.orderBy(F.desc("n"), "next_token")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy("rank")
    )


# --------------------------------------------------------------------
# deterministic resampling statistics (A/B-eval primitives)
# --------------------------------------------------------------------

#: bootstrap replicates and membership hash constants — affine hash on
#: (o_orderkey, replicate) keeps every membership decision in exact
#: int64, so DuckDB replays each resample bit-for-bit.
_BOOT_B = 40
_BOOT_A = 2654435761
_BOOT_P = 2147483647


@query(
    "bootstrap_ci_mean",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey AS k, CAST(o_totalprice * 100 AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 8000),
    rep AS (
      SELECT b, k, cents
      FROM src, unnest(range(0, {_BOOT_B})) AS r(b)
      WHERE (({_BOOT_A} * (k + 131 * (b + 1))) % {_BOOT_P}) % 2 = 0),
    means AS (
      SELECT b, CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
      FROM rep GROUP BY b),
    ranked AS (
      SELECT mean_cents,
             row_number() OVER (ORDER BY mean_cents, b) AS rnk
      FROM means)
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           CAST(min(CASE WHEN rnk = 2 THEN mean_cents END) AS BIGINT)
               AS ci_lo_cents,
           CAST(min(CASE WHEN rnk = {_BOOT_B - 1} THEN mean_cents END)
                AS BIGINT) AS ci_hi_cents,
           CAST(sum(mean_cents) // {_BOOT_B} AS BIGINT)
               AS mean_of_means_cents
    FROM ranked
    """,
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subsample bootstrap for a mean: B half-samples
    whose membership is an affine hash of (row key, replicate) — the
    reproducible stand-in for rand() resampling (same CI on any
    engine, any partitioning, any retry). Scale shape: ONE scan with a
    map-side ×B replicate expansion (explode of a literal range — no
    self-join, no shuffle of the base table), per-replicate partial
    sums, a B-row aggregate, and the CI picked by rank from B sorted
    means. All arithmetic is exact integer cents; the 90% CI bounds
    are order statistics 2 and B-1 of the replicate means."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 8000)
    src = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rep = (
        src.select(
            "k", "cents",
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_B - 1))
            ).alias("b"),
        )
        .where(
            (
                (F.lit(_BOOT_A) * (F.col("k") + 131 * (F.col("b") + 1)))
                % _BOOT_P
            )
            % 2
            == 0
        )
    )
    means = rep.groupBy("b").agg(
        F.expr("sum(cents) div count(*)").cast("long").alias("mean_cents")
    )
    w = Window.orderBy("mean_cents", "b")
    ranked = means.withColumn("rnk", F.row_number().over(w))
    return ranked.agg(
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        F.min(
            F.when(F.col("rnk") == 2, F.col("mean_cents"))
        ).cast("long").alias("ci_lo_cents"),
        F.min(
            F.when(F.col("rnk") == _BOOT_B - 1, F.col("mean_cents"))
        ).cast("long").alias("ci_hi_cents"),
        F.expr(f"sum(mean_cents) div {_BOOT_B}")
        .cast("long")
        .alias("mean_of_means_cents"),
    )


@query(
    "mann_whitney_u",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b'
             END AS grp,
             CAST(o_totalprice * 100 AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey < 6000
        AND o_orderpriority IN ('1-URGENT', '5-LOW')),
    ranked AS (
      SELECT grp, cents,
             rank() OVER (ORDER BY cents) * 2
               + count(*) OVER (PARTITION BY cents) - 1 AS rank2
      FROM src)
    SELECT CAST(count(CASE WHEN grp = 'a' THEN 1 END) AS BIGINT) AS n_a,
           CAST(count(CASE WHEN grp = 'b' THEN 1 END) AS BIGINT) AS n_b,
           CAST((sum(CASE WHEN grp = 'a' THEN rank2 ELSE 0 END)
                 - count(CASE WHEN grp = 'a' THEN 1 END)
                   * (count(CASE WHEN grp = 'a' THEN 1 END) + 1))
                // 2 AS BIGINT) AS u_a,
           CAST((sum(CASE WHEN grp = 'b' THEN rank2 ELSE 0 END)
                 - count(CASE WHEN grp = 'b' THEN 1 END)
                   * (count(CASE WHEN grp = 'b' THEN 1 END) + 1))
                // 2 AS BIGINT) AS u_b
    FROM ranked
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between two order-priority
    groups — the nonparametric two-sample test an eval pipeline runs
    when score distributions aren't normal. Kept fully exact: ranks
    are doubled so tie-averaged ranks stay integral (2·avg_rank =
    rank + (rank + ties - 1)), and U = (Σ2r - n(n+1))/2 divides back
    out in integer arithmetic — zero float anywhere, so partitioning
    and engine cannot move the statistic. One global rank over the
    filtered sample (windowed; spillable) + one aggregate.
    Self-check: u_a + u_b == n_a·n_b by construction."""
    o = Catalog(spark, sf_dir).orders.where(
        (F.col("o_orderkey") < 6000)
        & F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    src = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a")
        .otherwise("b")
        .alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ranked = src.select(
        "grp",
        (
            F.rank().over(Window.orderBy("cents")) * 2
            + F.count(F.lit(1)).over(Window.partitionBy("cents"))
            - 1
        ).alias("rank2"),
    )
    is_a = (F.col("grp") == "a").cast("long")
    is_b = (F.col("grp") == "b").cast("long")
    return ranked.agg(
        F.sum(is_a).alias("n_a"),
        F.sum(is_b).alias("n_b"),
        (
            (
                F.sum(F.when(F.col("grp") == "a", F.col("rank2"))
                      .otherwise(0))
                - F.sum(is_a) * (F.sum(is_a) + 1)
            )
            / 2
        ).cast("long").alias("u_a"),
        (
            (
                F.sum(F.when(F.col("grp") == "b", F.col("rank2"))
                      .otherwise(0))
                - F.sum(is_b) * (F.sum(is_b) + 1)
            )
            / 2
        ).cast("long").alias("u_b"),
    )
