"""SURVEY.md §2.2 continued — modern engine surfaces a current Hive/
Spark user expects: the VARIANT semi-structured type (Spark 4's
shredded-JSON path, successor to string-typed get_json_object
pipelines), Apache DataSketches HLL (storable, MERGEABLE distinct
sketches — the at-scale distinct-count architecture, vs the one-shot
approx_count_distinct), a tokenizer vocabulary build, and the
mapInArrow batch-UDF surface (the zero-copy tier below mapInPandas).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "variant_semistructured",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(count(json_extract_string(props, '$.absent') )
                AS BIGINT) AS n_absent
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: props parsed ONCE into a shredded binary
    variant (parse_json), then typed variant_get extractions — the
    engine-native semi-structured path that replaces N re-parses with
    one. Missing paths return NULL (n_absent pins that semantic).
    At 100 TB, variant shredding also unlocks columnar pushdown into
    the JSON that string get_json_object can never see."""
    ev = Catalog(spark, sf_dir).events
    v = F.parse_json("props")
    return (
        ev.select("event_type", v.alias("v"))
        .select(
            "event_type",
            F.variant_get("v", "$.k", "long").alias("k"),
            F.variant_get("v", "$.absent", "long").alias("absent"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("absent").alias("n_absent"),
        )
        .orderBy("event_type")
    )


@query(
    "hll_sketch_union",
    oracle="""
    WITH per_flag AS (
      SELECT l_returnflag AS grp,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag),
    total AS (
      SELECT 'TOTAL' AS grp,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem)
    SELECT grp, exact_distinct, TRUE AS sketch_within_5pct
    FROM (SELECT * FROM per_flag UNION ALL SELECT * FROM total)
    ORDER BY grp
    """,
)
def hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL: per-group sketches built with hll_sketch_agg,
    then UNIONED across groups (hll_union_agg) for a grand total no
    re-scan can see — the mergeability that makes sketches the 100 TB
    distinct-count architecture (store per-partition sketches, fold
    them at query time). The oracle pattern matches approx_distinct:
    exact counts plus a Spark-computed within-5% boolean (lgK=12 gives
    ~1.6% rel. error, well inside)."""
    li = Catalog(spark, sf_dir).lineitem
    # r13 subtree fix: the union row and the output union both
    # consumed per_flag, re-running its scan. Five sketch rows —
    # checkpoint; the only remaining second scan is total_exact's
    # semantically-necessary cross-flag distinct (the per-flag sets
    # overlap, so no fold of exact_distinct can replace it).
    per_flag = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.hll_sketch_agg("l_orderkey", F.lit(12)).alias("sk"),
        F.count_distinct("l_orderkey").alias("exact_distinct"),
    ).localCheckpoint()
    total = per_flag.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("exact_distinct").alias("_sum_unused"),
    ).select(
        F.lit("TOTAL").alias("grp"),
        "sk",
        F.lit(None).cast("long").alias("exact_distinct"),
    )
    # the per-flag orderkey sets overlap heavily (one order ships many
    # lines with mixed flags), so TOTAL's exact count needs its own
    # distinct — computed once here, joined to the union sketch row
    total_exact = li.agg(
        F.count_distinct("l_orderkey").alias("te")
    )
    unioned = total.join(F.broadcast(total_exact)).select(
        "grp", "sk", F.col("te").alias("exact_distinct")
    )
    both = per_flag.select("grp", "sk", "exact_distinct").unionByName(
        unioned
    )
    est = F.hll_sketch_estimate("sk")
    within = (
        F.abs(est - F.col("exact_distinct"))
        <= 0.05 * F.col("exact_distinct")
    )
    return (
        both.select(
            "grp",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            within.alias("sketch_within_5pct"),
        )
        .orderBy("grp")
    )


@query(
    "tokenizer_vocab_build",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    counted AS (
      SELECT word, count(*) AS freq FROM words
      GROUP BY word HAVING count(*) >= 5)
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) - 1
                AS BIGINT) AS token_id,
           word, CAST(freq AS BIGINT) AS freq
    FROM counted ORDER BY token_id
    """,
)
def tokenizer_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build: corpus word frequencies, a min-count
    floor (OOV cut), dense token ids assigned by (freq desc, word) —
    the deterministic id assignment every vocab format needs. The
    global row_number runs AFTER aggregation, on the vocab-sized
    result (≈100k rows at any corpus size), never on the corpus — the
    corpus-side work is one explode + one map-side-combined groupBy."""
    d = Catalog(spark, sf_dir).documents
    counted = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= 5)
    )
    w = Window.orderBy(F.col("freq").desc(), "word")
    return counted.select(
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
        "word",
        "freq",
    ).orderBy("token_id")


@query(
    "mapinarrow_bytes",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(ord(text[1:1]) AS BIGINT) AS first_byte
    FROM documents WHERE doc_id < 300 ORDER BY doc_id
    """,
)
def mapinarrow_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python batch surface (raw Arrow
    RecordBatches, no pandas conversion): per-doc byte length, word
    count, and first byte computed with pyarrow.compute kernels. The
    tier to reach for when even the pandas bridge is measurable —
    e.g. byte-level feature extraction over multimodal payloads."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def feats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            n_bytes = pc.binary_length(pc.cast(text, pa.binary()))
            n_words = pc.list_value_length(
                pc.split_pattern(text, pattern=" ")
            )
            first = pc.cast(
                pc.utf8_slice_codeunits(text, 0, 1), pa.string()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(n_words, pa.int64()),
                    first,
                ],
                names=["doc_id", "n_bytes", "n_words", "first_char"],
            )

    d = Catalog(spark, sf_dir).documents.where(F.col("doc_id") < 300)
    out = d.select("doc_id", "text").mapInArrow(
        feats,
        schema=(
            "doc_id long, n_bytes long, n_words long, first_char string"
        ),
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "n_words",
        F.ascii("first_char").cast("long").alias("first_byte"),
    ).orderBy("doc_id")
