"""SURVEY.md §2.5 — source/sink round-trip queries.

Each writes a table out in another format (or partitioned layout),
reads it back, and aggregates — the oracle runs on the ORIGINAL
parquet, so any loss/corruption in the round trip breaks value parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import (
    fresh_managed_table,
    roundtrip_csv,
    roundtrip_json,
    roundtrip_orc,
    write_partitioned,
)


@query(
    "orc_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC (Hive's native format) → read back → aggregate;
    value parity vs the original parquet proves a lossless round trip
    including timestamps and doubles."""
    li = Catalog(spark, sf_dir).lineitem
    back = roundtrip_orc(li, "orc_lineitem", sf_dir)
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "csv_roundtrip",
    oracle="""
    SELECT p_type, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
    FROM part GROUP BY p_type ORDER BY p_type
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → csv → read back (explicit schema) → aggregate."""
    p = Catalog(spark, sf_dir).part
    back = roundtrip_csv(p, "csv_part", sf_dir)
    return (
        back.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("p_type")
    )


@query(
    "json_roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS first_order_us
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → json lines → read back (explicit schema; timestamps
    survive via ISO-8601) → aggregate."""
    o = Catalog(spark, sf_dir).orders
    back = roundtrip_json(o, "json_orders", sf_dir)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            # parquet stores o_orderdate as NTZ; cast → LTZ (UTC session)
            # before unix_micros
            F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
            .cast("long")
            .alias("first_order_us"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "csv_permissive_parse",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt
    FROM part
    """,
)
def csv_permissive_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift tolerance: a CSV with 3 injected malformed rows is
    read in PERMISSIVE mode with a _corrupt_record column — good rows
    parse, bad rows are captured, nothing is silently dropped. At
    100 TB ingest this is the difference between a poisoned batch
    killing the job and a quarantine column you can audit."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    p = Catalog(spark, sf_dir).part
    path = scratch_path("csv_dirty_part", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    p.write.option("header", True).csv(path)
    # inject malformed lines (wrong arity / non-numeric key)
    with open(f"{path}/zz_bad_rows.csv", "w") as f:  # no "_" prefix: Hadoop hides those
        f.write("p_partkey,p_name,p_brand,p_type,p_size,p_retailprice\n")
        f.write("not_a_number,x,y,z,1,1.0\n")
        f.write("1,only,two\n")
        f.write("2,bad,size,PROMO,not_int,9.99\n")
    # the Spark write above refreshed (and re-listed) the path BEFORE
    # the hand-injected file existed; without an explicit refresh the
    # session's file-status cache hides zz_bad_rows.csv on re-read and
    # the corrupt count silently drops to 0 (also drops any stale
    # InMemoryRelation a prior run of this query cached over the path).
    spark.catalog.refreshByPath(path)
    schema = (
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double, _corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # one pass; _corrupt_record requires referencing raw
    )
    return back.agg(
        F.count_if(F.col("_corrupt_record").isNull()).cast("long").alias(
            "n_good"
        ),
        F.count_if(F.col("_corrupt_record").isNotNull())
        .cast("long")
        .alias("n_corrupt"),
    )


@query(
    "dynamic_partition_overwrite",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue,
           round(sum(CASE WHEN l_returnflag = 'R' THEN 0.0
                          ELSE l_discount END), 4) AS sum_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive's daily-ETL idiom: INSERT OVERWRITE of ONE partition.
    partitionOverwriteMode=dynamic replaces only the partitions present
    in the incoming frame — here the 'R' partition is rewritten with
    zeroed discounts while 'A'/'N' must survive untouched. The read-back
    aggregates ALL partitions, so the oracle (original table with only
    R's discounts zeroed) fails if the overwrite either missed R or
    clobbered the siblings (static mode would leave R only). At 100 TB
    this is how a day's partition is re-stated without touching the
    other ~3650."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    li = Catalog(spark, sf_dir).lineitem
    path = scratch_path("dynpart_lineitem", sf_dir)
    # rebuild the base table each run so the query is idempotent
    shutil.rmtree(path, ignore_errors=True)
    li.write.partitionBy("l_returnflag").parquet(path)

    restated = li.where(F.col("l_returnflag") == "R").withColumn(
        "l_discount", F.lit(0.0)
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated.write.mode("overwrite").partitionBy(
            "l_returnflag"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    back = spark.read.parquet(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.round(F.sum("l_discount"), 4).alias("sum_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "multi_insert",
    oracle="""
    WITH hi AS (SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
                FROM orders WHERE o_totalprice > 300000),
    lo AS (SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
           FROM orders WHERE o_totalprice <= 50000)
    SELECT 'high' AS bucket, n, total FROM hi
    UNION ALL SELECT 'low' AS bucket, n, total FROM lo
    ORDER BY bucket
    """,
)
def multi_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive multi-insert: FROM src INSERT OVERWRITE t1 ... INSERT
    OVERWRITE t2 ... — one statement fanning a single source scan into
    several sinks. The statement itself is the surface under test (run
    as raw HiveQL); both sinks are read back and summarized so the
    oracle checks what actually landed in each."""
    cat = Catalog(spark, sf_dir)
    cat.orders.createOrReplaceTempView("mi_orders_src")
    for t in ("mi_high", "mi_low"):
        fresh_managed_table(spark, t)
        spark.sql(
            f"CREATE TABLE {t} (o_orderkey BIGINT, o_totalprice DOUBLE)"
            " USING parquet"
        )
    spark.sql(
        """
        FROM mi_orders_src
        INSERT OVERWRITE TABLE mi_high
          SELECT o_orderkey, o_totalprice WHERE o_totalprice > 300000
        INSERT OVERWRITE TABLE mi_low
          SELECT o_orderkey, o_totalprice WHERE o_totalprice <= 50000
        """
    )
    return spark.sql(
        """
        SELECT 'high' AS bucket, count(*) AS n,
               round(sum(o_totalprice), 2) AS total FROM mi_high
        UNION ALL
        SELECT 'low' AS bucket, count(*) AS n,
               round(sum(o_totalprice), 2) AS total FROM mi_low
        ORDER BY bucket
        """
    )


@query(
    "insert_overwrite_directory",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def insert_overwrite_directory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive INSERT OVERWRITE DIRECTORY: SQL writes query output
    straight to a filesystem path — no table object — the hand-off
    idiom to downstream non-SQL consumers. The export is read back and
    aggregated; parity vs the source table proves it is lossless."""
    from hdsp_hive_release_src_spark.sources.io import scratch_path

    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "iod_orders_src"
    )
    path = scratch_path("iod_export", sf_dir)
    spark.sql(
        f"""
        INSERT OVERWRITE DIRECTORY '{path}' USING parquet
        SELECT o_orderpriority, o_totalprice
        FROM iod_orders_src WHERE o_orderstatus = 'F'
        """
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "regex_serde_parse",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def regex_serde_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive RegexSerDe-style text ingestion: events are serialized to
    pipe-delimited log lines, read back as raw text, and re-parsed with
    regexp_extract into typed columns (the pattern for reading legacy
    log formats without a SerDe jar). Doubles survive the text round
    trip via Spark's shortest-repr cast; the oracle aggregates the
    ORIGINAL table, so any parse loss breaks parity."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    ev = Catalog(spark, sf_dir).events
    path = scratch_path("regex_serde_events", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    (
        ev.select(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("event_type"),
                F.col("value").cast("string"),
            ).alias("value")
        ).write.text(path)
    )
    raw = spark.read.text(path)
    pat = r"^(\d+)\|([a-z_]+)\|(.*)$"
    parsed = raw.select(
        F.regexp_extract("value", pat, 1).cast("long").alias("event_id"),
        F.regexp_extract("value", pat, 2).alias("event_type"),
        F.regexp_extract("value", pat, 3).cast("double").alias("value"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "partitioned_sink_prune",
    oracle="""
    SELECT l_linestatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → parquet partitioned by l_returnflag → read back
    filtering one partition. The filter must prune at the file-listing
    level (asserted in tests/test_sources.py), reading 1/3 of the data
    — the mechanism that makes a 100 TB table queryable by date/flag."""
    li = Catalog(spark, sf_dir).lineitem
    path = write_partitioned(li, "l_returnflag", "part_lineitem", sf_dir)
    back = spark.read.parquet(path).where(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "compact_small_files",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(LEAST(4, count(*)) AS BIGINT) AS n_files_after
    FROM orders WHERE o_orderkey < 8000
    """,
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the nightly chore of every streaming
    ingest: a deliberately fragmented table (40 shards) rewritten to a
    fixed file count with repartition before the write. Content must
    survive byte-exact (row count + key checksum vs the source), and
    the file count is read back from disk, proving the layout change
    actually happened. At 100 TB you'd target a file SIZE
    (maxRecordsPerFile / AQE coalescing) rather than a count, and
    compact per partition."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 8000)
    frag = scratch_path("compact_frag", sf_dir)
    tidy = scratch_path("compact_tidy", sf_dir)
    for p in (frag, tidy):
        shutil.rmtree(p, ignore_errors=True)
    o.repartition(40).write.parquet(frag)
    spark.catalog.refreshByPath(frag)
    spark.read.parquet(frag).repartition(4).write.parquet(tidy)
    spark.catalog.refreshByPath(tidy)
    back = spark.read.parquet(tidy)
    n_files = back.select(
        F.count_distinct(F.col("_metadata.file_path")).alias("nf")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    ).join(F.broadcast(n_files)).select(
        "n_rows", "key_sum", F.col("nf").cast("long").alias("n_files_after")
    )


@query(
    "metadata_columns",
    oracle="""
    SELECT CAST(LEAST(3, count(*)) AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS sizes_positive
    FROM orders WHERE o_orderkey < 6000
    """,
)
def metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns (_metadata.file_path / file_size) —
    the lineage surface ingest auditing reads (which file did this row
    come from, was the file non-empty) without a separate listing job.
    A 3-shard scratch table proves the per-file attribution: distinct
    file count, total rows, and positive file sizes."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 6000)
    path = scratch_path("meta_cols", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    o.repartition(3).write.parquet(path)
    spark.catalog.refreshByPath(path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count_distinct(F.col("_metadata.file_path"))
        .cast("long")
        .alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.bool_and(F.col("_metadata.file_size") > 0).alias(
            "sizes_positive"
        ),
    )


@query(
    "csv_options_matrix",
    oracle="""
    SELECT p_brand, count(*) AS n,
           round(sum(p_retailprice), 2) AS total_price,
           CAST(sum(CASE WHEN p_name LIKE '%;%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_delim
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def csv_options_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV option surface that breaks real ingests: a custom ';'
    delimiter, quoting (values CONTAINING the delimiter are injected
    so the quote path provably exercises), a custom escape char, and
    nullValue round-tripping. Written and read back with the same
    option set; parity against the ORIGINAL table proves nothing was
    split, swallowed, or mis-escaped. The n_with_delim column counts
    the injected delimiter-bearing names — non-zero by construction,
    so a quoting failure cannot pass silently."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    p = Catalog(spark, sf_dir).part.withColumn(
        "p_name",
        F.when(
            F.col("p_partkey") % 7 == 0,
            F.concat(F.col("p_name"), F.lit("; extra")),
        ).otherwise(F.col("p_name")),
    )
    path = scratch_path("csv_options_part", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    opts = {
        "header": "true",
        "sep": ";",
        "quote": '"',
        "escape": "\\",
        "nullValue": "\\N",
    }
    w = p.write
    for k, v in opts.items():
        w = w.option(k, v)
    w.csv(path)
    spark.catalog.refreshByPath(path)
    r = spark.read.schema(p.schema)
    for k, v in opts.items():
        r = r.option(k, v)
    back = r.csv(path)
    return (
        back.withColumn(
            "p_name", F.regexp_replace("p_name", "; extra$", "")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
            F.sum(F.col("p_name").contains(";").cast("int"))
            .cast("long")
            .alias("n_with_delim"),
        )
        .orderBy("p_brand")
    )


@query(
    "parquet_compression_codecs",
    oracle="""
    SELECT 'gzip' AS codec, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 3000
    UNION ALL
    SELECT 'snappy', count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey < 3000
    UNION ALL
    SELECT 'zstd', count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey < 3000
    ORDER BY codec
    """,
)
def parquet_compression_codecs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet compression codec round trips — gzip (max ratio),
    snappy (the default), zstd (the modern ratio/speed tradeoff each
    new warehouse standardizes on): each codec writes and reads back
    content-identically (count + key checksum vs the source). At
    100 TB codec choice is a double-digit-percent storage/scan-cost
    decision; what this query pins is that it is ONLY a storage
    decision — values are bit-identical through every codec."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 3000)
    frames = []
    for codec in ("gzip", "snappy", "zstd"):
        path = scratch_path(f"codec_{codec}", sf_dir)
        shutil.rmtree(path, ignore_errors=True)
        o.write.option("compression", codec).parquet(path)
        spark.catalog.refreshByPath(path)
        back = spark.read.parquet(path)
        frames.append(
            back.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
            ).select(F.lit(codec).alias("codec"), "n", "key_sum")
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("codec")


@query(
    "unicode_roundtrip",
    oracle="""
    SELECT doc_id,
           length(text || ' — häßlich ✓ 北京 🚀') AS n_chars,
           octet_length(encode(text || ' — häßlich ✓ 北京 🚀'))
               AS n_bytes,
           md5(text || ' — häßlich ✓ 北京 🚀') AS digest
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def unicode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 integrity through a JSON write/read round trip: every doc
    gets a multibyte suffix (Latin-1 supplement, dingbat, CJK, and a
    4-byte emoji — one of each UTF-8 width class), round-trips
    through the JSON-lines sink, and must come back with identical
    CHARACTER length, BYTE length, and md5 — the three ways encoding
    corruption (mojibake, truncation, surrogate mangling) shows up.
    char length ≠ byte length by construction here, so an engine
    conflating them cannot pass."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    d = Catalog(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    tagged = d.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" — häßlich ✓ 北京 🚀")).alias(
            "text"
        ),
    )
    path = scratch_path("unicode_docs", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    tagged.write.json(path)
    spark.catalog.refreshByPath(path)
    back = spark.read.schema("doc_id long, text string").json(path)
    return back.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.encode("text", "utf-8")).cast("long").alias(
            "n_bytes"
        ),
        F.md5(F.encode("text", "utf-8")).alias("digest"),
    ).orderBy("doc_id")
