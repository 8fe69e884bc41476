"""SURVEY.md §2.2/§2.3 continued — production-ETL surfaces: snapshot
diffing (CDC extract), change-stream application (CDC apply, the MERGE
substitute when no ACID table format is mounted), a data-quality audit,
time-weighted averaging over irregular samples, and the high-watermark
incremental-load pattern.

Scale shapes: snapshot diff and CDC apply shuffle once on the business
key; the DQ audit is one pass of conditional aggregates plus one
broadcast-anti orphan probe; time-weighted averages are one window pass
per key partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey < 4000),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             round(o_totalprice * CASE WHEN o_orderkey % 10 = 0
                                       THEN 1.1 ELSE 1.0 END, 2) AS price
      FROM orders WHERE o_orderkey < 4500 AND o_orderkey % 7 <> 0)
    SELECT change, count(*) AS n FROM (
      SELECT CASE
               WHEN o.o_orderkey IS NULL THEN 'insert'
               WHEN n.o_orderkey IS NULL THEN 'delete'
               WHEN o.price <> n.price
                 OR o.o_orderstatus <> n.o_orderstatus THEN 'update'
               ELSE 'unchanged' END AS change
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
    GROUP BY change ORDER BY change
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extract by snapshot diff: yesterday's and today's order
    snapshots (deterministically derived from the same base so the
    oracle replays them) full-outer-joined on the business key and
    classified insert / delete / update / unchanged — how change
    capture works when the source system offers no log. One key-hash
    shuffle for the join; at 100 TB both snapshots bucket on the key
    and the diff is co-located."""
    o = Catalog(spark, sf_dir).orders
    old = o.where(F.col("o_orderkey") < 4000).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    new = (
        o.where(
            (F.col("o_orderkey") < 4500) & (F.col("o_orderkey") % 7 != 0)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(
                F.col("o_totalprice")
                * F.when(F.col("o_orderkey") % 10 == 0, 1.1).otherwise(
                    1.0
                ),
                2,
            ).alias("price"),
        )
    )
    j = old.alias("o").join(
        new.alias("n"),
        F.col("o.o_orderkey") == F.col("n.o_orderkey"),
        "full_outer",
    )
    change = (
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .when(
            (F.col("o.price") != F.col("n.price"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            "update",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change"))
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )


@query(
    "cdc_apply_changes",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
             o_orderpriority AS val,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_orderkey AS seq
      FROM orders WHERE o_custkey < 50),
    last AS (
      SELECT k, op, val,
             row_number() OVER (PARTITION BY k
                 ORDER BY ts DESC, seq DESC) AS rn
      FROM changes)
    SELECT k, val FROM last WHERE rn = 1 AND op <> 'D'
    ORDER BY k
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply without an ACID table format: an ordered change stream
    (upserts + deletes, deterministically derived from orders) is
    collapsed last-writer-wins per key — row_number over (ts, seq)
    descending, keep rn=1, drop keys whose final op is a delete. This
    is the MERGE INTO substitute pattern (cf. merge_upsert) and the
    compaction step every log-structured ingest runs; one key shuffle,
    and the same window also serves dedup-by-latest."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_custkey") < 50)
    changes = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 11 == 0, "D")
        .otherwise("U")
        .alias("op"),
        F.col("o_orderpriority").alias("val"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_orderkey").alias("seq"),
    )
    w = Window.partitionBy("k").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", "val")
        .orderBy("k")
    )


@query(
    "dq_audit",
    oracle="""
    WITH orphans AS (
      SELECT count(*) AS n_orphan FROM (
        SELECT l_orderkey FROM lineitem
        EXCEPT
        SELECT o_orderkey FROM orders)),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(l_quantity) AS BIGINT) AS null_qty,
             CAST(count_if(l_discount < 0 OR l_discount > 0.5)
                  AS BIGINT) AS bad_discount,
             CAST(count_if(l_shipdate IS NULL) AS BIGINT)
                 AS null_shipdate,
             CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags
      FROM lineitem)
    SELECT n_rows, null_qty, bad_discount, null_shipdate, n_flags,
           CAST(n_orphan AS BIGINT) AS n_orphan_lines
    FROM base, orphans
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the gate a production load runs before
    publishing a partition: null counts, domain-range violations,
    category cardinality, and referential orphans (lineitem keys with
    no parent order). One scan of conditional aggregates + one
    distinct-key anti probe; emitted as a single wide row a scheduler
    can assert on. At 100 TB the orphan probe is a broadcast of the
    aggregated DISTINCT key set, never a row-level join."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    orphan = (
        li.select("l_orderkey")
        .distinct()
        .join(
            cat.orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphan_lines"))
    )
    base = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("null_qty"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
        ).alias("bad_discount"),
        F.count_if(F.col("l_shipdate").isNull()).alias("null_shipdate"),
        F.count_distinct("l_returnflag").alias("n_flags"),
    )
    return base.join(F.broadcast(orphan))


@query(
    "time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER w)
               - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
                   event_id))
    SELECT user_id,
           round(sum(value * dur_us) / sum(dur_us), 6) AS twa,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM s WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id ORDER BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregular samples — the correct mean
    for sensor/metric streams where a value holds until the next
    reading (an arithmetic mean over-weights bursty periods): each
    value weighted by its holding duration (lead(ts) - ts). One window
    pass per user partition, then a plain aggregate — both share the
    user_id shuffle."""
    ev = Catalog(spark, sf_dir).events.where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    )
    s = ev.select("user_id", "value", dur.alias("dur_us")).where(
        F.col("dur_us").isNotNull() & (F.col("dur_us") > 0)
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us"))
                / F.sum("dur_us"),
                6,
            ).alias("twa"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@query(
    "incremental_high_watermark",
    oracle="""
    WITH watermark AS (
      SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 7 DAY AS wm
      FROM events),
    increment AS (
      SELECT event_type, count(*) AS n_new,
             round(sum(value), 2) AS value_new
      FROM events, watermark WHERE CAST(ts AS TIMESTAMP) > wm
      GROUP BY event_type)
    SELECT event_type, n_new, value_new FROM increment
    ORDER BY event_type
    """,
)
def incremental_high_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """High-watermark incremental load: only rows newer than the last
    processed timestamp (here: max(ts) - 7 days, derived from the data
    so the oracle replays it) enter the batch — the pattern that turns
    a full-table daily job into an incremental one. The watermark is a
    broadcast scalar; with time-partitioned storage the filter becomes
    partition pruning and the scan touches only new partitions."""
    ev = Catalog(spark, sf_dir).events
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("wm")
    )
    return (
        ev.join(F.broadcast(wm))
        .where(F.col("ts") > F.col("wm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.round(F.sum("value"), 2).alias("value_new"),
        )
        .orderBy("event_type")
    )


@query(
    "delete_update_emulation",
    oracle="""
    WITH after_delete AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey < 5000 AND NOT o_orderstatus = 'P'),
    after_update AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN cents * 105 // 100 ELSE cents END AS cents
      FROM after_delete)
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM after_update GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def delete_update_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ACID DELETE + UPDATE statement semantics, emulated the way
    every non-ACID lakehouse does it — copy-on-write rewrite: DELETE is
    a filtered rewrite of the table file set, UPDATE a projected
    rewrite, both materialized to a scratch table and read back (so
    the check covers the persisted result, not just the expression).
    With Delta/Iceberg mounted the same statements run natively;
    merge_upsert covers the MERGE third of the triad."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 5000)
    path = scratch_path("acid_emulation", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    # money rides as integer cents through the whole rewrite: per-row
    # double rounding (round(x*1.05, 2)) flips at representational
    # boundaries BETWEEN engines, while integer `div` cannot
    o.withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    ).write.parquet(path)
    spark.catalog.refreshByPath(path)
    tbl = spark.read.parquet(path)
    # DELETE FROM t WHERE o_orderstatus = 'P'  → filtered rewrite
    deleted = tbl.where(~(F.col("o_orderstatus") == "P"))
    # UPDATE t SET price = price*1.05 WHERE urgent → projected rewrite
    updated = deleted.withColumn(
        "cents",
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.expr("cents * 105 div 100"),
        ).otherwise(F.col("cents")),
    )
    out = f"{path}_v2"
    shutil.rmtree(out, ignore_errors=True)
    updated.write.parquet(out)
    spark.catalog.refreshByPath(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "nested_types_roundtrip",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             string_split(o_orderpriority, '-') AS tags,
             {'status': o_orderstatus,
              'price': round(o_totalprice, 2)} AS meta
      FROM orders WHERE o_orderkey < 2000)
    SELECT count(*) AS n,
           CAST(sum(len(tags)) AS BIGINT) AS total_tags,
           round(sum(meta.price), 2) AS total_price,
           CAST(count(DISTINCT meta.status) AS BIGINT) AS n_status
    FROM src
    """,
)
def nested_types_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type IO: array + struct columns written to parquet and
    read back, with the aggregation running on the PERSISTED nested
    data (dotted struct access, array length) — proves nested schemas
    survive the writer/reader round trip, the prerequisite for every
    document-shaped table. The oracle computes the same from the flat
    source."""
    import shutil

    from hdsp_hive_release_src_spark.sources.io import scratch_path

    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    nested = o.select(
        "o_orderkey",
        F.split("o_orderpriority", "-").alias("tags"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        ).alias("meta"),
    )
    path = scratch_path("nested_types", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    nested.write.parquet(path)
    spark.catalog.refreshByPath(path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("tags")).cast("long").alias("total_tags"),
        F.round(F.sum("meta.price"), 2).alias("total_price"),
        F.count_distinct("meta.status").alias("n_status"),
    )


@query(
    "date_parse_formats",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y/%m/%d')
               AS slash_form,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%d-%b-%Y')
               AS dmy_form,
           CAST(strptime(strftime(CAST(o_orderdate AS TIMESTAMP),
                '%Y/%m/%d'), '%Y/%m/%d') AS TIMESTAMP) AS reparsed
    FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey
    """,
)
def date_parse_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format / to_timestamp custom patterns — the
    format-string surface every Hive report and ingest script leans
    on, exercised as a round trip: format to two layouts (numeric and
    abbreviated-month) and re-parse back to the original timestamp.
    Each engine uses its own pattern dialect (Java letters vs
    strftime) but must produce the identical text and re-parsed
    instant."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 400)
    od = F.col("o_orderdate").cast("timestamp")
    slash = F.date_format(od, "yyyy/MM/dd")
    return o.select(
        "o_orderkey",
        slash.alias("slash_form"),
        F.date_format(od, "dd-MMM-yyyy").alias("dmy_form"),
        F.to_timestamp(slash, "yyyy/MM/dd").alias("reparsed"),
    ).orderBy("o_orderkey")


def _row_fingerprint_sql(nibbles: int = 15) -> str:
    """60-bit integer from the first 15 md5 nibbles of the canonical
    row string `s` — identical arithmetic text for both engines."""
    terms = [
        f"(CAST(instr('0123456789abcdef', substr(h, {k}, 1)) - 1"
        f" AS BIGINT) * {16 ** (nibbles - k)})"
        for k in range(1, nibbles + 1)
    ]
    return " + ".join(terms)


@query(
    "table_checksum_audit",
    oracle=f"""
    WITH canon AS (
      SELECT md5(CAST(o_orderkey AS VARCHAR) || '|'
             || CAST(o_custkey AS VARCHAR) || '|'
             || o_orderstatus || '|'
             || CAST(CAST(o_totalprice AS DECIMAL(18, 2)) AS VARCHAR)
             || '|' || o_orderpriority || '|'
             || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS h
      FROM orders),
    fp AS (SELECT {{}} AS v FROM canon)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(v AS DECIMAL(38, 0))) AS VARCHAR)
               AS content_checksum
    FROM fp
    """.format(
        _row_fingerprint_sql().replace("instr(", "strpos(")
    ),
)
def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content checksum — the cross-system
    migration validator: every row canonicalizes to a delimited
    string (doubles pinned to DECIMAL(18,2) text, dates to ISO — the
    two encodings engines would otherwise render differently), hashes
    to a 60-bit integer (15 md5 nibbles), and the DECIMAL(38) SUM of
    those integers is the table's fingerprint. Summation is
    commutative, so partitioning/order can't change it, and decimal
    addition is exact, so neither can the combine tree — two systems
    holding the same rows MUST produce the same checksum, which is
    precisely what the oracle asserts from the other engine. One scan,
    one map-side-combined aggregation; at 100 TB this runs per
    partition for incremental re-validation."""
    o = Catalog(spark, sf_dir).orders
    canon = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            "o_orderpriority",
            F.col("o_orderdate").cast("date").cast("string"),
        )
    )
    fp = o.select(canon.alias("h")).select(
        F.expr(_row_fingerprint_sql()).alias("v")
    )
    return fp.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").cast("decimal(38,0)"))
        .cast("string")
        .alias("content_checksum"),
    )
