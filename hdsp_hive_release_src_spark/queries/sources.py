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
