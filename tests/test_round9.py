"""Round-9 first-wave properties that oracle value-parity can't see:
VARCHAR overflow enforcement, CHAR read-side padding, null-partition
directory layout + pruning, bloom-filter byte overhead, text lineSep
record-termination contract. Value parity itself is covered
generically by tests/test_all_oracles.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


# --------------------------------------------------------------------
# char_varchar_semantics
# --------------------------------------------------------------------

def test_varchar_overflow_rejected(spark):
    """VARCHAR(n) is a hard length contract at write time, not a
    silent truncation."""
    spark.sql("DROP TABLE IF EXISTS cv9_overflow")
    spark.sql(
        "CREATE TABLE cv9_overflow (v VARCHAR(5)) USING parquet"
    )
    try:
        with pytest.raises(Exception, match="[Ll]ength|EXCEED"):
            spark.sql(
                "INSERT INTO cv9_overflow VALUES ('waytoolongvalue')"
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS cv9_overflow")


def test_char_padding_is_read_side(spark):
    """CHAR(12) values come back blank-padded to exactly 12 and
    compare pad-insensitively against shorter literals."""
    registry.QUERIES["char_varchar_semantics"](spark, SF)
    row = spark.sql(
        "SELECT b, length(b) AS l, b = 'Brand#11' AS eq "
        "FROM cv9_part WHERE trim(b) = 'Brand#11' LIMIT 1"
    ).collect()[0]
    assert row.l == 12 and row.b.endswith("    ") and row.eq


# --------------------------------------------------------------------
# null_partition_handling
# --------------------------------------------------------------------

def test_null_partition_directory_and_pruning(spark):
    """The NULL bucket lands in __HIVE_DEFAULT_PARTITION__ on disk,
    and an IS NULL filter prunes the scan to that one directory."""
    from hdsp_hive_release_src_spark.sources.io import scratch_path

    registry.QUERIES["null_partition_handling"](spark, SF).collect()
    path = scratch_path("nullpart_orders_r9", SF)
    dirs = {d for d in os.listdir(path) if d.startswith("pbucket=")}
    assert "pbucket=__HIVE_DEFAULT_PARTITION__" in dirs
    assert {"pbucket=b0", "pbucket=b1", "pbucket=b2"} <= dirs
    pruned = spark.read.parquet(path).where(F.col("pbucket").isNull())
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnull(pbucket" in plan
    # the pruned scan returns exactly the mod-7 rows, as real NULLs
    n_null = pruned.count()
    exp = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .where(F.col("o_custkey") % 7 == 0)
        .count()
    )
    assert n_null == exp > 0


# --------------------------------------------------------------------
# parquet_bloom_filter_write
# --------------------------------------------------------------------

def test_bloom_write_overhead_positive(spark):
    """The bloom-enabled file set is strictly larger than the
    option-free twin (the only observable presence proof on this
    pyarrow/duckdb build), and bounded by the max.bytes cap."""
    from hdsp_hive_release_src_spark.sources.io import scratch_path

    row = registry.QUERIES["parquet_bloom_filter_write"](
        spark, SF
    ).collect()[0]
    assert row.bloom_overhead_positive

    def _bytes(root):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    on = _bytes(scratch_path("bloom_on_r9", SF))
    off = _bytes(scratch_path("bloom_off_r9", SF))
    n_files = sum(
        1
        for _, _, fs in os.walk(scratch_path("bloom_on_r9", SF))
        for f in fs
        if f.endswith(".parquet")
    )
    # cap: <= max.bytes (64 KiB) per column chunk, 6 columns, per file
    assert 0 < on - off <= 65536 * 6 * n_files


# --------------------------------------------------------------------
# text_source_options
# --------------------------------------------------------------------

def test_text_linesep_terminates_every_record(spark):
    """The writer terminates EVERY record with the separator (file
    ends with 0x1E), which is what makes wholetext_len = sum_len +
    n_lines in the query's contract."""
    from hdsp_hive_release_src_spark.sources.io import scratch_path

    row = registry.QUERIES["text_source_options"](spark, SF).collect()[0]
    assert row.n_wholetext_rows == 1
    assert row.wholetext_len == row.sum_len + row.n_lines
    path = scratch_path("text_sep_docs_r9", SF)
    files = [
        os.path.join(d, f)
        for d, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".txt")
    ]
    assert len(files) == 1
    with open(files[0], "rb") as fh:
        data = fh.read()
    assert data.endswith(b"\x1e") and b"\n" not in data.replace(
        b"\x1e", b""
    ) or data.endswith(b"\x1e")


# --------------------------------------------------------------------
# insert_defaults_surface
# --------------------------------------------------------------------

def test_defaults_fill_omitted_columns(spark):
    df = registry.QUERIES["insert_defaults_surface"](spark, SF)
    rows = {(r.pri, r.flag): r.n for r in df.collect()}
    assert ("NONE", "explicit") in rows
    assert all(
        flag == "defaulted" for (pri, flag) in rows if pri != "NONE"
    )


# --------------------------------------------------------------------
# sequence_generate_series
# --------------------------------------------------------------------

def test_sequence_inclusive_bounds(spark):
    df = registry.QUERIES["sequence_generate_series"](spark, SF)
    r1 = df.where(F.col("k") == 1).collect()[0]
    assert r1.up == "1,2,3,4"
    assert r1.down == "4,3,2,1"
    assert r1.dates.startswith("2024-01-01,2024-01-08")
