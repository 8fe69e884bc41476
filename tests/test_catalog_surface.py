"""Round-6 catalog surfaces: informational constraints, SHOW CREATE
TABLE, DESCRIBE FORMATTED."""

from __future__ import annotations

import pytest


def test_native_add_constraint_still_unsupported(spark):
    """Promotion sentinel (same pattern as the avro/kafka probes): v1
    tables reject ALTER TABLE ... ADD CONSTRAINT today. If this test
    fails, the constraint SPIP has landed for this catalog and
    informational_constraints_ddl should switch from TBLPROPERTIES
    emulation to the native DDL."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from hdsp_hive_release_src_spark.sources.io import (
        fresh_managed_table,
    )

    fresh_managed_table(spark, "probe_constraint_t")
    spark.range(3).write.saveAsTable("probe_constraint_t")
    with pytest.raises(AnalysisException, match="ADD CONSTRAINT"):
        spark.sql(
            "ALTER TABLE probe_constraint_t "
            "ADD CONSTRAINT pk_id PRIMARY KEY (id) RELY"
        )


def test_constraints_report_violation(spark, sf_dir):
    """The satisfied flag must be computed from data, not declared: a
    table with a duplicate key / a null / a negative price fails the
    matching constraint check."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, None, -2.0), (2, 30, 7.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    checks = df.agg(
        (F.countDistinct("o_orderkey") == F.count(F.lit(1))).alias("pk"),
        (
            F.sum(
                F.when(
                    ~F.expr("o_custkey IS NOT NULL"), F.lit(1)
                ).otherwise(F.lit(0))
            )
            == 0
        ).alias("nn"),
        (
            F.sum(
                F.when(~F.expr("o_totalprice > 0"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            == 0
        ).alias("ck"),
    ).collect()[0]
    assert not checks["pk"] and not checks["nn"] and not checks["ck"]


def test_show_create_table_roundtrips(spark, sf_dir):
    """The emitted DDL must be re-runnable: executing the statement
    (renamed) recreates a table with the identical schema."""
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.sources.io import (
        fresh_managed_table,
    )

    registry.load_all()
    rows = registry.QUERIES["show_create_table"](spark, sf_dir).collect()
    stmt = "\n".join(r.line for r in sorted(rows, key=lambda r: r.line_id))
    fresh_managed_table(spark, "sct_nation_rt")
    spark.sql(
        stmt.replace(
            "spark_catalog.default.sct_nation", "sct_nation_rt"
        )
    )
    assert (
        spark.table("sct_nation_rt").schema
        == spark.table("sct_nation").schema
    )
