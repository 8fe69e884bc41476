"""SURVEY.md §2 round-6 additions — the remaining catalog
introspection + informational-constraint surfaces of the public Hive
DDL set: SHOW CREATE TABLE, DESCRIBE FORMATTED, and Hive-3-style
informational constraints (PRIMARY KEY / NOT NULL / CHECK ... RELY).

Spark 4 parses ``ALTER TABLE ... ADD CONSTRAINT`` but the v1
(parquet/metastore) table implementation rejects it with
UNSUPPORTED_FEATURE.TABLE_OPERATION (probed round 6; the constraint
SPIP targets v2 catalogs). Production Hive deployments treat these
constraints as INFORMATIONAL — never enforced on write, stored as
table metadata for the optimizer (RELY lets the CBO eliminate joins)
and for tooling. That metadata contract is what
``informational_constraints_ddl`` implements: constraint specs travel
in TBLPROPERTIES on a managed table, are read back from the catalog,
and the query output carries a per-constraint ``satisfied`` boolean
computed from the live data — so parity proves both the metadata
round-trip and that the declared invariants actually hold. A sentinel
test (tests/test_catalog_surface.py) fails the moment native ADD
CONSTRAINT starts working, flagging promotion to the first-class DDL.

All three queries are pure metastore/metadata surfaces: no data-path
implications at any scale beyond one aggregation over the validated
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query
from hdsp_hive_release_src_spark.sources.io import fresh_managed_table

# (name, definition stored in + read back from TBLPROPERTIES,
#  rely flag, SQL predicate that must hold for every row)
_CONSTRAINTS = (
    (
        "ck_totalprice",
        "CHECK (o_totalprice > 0)",
        False,
        "o_totalprice > 0",
    ),
    (
        "nn_custkey",
        "NOT NULL (o_custkey)",
        True,
        "o_custkey IS NOT NULL",
    ),
    (
        "pk_orderkey",
        "PRIMARY KEY (o_orderkey)",
        True,
        None,  # uniqueness checked as an aggregate, not per-row
    ),
)


def _constraints_oracle() -> str:
    rows = []
    for name, definition, rely, pred in _CONSTRAINTS:
        if pred is None:
            sat = (
                "(SELECT count(DISTINCT o_orderkey) = count(*) "
                "FROM orders WHERE o_orderkey < 5000)"
            )
        else:
            sat = (
                f"(SELECT count(*) FROM orders "
                f"WHERE o_orderkey < 5000 AND NOT ({pred})) = 0"
            )
        rows.append(
            f"SELECT '{name}' AS constraint_name, "
            f"'{definition}' AS definition, "
            f"{'TRUE' if rely else 'FALSE'} AS rely, {sat} AS satisfied"
        )
    return " UNION ALL ".join(rows) + " ORDER BY constraint_name"


@query("informational_constraints_ddl", oracle=_constraints_oracle())
def informational_constraints_ddl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive informational constraints (PRIMARY KEY / NOT NULL / CHECK
    with RELY/NORELY): declared as table metadata on a managed table,
    read back FROM THE CATALOG (SHOW TBLPROPERTIES — a definition that
    failed to persist breaks parity), each paired with a ``satisfied``
    boolean computed from the live rows. RELY semantics are exactly
    this split: the engine does not enforce on write; it trusts the
    declaration for optimization, and auditing = re-deriving
    ``satisfied`` like this query does. Scale shape: metadata ops are
    O(1); validation is one aggregation per constraint over one scan
    (count distinct / null count / predicate violations), all partial-
    aggregated."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 5000)
    fresh_managed_table(spark, "ic_orders")
    o.select("o_orderkey", "o_custkey", "o_totalprice").write.saveAsTable(
        "ic_orders"
    )
    props = ", ".join(
        f"'constraint.{name}' = '{definition}|"
        f"{'RELY' if rely else 'NORELY'}'"
        for name, definition, rely, _ in _CONSTRAINTS
    )
    spark.sql(f"ALTER TABLE ic_orders SET TBLPROPERTIES ({props})")
    back = {
        r.key.removeprefix("constraint."): r.value
        for r in spark.sql("SHOW TBLPROPERTIES ic_orders").collect()
        if r.key.startswith("constraint.")
    }
    t = spark.table("ic_orders")
    checks = []
    for name, _, _, pred in _CONSTRAINTS:
        if pred is None:
            col = (
                F.countDistinct("o_orderkey") == F.count(F.lit(1))
            ).alias(name)
        else:
            col = (
                F.sum(
                    F.when(~F.expr(pred), F.lit(1)).otherwise(F.lit(0))
                )
                == 0
            ).alias(name)
        checks.append(col)
    sat = t.agg(*checks).collect()[0]
    out = sorted(
        (
            name,
            back[name].split("|")[0],
            back[name].split("|")[1] == "RELY",
            bool(sat[name]),
        )
        for name, _, _, _ in _CONSTRAINTS
    )
    return spark.createDataFrame(
        out,
        "constraint_name string, definition string, "
        "rely boolean, satisfied boolean",
    )


@query(
    "show_create_table",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT),
       'CREATE TABLE spark_catalog.default.sct_nation ('),
      (1, 'n_nationkey INT,'),
      (2, 'n_name STRING,'),
      (3, 'n_regionkey INT)'),
      (4, 'USING parquet')) t(line_id, line)
    ORDER BY line_id
    """,
)
def show_create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW CREATE TABLE: the catalog must reproduce a complete,
    re-runnable DDL statement for a managed table — schema, order of
    columns, and storage provider. The oracle pins the exact
    (trimmed) statement lines, so a type mapping drift, a dropped
    column, or a provider change breaks parity. Metadata-only at any
    scale."""
    n = Catalog(spark, sf_dir).nation
    fresh_managed_table(spark, "sct_nation")
    n.write.saveAsTable("sct_nation")
    stmt = spark.sql("SHOW CREATE TABLE sct_nation").collect()[0][0]
    lines = [ln.strip() for ln in stmt.splitlines() if ln.strip()]
    return spark.createDataFrame(
        list(enumerate(lines)), "line_id long, line string"
    )


@query(
    "describe_formatted",
    oracle="""
    SELECT * FROM (VALUES
      ('column', 'c_acctbal', 'double'),
      ('column', 'c_custkey', 'bigint'),
      ('column', 'c_mktsegment', 'string'),
      ('info', 'Database', 'default'),
      ('info', 'Provider', 'parquet'),
      ('info', 'Table', 'dfm_customer'),
      ('info', 'Type', 'MANAGED')) t(section, key, value)
    ORDER BY section, key
    """,
)
def describe_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE FORMATTED: the full catalog card — data columns plus
    the detailed-info block (database, table, managed-vs-external,
    provider). Volatile rows (timestamps, locations, engine version)
    are excluded; the deterministic inventory is pinned by the
    oracle. This is the surface every catalog UI and lineage crawler
    scrapes."""
    c = Catalog(spark, sf_dir).customer
    fresh_managed_table(spark, "dfm_customer")
    c.select("c_custkey", "c_mktsegment", "c_acctbal").write.saveAsTable(
        "dfm_customer"
    )
    rows = spark.sql("DESCRIBE FORMATTED dfm_customer").collect()
    out = []
    in_info = False
    keep = {"Database", "Table", "Type", "Provider"}
    for r in rows:
        if r.col_name.startswith("# Detailed Table"):
            in_info = True
            continue
        if not r.col_name:
            continue
        if in_info:
            if r.col_name in keep:
                out.append(("info", r.col_name, r.data_type))
        else:
            out.append(("column", r.col_name, r.data_type))
    return spark.createDataFrame(
        sorted(out), "section string, key string, value string"
    )
