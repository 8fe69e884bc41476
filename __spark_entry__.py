"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the query registry of ``hdsp_hive_release_src_spark``
(SURVEY.md §2 is the inventory; each name maps to a DataFrame impl in
``hdsp_hive_release_src_spark/queries/`` and, where SQL-expressible, a
DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hdsp_hive_release_src_spark import registry
from hdsp_hive_release_src_spark.session import tune_for_oracle

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 star join) on /root/testdata/sf0.001."""
    tune_for_oracle(spark)
    return registry.QUERIES["q5_local_supplier_volume"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)  # UTC — timestamp parity with DuckDB
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(registry.ORACLES)
