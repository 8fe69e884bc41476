"""Query registry: the single source of truth wiring SURVEY.md §2 names
to (a) a Spark DataFrame implementation and (b) an optional DuckDB oracle
SQL string. ``__spark_entry__.py`` re-exports these for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under its SURVEY.md §2 name.

    ``oracle`` is ANSI/DuckDB SQL over the pre-registered parquet views
    (region nation customer supplier part orders lineitem events
    documents embeddings). Omit it only for genuinely non-SQL ops —
    the driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run.

    Import ORDER is registration order is the order any sampling driver
    walks the registry — so the highest-risk families (TPC-H, the LLM
    dedup/ANN pipeline, streaming, sources) register FIRST, ahead of the
    builtin-function suites that a sample window would otherwise fill
    up on.
    """
    from hdsp_hive_release_src_spark.queries import (  # noqa: F401
        tpch,
        tpch_extra,
        llm,
        llm2,
        llm3,
        streaming,
        sources,
        events,
        timeseries,
        analytics,
        engine_surface,
        extras,
        extras2,
        extras3,
        functions_suite,
        hive_surface,
        olap_surface,
        udf_surface,
    )
