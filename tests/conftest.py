from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hdsp_hive_release_src_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def oracle_compare(df, con, sql: str, spdf=None) -> None:
    """Order-insensitive compare of a Spark DF vs a DuckDB result.

    Canonicalizes BOTH sides through pandas (Spark ``.toPandas()``,
    DuckDB ``.df()``) because that is the grading driver's path — a
    ``fetchall()`` compare masks dtype coercions like DuckDB HUGEINT →
    float64 that the driver WILL see (the r7 red row).

    ``spdf``: pass the frame when the caller already ran
    ``df.toPandas()`` (r17, suite-runtime: the full-registry parity
    test executed every query TWICE — once for its smoke checks, once
    here — doubling the Spark cost of the whole oracle tier)."""
    from tools.check_oracle import canon_pdf

    if spdf is None:
        spdf = df.toPandas()
    dpdf = con.execute(sql).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        list(spdf.columns), list(dpdf.columns)
    )
    assert canon_pdf(spdf) == canon_pdf(dpdf)
