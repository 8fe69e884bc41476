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


def oracle_compare(df, con, sql: str) -> None:
    """Order-insensitive compare of a Spark DF vs a DuckDB result."""
    scols = df.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
                vals.append(repr(v))
            out.append("|".join(vals))
        return sorted(out)

    srows = [tuple(r) for r in df.collect()]
    drows = res.fetchall()
    assert canon(srows, scols) == canon(drows, dcols)
