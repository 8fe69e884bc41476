"""The whole registry against its DuckDB oracles at sf0.001 — one
parametrized test per query, so ANY parity break (new query, changed
oracle, engine upgrade) fails the suite by name without waiting for
the external gate. Runs after the focused per-family modules; ~90 s
total at smoke scale."""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark.registry import (
    ORACLES,
    QUERIES,
    load_all,
)
from tests.conftest import oracle_compare

load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity_all(name, spark, sf_dir, duck):
    from hdsp_hive_release_src_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # test speed
    df = QUERIES[name](spark, sf_dir)
    # The external gate canonicalizes results THROUGH pandas — values a
    # Spark row can hold but pandas cannot (ns-overflow timestamps past
    # 2262-04-11, r4's scd2 sentinel; exotic nested cells, r3's
    # fuzzy_match lists) kill the row before comparison. Every
    # registered query must survive the pandas conversion, not just
    # collect().
    df.toPandas()
    if name in ORACLES:
        oracle_compare(df, duck, ORACLES[name])
    else:
        assert df.count() >= 0
