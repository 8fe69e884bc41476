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

#: queries whose output is legitimately empty at sf0.001 SMOKE scale
#: (thresholds sized for the sf0.01 gate, where both are non-empty —
#: asserted at gate scale in tests/test_nonvacuous.py). Anything else
#: producing 0 rows is a vacuous oracle match (the r6 verdict's weak
#: class) and fails here.
SMOKE_EMPTY_OK = frozenset({
    "item_cooccurrence_support",  # min support 5 needs sf0.01 density
    "q7_volume_shipping",  # 1995-1996 ship-year pairs absent at sf0.001
})


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
    pdf = df.toPandas()
    if name not in SMOKE_EMPTY_OK:
        assert len(pdf) >= 1, (
            "empty output at smoke scale — a green oracle row would be "
            "vacuous; lower the threshold or whitelist with a reason"
        )
    if name in ORACLES:
        # reuse the pandas frame computed above — re-running toPandas
        # inside oracle_compare executed every query twice (r17)
        oracle_compare(df, duck, ORACLES[name], spdf=pdf)
    else:
        assert df.count() >= 0
