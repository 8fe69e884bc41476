"""Null-safety property tests for the distributed exact-rank/ntile
operator (operators/ranking.py): the r5 caveat "value_col must be
non-null" is now a guarantee — nulls rank exactly where Spark's own
global window puts them (asc = NULLS FIRST, desc = NULLS LAST)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.operators.ranking import (
    exact_ntile,
    with_global_rank,
)


@pytest.fixture(scope="module")
def null_df(spark):
    # values with ties, several nulls, and a deterministic tiebreak id
    rows = [
        (i, v)
        for i, v in enumerate(
            [5.0, None, 3.0, 3.0, None, 9.0, 1.0, None, 5.0, 7.0,
             2.0, 2.0, None, 8.0, 0.5]
        )
    ]
    return spark.createDataFrame(rows, "id long, v double").repartition(4)


@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_matches_window_with_nulls(null_df, descending):
    got, total = with_global_rank(
        null_df, "v", ["id"], descending=descending, n_ranges=4
    )
    order = (
        [F.desc("v"), F.asc("id")] if descending
        else [F.asc("v"), F.asc("id")]
    )
    want = null_df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    assert total == null_df.count()
    assert (
        sorted(got.select("id", "rank").collect())
        == sorted(want.select("id", "rank").collect())
    )


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("k", [1, 3, 4])
def test_exact_ntile_matches_window_with_nulls(null_df, descending, k):
    got = exact_ntile(
        null_df, "v", ["id"], n_buckets=k, descending=descending,
        n_ranges=4,
    )
    order = (
        [F.desc("v"), F.asc("id")] if descending
        else [F.asc("v"), F.asc("id")]
    )
    want = null_df.withColumn(
        "bucket", F.ntile(k).over(Window.orderBy(*order))
    )
    assert (
        sorted(got.select("id", "bucket").collect())
        == sorted(want.select("id", "bucket").collect())
    )


def test_all_null_column(spark):
    df = spark.createDataFrame(
        [(i, None) for i in range(7)], "id long, v double"
    )
    got, total = with_global_rank(df, "v", ["id"], n_ranges=4)
    assert total == 7
    assert [r["rank"] for r in got.orderBy("id").collect()] == list(
        range(1, 8)
    )
