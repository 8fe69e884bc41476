"""Backward as-of join as a pure DataFrame composition.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable
re-expression: union both sides tagged, single shuffle on
(by_keys, time), then a carry-forward window (`last(..., ignorenulls)`)
propagates the most recent right-side row onto each left row. One
shuffle total — same cost as the sort-merge join a native
implementation would do, and it never builds a per-row range scan.

An `applyInPandas` + ``pd.merge_asof`` variant would also work but
moves the whole fact table through Arrow; the window form stays in
Tungsten and is what we'd run at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right.right_on <= left.left_on`` and matching `by` key
    (backward as-of, inclusive — ties resolve to the right row)."""
    lcols = left.columns
    tagged_l = left.select(
        F.col(by_left).alias("__by"),
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        F.col(by_right).alias("__by"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # right rows (__is_left=0) sort before left rows at equal __t,
    # so an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy("__by")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__is_left") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )
