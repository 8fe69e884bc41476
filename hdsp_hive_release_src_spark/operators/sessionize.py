"""Gap-based sessionization as a window composition (batch path).

Classic lag+cumsum: a session starts where the gap to the previous
event of the same key exceeds the threshold; the running count of
session starts is the session id. One shuffle on the key; all
arithmetic stays in codegen. (Streaming path: session_window in
``streaming/jobs.py``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_id`` (1-based per key) to every row of ``df``."""
    w_order = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w_order))
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w_cum).cast("long")
    ).drop("__new")
