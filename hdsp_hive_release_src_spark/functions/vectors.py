"""Vector math over ``array<float>`` embedding columns.

Built from higher-order functions (``zip_with`` + sequential
``aggregate`` fold) so the arithmetic runs in the JVM with a
deterministic left-to-right summation order — bit-identical across
engines that fold sequentially (DuckDB's list_sum), which the oracle
comparison relies on. Casting to double *before* multiplying avoids
float32 rounding divergence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
