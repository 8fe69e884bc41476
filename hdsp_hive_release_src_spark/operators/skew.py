"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one key dominates so
hard that even split partitions overwhelm a task, or when AQE is
unavailable (streaming joins). Deterministic: the salt comes from
hashing a caller-named column, not rand(), so results are reproducible
and retries are safe.

Cost model: the small side is replicated ``n_salts``× — use for
hot-key × dimension joins, not fact × fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side's hot keys spread over
    ``n_salts`` sub-keys and the right side replicated to match.

    ``salt_src``: left column whose hash picks the salt (defaults to
    the key itself via spark_partition_id-free row hash — pass a
    high-cardinality column for real spreading).
    """
    src = salt_src or key
    salted_l = left.withColumn(
        "__salt", F.pmod(F.hash(F.col(src)), F.lit(n_salts))
    )
    salted_r = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")
