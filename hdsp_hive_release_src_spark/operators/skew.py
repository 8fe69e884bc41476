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

    ``salt_src``: left column whose hash picks the salt. Default is a
    hash over the WHOLE left row — a per-row value, so every row of a
    hot key lands in its own pseudo-random bucket (hashing the key
    itself would give all rows of the hot key the SAME salt: zero
    spreading, pure replication cost). Deterministic: the salt is a
    pure function of row content, so retries and reruns reproduce the
    same partitioning (no rand()).
    """
    if salt_src is not None:
        salt_expr = F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts))
    else:
        salt_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
        )
    salted_l = left.withColumn("__salt", salt_expr)
    salted_r = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")
