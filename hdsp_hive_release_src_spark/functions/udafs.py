"""Vectorized user-defined aggregates (pandas grouped-agg UDFs).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the UDF kind (scalar vs grouped-agg) from the REAL
type hints (Series -> scalar = grouped agg); postponed annotations
would turn them into strings and break the inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Geometric mean = exp(mean(ln x)) — an order-insensitive,
    partially-aggregatable statistic (Arrow batch in, one scalar out
    per group)."""
    return float(np.exp(np.log(v.to_numpy()).mean()))
