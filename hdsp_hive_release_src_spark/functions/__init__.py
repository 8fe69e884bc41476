"""Column-expression function library (SURVEY.md §2.4 support).

Everything here returns Catalyst Column expressions (JVM-side,
codegen-friendly) — no Python UDFs in any hot path.
"""

from hdsp_hive_release_src_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    to_double,
)
from hdsp_hive_release_src_spark.functions.hashing import (  # noqa: F401
    band_hashes,
    minhash_signature,
    word_shingles,
)
from hdsp_hive_release_src_spark.functions.text import (  # noqa: F401
    STOPWORDS_EN,
    tokens,
)
