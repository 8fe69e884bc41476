"""Shingling, MinHash, and LSH banding expressions.

MinHash/SimHash values are engine-hash-defined (xxhash64) — queries
built on them are rows-only checked (SURVEY.md §2.4) but their
*candidate pairs are always verified with exact measures* (Jaccard /
hamming), so a hash-family change can only affect recall, never emit a
false positive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a whitespace-tokenized text
    column (referenced by name).

    Guarded for short docs: Spark's sequence(0, k) with k<0 generates a
    *descending* sequence, so size < n must short-circuit to array().
    """
    w = f"split({text_col}, ' ')"
    gram = "concat_ws(' ', " + ", ".join(f"{w}[i + {j}]" for j in range(n)) + ")"
    return F.expr(
        f"CASE WHEN size({w}) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size({w}) - {n}), "
        f"i -> {gram})) END"
    )


def minhash_signature(shingles_col: str, k: int = 64) -> Column:
    """K-permutation MinHash signature: per seed, min xxhash64 over the
    shingle set (column referenced by name). Array-fold form — no
    explode, no shuffle.

    Built as SQL expr strings: the Python-lambda HOF form
    ``transform(c, lambda s: xxhash64(s, lit(i)))`` silently collapses
    all k variants into one expression (PySpark lambda-variable
    aliasing) — every signature slot came out identical, which cost an
    LSH recall bug. Seeds must live in the SQL text.
    """
    return F.array(
        *[
            F.expr(
                f"array_min(transform({shingles_col}, "
                f"s -> xxhash64(s, {i})))"
            )
            for i in range(k)
        ]
    )


def band_hashes(signature: Column, bands: int, rows: int) -> Column:
    """LSH banding: hash each contiguous ``rows``-slice of the signature;
    docs sharing any band hash become candidates."""
    return F.array(
        *[
            F.hash(F.slice(signature, b * rows + 1, rows))
            for b in range(bands)
        ]
    )
