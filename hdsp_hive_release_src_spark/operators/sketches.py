"""Two-pass exact heavy hitters (distributed Misra-Gries).

The 100 TB frequent-items problem: "which tokens exceed ε of the
corpus" cannot afford a full-vocabulary groupBy (the shuffle carries
every distinct token — at web scale, billions of keys for an answer
of a few hundred). The classical fix (Misra & Gries 1982, the
summary-merge form of Agarwal et al. 2013):

  pass 1 — each partition maintains a k=⌈1/ε⌉-counter Misra-Gries
  summary (O(k) memory, one sequential scan, no shuffle). Pigeonhole
  guarantee: any item with GLOBAL frequency > εN has local frequency
  > εn_p in at least one partition, and an MG summary of capacity k
  under-counts by at most n_p/(k+1) ≤ εn_p — so the union of
  per-partition candidates is a SUPERSET of every true heavy hitter
  (property-tested under adversarial partitionings).

  pass 2 — the candidate set (≤ k per partition, broadcastable by
  construction) semi-joins the corpus and is counted EXACTLY; the
  > εN filter then yields the exact answer. The shuffle carries only
  candidate tokens, never the vocabulary.

Result: exact output, partition-layout independent, two scans, O(k)
state per task — vs one scan + a vocabulary-sized shuffle for the
naive groupBy. mapInPandas is the right tool here (genuinely
per-partition imperative state); the inner loop is vectorized via
pandas value_counts + summary merge, not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(summary: dict[str, int], batch: pd.Series, k: int) -> None:
    """Merge a batch's exact counts into the MG summary in place,
    keeping ≤ k counters (the summary-merge MG variant: add, then
    subtract the (k+1)-th largest count from everyone and drop ≤0)."""
    for item, cnt in batch.items():
        summary[item] = summary.get(item, 0) + int(cnt)
    if len(summary) > k:
        cut = sorted(summary.values(), reverse=True)[k]
        for item in [i for i, c in summary.items() if c - cut <= 0]:
            del summary[item]
        for item in summary:
            summary[item] -= cut


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate items (pass 1)."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict[str, int] = {}
        for pdf in batches:
            _mg_merge(summary, pdf[col].value_counts(), k)
        yield pd.DataFrame({"item": list(summary.keys())})

    return df.mapInPandas(part, "item string")


def heavy_hitters(
    df: DataFrame, col: str, den: int
) -> DataFrame:
    """Exact items with frequency > N / den (ε = 1/den), two-pass MG
    (see module docstring). The threshold is an exact RATIONAL — the
    filter runs as integer arithmetic (n * den > N) so a float ε·N
    within an ulp of an integer can never flip the boundary item.
    Returns (item, n, frac): n exact, frac = n/N rounded to 6 (one
    int/int division, no accumulation-order hazard).

    Null rows are excluded up front: value_counts drops them in pass 1
    and the equality join can't match them in pass 2, so leaving them
    in N would both dilute every item's threshold and silently skip a
    null "value" that exceeds eps*N. The input column is also aliased
    to a reserved name so a source column literally named 'item'/'n'
    can't collide with the sketch's internals."""
    k = den + 1
    vals = df.where(F.col(col).isNotNull()).select(
        F.col(col).alias("__hh_val")
    )
    cand = mg_candidates(vals, "__hh_val", k).distinct()
    # r12 scan-count fix: the denominator used to be its own third
    # pass over the input (pass-1 summary + candidate recount + N).
    # The recount is now a broadcast LEFT join — non-candidates fall
    # into one NULL group — so a single pass yields both the exact
    # candidate counts and, by summing the ≤ den+2 group rows, the
    # exact total. The tiny grouped table is checkpointed because it
    # feeds both the total and the threshold filter.
    counts = (
        vals.join(
            F.broadcast(cand), F.col("__hh_val") == F.col("item"), "left"
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("n").alias("_n"))
    return (
        counts.where(F.col("item").isNotNull())
        .join(F.broadcast(total))
        .where(F.col("n") * den > F.col("_n"))
        .select(
            F.col("item"),
            F.col("n"),
            F.round(F.col("n") / F.col("_n"), 6).alias("frac"),
        )
    )
