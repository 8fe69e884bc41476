"""Automatic materialized-view query rewrite (the Hive
``hive.materializedview.rewriting`` feature, re-expressed).

Spark has no built-in MV rewrite, so this layer supplies the missing
piece: callers ask for an AGGREGATION OVER THE BASE TABLE and the
resolver transparently answers it from a registered MV when one
covers the request, falling back to the base scan otherwise. The
caller never names the MV — that is what makes it a rewrite rather
than the manual MV reuse `materialized_view_rewrite` demonstrates.

Coverage rule (classic rollup containment): an MV over base B with
grouping columns G and re-aggregable measures (SUM partials + a row
COUNT) answers any request over B whose group-by keys are either
members of G or functional rollups of a member (e.g. quarter =
date_trunc over an MV month column) and whose measures derive from
the stored partials: sum → SUM(sum), count → SUM(count),
avg → SUM(sum)/SUM(count). Among matching MVs the one with the
fewest grouping columns (coarsest, hence smallest) wins. This is the
same containment check Hive/Calcite applies for aggregate rewrites —
restricted to rollup-of-grouping-column derivations, the case that
covers the standard time-hierarchy workloads.

At 100 TB the rewrite is the difference between scanning the fact
table and scanning a table ~|G₁×G₂| rows big; the fallback path keeps
wrong-guess requests correct, just unaccelerated.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MvDef:
    """A registered MV: ``table`` holds one row per G-tuple with SUM
    partial columns (``sums``: measure source expr name → stored sum
    column) and a stored row-count column ``count_col``.

    ``measure_counts`` maps a measure source to its stored NON-NULL
    count column — required for avg derivation: SUM(sum)/SUM(n_rows)
    diverges from true AVG whenever the measure has NULLs (SUM skips
    them, the row count doesn't), so an avg request is only covered
    when the MV stored COUNT(measure) partials."""

    table: str
    base: str
    group_cols: tuple[str, ...]
    sums: dict[str, str] = field(default_factory=dict)
    count_col: str = "n_rows"
    measure_counts: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class GroupKey:
    """A requested group-by key. ``src`` names the MV grouping column
    the key derives from; ``fn`` (Column -> Column) is an optional
    functional rollup applied to it. ``base_src``/``base_fn`` spell
    the SAME key in base-table terms for the fallback path (e.g.
    quarter = date_trunc(quarter, month-col) on the MV but
    date_trunc(quarter, l_shipdate) on the base); they default to the
    MV spelling for plain shared columns."""

    alias: str
    src: str
    fn: object | None = None  # Callable[[Column], Column]
    base_src: str | None = None
    base_fn: object | None = None

    def expr(self) -> Column:
        c = F.col(self.src)
        return (self.fn(c) if self.fn else c).alias(self.alias)

    def base_expr(self) -> Column:
        c = F.col(self.base_src or self.src)
        fn = self.base_fn or (self.fn if self.base_src is None else None)
        return (fn(c) if fn else c).alias(self.alias)


@dataclass(frozen=True)
class Measure:
    """kind: 'sum' | 'count' | 'avg'; src names the base measure expr
    registered in the MV's ``sums`` (ignored for count)."""

    alias: str
    kind: str
    src: str = ""


class MvResolver:
    def __init__(self) -> None:
        self._mvs: list[MvDef] = []

    def register(self, mv: MvDef) -> None:
        self._mvs.append(mv)

    def _covers(self, mv: MvDef, base: str, keys: list[GroupKey],
                measures: list[Measure]) -> bool:
        if mv.base != base:
            return False
        if not all(k.src in mv.group_cols for k in keys):
            return False
        for m in measures:
            if m.kind in ("sum", "avg") and m.src not in mv.sums:
                return False
            if m.kind == "avg" and m.src not in mv.measure_counts:
                return False  # see MvDef.measure_counts — NULL safety
        return True

    def answer(
        self,
        spark: SparkSession,
        base_df: DataFrame,
        base: str,
        keys: list[GroupKey],
        measures: list[Measure],
        base_measure_exprs: dict[str, Column],
    ) -> tuple[DataFrame, str | None]:
        """Return (result, mv_table_used | None). The base fallback
        computes measures from ``base_measure_exprs`` (src → Column)."""
        matches = [
            mv
            for mv in self._mvs
            if self._covers(mv, base, keys, measures)
        ]
        if matches:
            mv = min(matches, key=lambda m: len(m.group_cols))
            t = spark.table(mv.table)
            aggs = []
            for m in measures:
                if m.kind == "sum":
                    aggs.append(F.sum(mv.sums[m.src]).alias(m.alias))
                elif m.kind == "count":
                    aggs.append(F.sum(mv.count_col).alias(m.alias))
                else:  # avg = SUM(partial sums) / SUM(non-null counts)
                    aggs.append(
                        (
                            F.sum(mv.sums[m.src])
                            / F.sum(mv.measure_counts[m.src])
                        ).alias(m.alias)
                    )
            out = t.groupBy(*[k.expr() for k in keys]).agg(*aggs)
            return out, mv.table
        aggs = []
        for m in measures:
            if m.kind == "sum":
                aggs.append(
                    F.sum(base_measure_exprs[m.src]).alias(m.alias)
                )
            elif m.kind == "count":
                aggs.append(F.count(F.lit(1)).alias(m.alias))
            else:
                aggs.append(
                    F.avg(base_measure_exprs[m.src]).alias(m.alias)
                )
        out = base_df.groupBy(*[k.base_expr() for k in keys]).agg(*aggs)
        return out, None
