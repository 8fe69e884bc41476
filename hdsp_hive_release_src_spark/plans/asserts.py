"""Physical-plan introspection helpers.

Scale discipline (SURVEY.md §4) is enforced in tests with these: a
query that silently loses predicate pushdown, falls back to a cartesian
product, or shuffles a dimension table is a correctness-at-scale bug
even when the sf0.001 answer is right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    try:
        jdf = df._jdf  # classic: exact explain string via the JVM handle
    except AttributeError:
        # Spark Connect DataFrames carry no _jdf; capture the public
        # explain() output instead (same content, printed not returned)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of every scan in the plan."""
    plan = explain_str(df)
    return "\n".join(
        line for line in plan.splitlines() if "PushedFilters" in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_cartesian(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
