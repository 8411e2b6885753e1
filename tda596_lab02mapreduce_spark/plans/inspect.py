"""Physical-plan inspection helpers — the 'would this survive 100×'
review loop (.explain-driven), made assertable so plan regressions
fail tests instead of silently shipping slow plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Formatted plan AFTER execution — with AQE on, codegen spans and
    runtime-chosen join strategies only appear in the final plan.
    collect() (not a noop write, which builds its own QueryExecution)
    finalizes the DataFrame's own plan."""
    df.collect()
    return formatted_plan(df)


def has_operator(df: DataFrame, op_regex: str) -> bool:
    return re.search(op_regex, formatted_plan(df)) is not None


def has_broadcast_join(df: DataFrame) -> bool:
    return has_operator(df, r"Broadcast(Hash|NestedLoop)Join")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan (empty string
    → nothing pushed down: usually a bug for filtered parquet scans)."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def final_plan(df: DataFrame) -> str:
    """The Final-Plan tree of an executed adaptive plan (the Initial
    Plan section repeats every operator and breaks naive counting)."""
    plan = executed_plan(df)
    return plan.split("+- == Initial Plan ==")[0]


def count_nodes(plan: str, op: str) -> int:
    """Occurrences of operator ``op`` as tree nodes (``Op (n)``) in a
    formatted/final plan string — immune to the detail section and to
    substring collisions like Exchange vs BroadcastExchange."""
    return len(re.findall(rf"(?<![\w]){op}\b[^\n(]*\(\d+\)", plan))
