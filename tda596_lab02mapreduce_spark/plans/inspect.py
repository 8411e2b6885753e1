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


def partitionless_window_count(df: DataFrame) -> int:
    """Number of WindowExec nodes with an EMPTY partition spec — the
    single-task global window Spark warns about ("No Partition Defined
    for Window operation").  Zero is the scale contract for any
    unbounded-grain input; bounded frames use functions.rank.
    small_df_rank / broadcast-total joins and so never count here.
    Parses the simple plan string: a Window node prints ``Window
    [exprs]<, [partSpec]><, [orderSpec]>`` with EMPTY specs omitted,
    so the node is partition-less iff it has fewer than 3 top-level
    bracket groups and the last group is not a pure partition spec
    (an order spec carries ASC/DESC markers; a partition spec never
    does)."""
    plan = str(df._jdf.queryExecution().executedPlan())  # type: ignore[attr-defined]
    n = 0
    for line in plan.splitlines():
        m = re.search(r"(?<![\w])Window (\[.*)$", line)
        if not m:
            continue
        depth, groups, cur = 0, [], ""
        for ch in m.group(1):
            if ch == "[":
                depth += 1
            cur += ch
            if ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur.strip())
                    cur = ""
        if len(groups) >= 3:
            continue  # partition spec + order spec both present
        if len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[1]):
            continue  # partitioned, unordered (full-frame marginal)
        n += 1
    return n


def count_nodes(plan: str, op: str) -> int:
    """Occurrences of operator ``op`` as tree nodes (``Op (n)``) in a
    formatted/final plan string — immune to the detail section and to
    substring collisions like Exchange vs BroadcastExchange."""
    return len(re.findall(rf"(?<![\w]){op}\b[^\n(]*\(\d+\)", plan))
