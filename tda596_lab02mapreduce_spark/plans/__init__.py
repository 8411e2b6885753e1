from tda596_lab02mapreduce_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_operator,
    pushed_filters,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_operator",
    "pushed_filters",
]
