from tda596_lab02mapreduce_spark.plans.inspect import (
    count_nodes,
    executed_plan,
    final_plan,
    formatted_plan,
    has_broadcast_join,
    has_operator,
    partitionless_window_count,
    pushed_filters,
)

__all__ = [
    "count_nodes",
    "executed_plan",
    "final_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_operator",
    "partitionless_window_count",
    "pushed_filters",
]
