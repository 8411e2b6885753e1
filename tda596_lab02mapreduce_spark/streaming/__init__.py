from tda596_lab02mapreduce_spark.streaming.windows import (
    events_stream,
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

__all__ = [
    "events_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_dedup",
]
