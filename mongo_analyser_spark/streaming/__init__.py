from mongo_analyser_spark.streaming.windows import (
    dedup_first_per_key,
    session_stats,
    sliding_counts,
    stream_events,
    streaming_dedup,
    tumbling_counts,
    with_late_data_policy,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "stream_events",
    "streaming_dedup",
    "dedup_first_per_key",
    "with_late_data_policy",
]
