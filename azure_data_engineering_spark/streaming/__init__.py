from azure_data_engineering_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
    stream_dedup,
    run_stream_to_table,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stream_dedup",
    "run_stream_to_table",
]
