from redshells_spark.streaming.events import (
    read_event_stream,
    windowed_event_counts,
    sessionize,
    streaming_click_counts,
)

__all__ = [
    "read_event_stream",
    "windowed_event_counts",
    "sessionize",
    "streaming_click_counts",
]
