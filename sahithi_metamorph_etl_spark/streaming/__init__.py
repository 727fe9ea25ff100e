from .events import (
    events_stream,
    hourly_tumbling_stream,
    sessionized_stream,
    run_stream_to_memory,
)

__all__ = [
    "events_stream",
    "hourly_tumbling_stream",
    "sessionized_stream",
    "run_stream_to_memory",
]
