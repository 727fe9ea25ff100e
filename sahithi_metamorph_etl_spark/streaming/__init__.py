from .events import (
    events_stream,
    hourly_tumbling_stream,
    sessionized_stream,
    run_stream_to_memory,
)
from .neardup import neardup_ingest_stream

__all__ = [
    "events_stream",
    "hourly_tumbling_stream",
    "sessionized_stream",
    "run_stream_to_memory",
    "neardup_ingest_stream",
]
