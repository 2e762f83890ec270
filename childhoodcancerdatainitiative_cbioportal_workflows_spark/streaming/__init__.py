from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    read_event_stream,
    windowed_event_counts,
    sessionize,
)
