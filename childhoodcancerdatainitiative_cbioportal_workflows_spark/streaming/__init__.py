from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    dedup_stream,
    read_event_stream,
    windowed_event_counts,
    sessionize,
)
from .stateful import running_user_totals  # noqa: F401
