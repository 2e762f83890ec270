from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    dedup_stream,
    enrich_stream,
    read_event_stream,
    upsert_to_parquet,
    windowed_event_counts,
    sessionize,
)
from .stateful import running_user_totals  # noqa: F401
