from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    UPSERT_BUCKET_COL,
    dedup_stream,
    enrich_stream,
    merge_provider,
    parse_kafka_events,
    read_event_stream,
    read_kafka_event_stream,
    read_rate_stream,
    upsert_sink,
    upsert_to_parquet,
    compact_upsert_store,
    windowed_event_counts,
    sessionize,
    trending_sink,
)
from .joins import interval_join_streams  # noqa: F401
from .stateful import running_user_totals, throttle_stream  # noqa: F401
from .corpus import (  # noqa: F401
    DOCS_SCHEMA,
    incremental_dedup_stream,
    incremental_minhash_sink,
    read_document_stream,
)
from .decay import decayed_trending_sink  # noqa: F401
