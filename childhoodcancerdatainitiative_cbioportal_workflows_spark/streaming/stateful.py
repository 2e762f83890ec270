"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windows/sessions cover the reference-shaped aggregations; this
is the escape hatch for semantics they can't express — here, a per-user
running profile (event count, value total, last-seen) that emits an updated
row per user per micro-batch and expires idle users via an EVENT-TIME
timeout tied to the watermark (bounded state).

Environment note: ``GroupStateTimeout.ProcessingTimeTimeout`` hangs
micro-batches on this Spark 4.1 build (observed; event-time timeouts work),
so idle expiry is watermark-based — which is also the more principled choice
for replayable event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def running_user_totals(
    events: DataFrame,
    watermark: str = "1 hour",
    idle_gap_ms: int = 3_600_000,
) -> DataFrame:
    """Per-user running totals across micro-batches.

    State: (n_events, total_value, last_ts) per user_id; one updated row is
    emitted for each user seen in a batch. A user idle past
    watermark + ``idle_gap_ms`` is expired from the state store, emitting a
    final row. Batch DataFrames work too (single-group pass, no state)."""
    import pandas as pd

    src = events.withWatermark("ts", watermark) if events.isStreaming else events

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total, "last_ts": last}]
            )
            return
        n, total, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last = batch_max if last is None or batch_max > last else last
        state.update((n, total, last))
        # expire at LAST-EVENT time + gap, not current-watermark + gap: in
        # the first batch the watermark is still epoch 0, and a
        # watermark-anchored timeout would fire for every key as soon as the
        # watermark jumps to real event time (state wiped, duplicate finals)
        last_ms = int(last.value // 1_000_000) if last is not None else 0
        state.setTimeoutTimestamp(
            max(last_ms + idle_gap_ms, state.getCurrentWatermarkMs() + 1_000)
        )
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total, "last_ts": last}]
        )

    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
