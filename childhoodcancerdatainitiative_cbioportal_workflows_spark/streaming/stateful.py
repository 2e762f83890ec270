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


THROTTLE_STATE_SCHEMA = T.StructType(
    [T.StructField("last_kept_ts", T.TimestampType())]
)

THROTTLE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def throttle_stream(
    events: DataFrame,
    gap_seconds: float,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming face of ``operators/throttle.throttle_events``: keep an
    event iff it is >= ``gap_seconds`` after the previously KEPT event of
    its key — the greedy alert-dedup fold, with the per-key state being
    exactly ONE timestamp. For event streams arriving in event-time order
    per key (per-batch rows are sorted; cross-batch order is the source's
    contract), the kept set is identical to the batch operator on the
    same data — pinned in tests/test_streaming.py.

    Bounded state: once the watermark passes last_kept + gap, every
    non-late future event trivially passes the gap check, so the key's
    state is expired via an event-time timeout (the epoch-0 first-batch
    guard as in :func:`running_user_totals`). Rows older than the
    watermark follow the standard watermark contract: after expiry a
    too-late event may be kept that a batch replay would throttle."""
    import pandas as pd

    gap_ns = int(round(gap_seconds * 1_000_000_000))
    gap_ms = int(round(gap_seconds * 1_000))

    src = events.withWatermark("ts", watermark) if events.isStreaming else events

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        last_ns = None if last is None else pd.Timestamp(last).value
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
            for eid, t, t_ns in zip(pdf["event_id"], pdf["ts"], ts_ns):
                if last_ns is None or t_ns - last_ns >= gap_ns:
                    out.append(
                        {"user_id": user_id, "event_id": eid, "ts": t}
                    )
                    last_ns = int(t_ns)
        if last_ns is not None:
            state.update((pd.Timestamp(last_ns),))
            state.setTimeoutTimestamp(
                max(
                    last_ns // 1_000_000 + gap_ms,
                    state.getCurrentWatermarkMs() + 1_000,
                )
            )
        if out:
            yield pd.DataFrame(out)

    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
