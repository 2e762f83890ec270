"""Stream-stream joins with watermark-bounded state.

The canonical attribution shape: two live event streams (e.g. impressions
and conversions) joined on a key within an event-time bound. Spark buffers
both sides in state; WITHOUT both watermarks and a time-range condition
the state grows forever, so this module makes them mandatory — the
interval condition is what lets Spark evict a row once the other side's
watermark has passed its join horizon.

Works identically on batch DataFrames (backfill): the watermark becomes a
no-op and the same time-range predicate runs as a plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "15 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join rows sharing ``key`` where the right event lands in
    ``[left_ts, left_ts + within]`` — impressions→conversions attribution.

    State bound: each side is watermarked; the range predicate upper-bounds
    how long a buffered left row can still match, so total state is
    O(input rate x (watermark + within)), independent of stream lifetime.
    Outer variants (``how='leftOuter'``) emit the unmatched row only after
    the watermark passes — correct, late, and exactly once.

    Columns come back prefixed (``l_``/``r_``) so the two sides' identical
    event schemas stay distinguishable."""
    l_cols = [F.col(f"l.{c}").alias(f"{left_prefix}{c}") for c in left.columns]
    r_cols = [F.col(f"r.{c}").alias(f"{right_prefix}{c}") for c in right.columns]
    l = left
    r = right
    if left.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    l = l.alias("l")
    r = r.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"interval {within}")
        )
    )
    return l.join(r, cond, how).select(*l_cols, *r_cols)
