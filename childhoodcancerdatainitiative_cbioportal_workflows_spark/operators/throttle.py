"""Greedy per-key event throttling (rate limiting / alert de-duplication).

Keep an event iff its timestamp is at least ``gap`` seconds after the
PREVIOUSLY KEPT event of the same key — the alert-dedup / notification
rate-limit semantics. This is deliberately NOT the session/quiet-period
debounce (``streaming/events.sessionize`` covers that): which events
survive depends on which earlier events survived, a per-key sequential
fold that no window function expresses (``lag`` sees the previous ROW,
not the previous KEPT row).

It is therefore the package's canonical LEGITIMATE ``applyInPandas`` use:
an Arrow-batched per-key fold (numpy scan, one pass, no Python per-row
work in the driver), grouped on the key so each task folds only its own
keys. Scale shape: one shuffle on the key; per-key state is a single
timestamp; memory is bounded by the largest single key's events (the same
bound any per-key window already pays). The DuckDB oracle replays the
identical fold as a linear recursive CTE — certifying a genuinely
iterative, non-window semantics (the bpe_merges / pagerank discipline
applied to Pandas-UDF code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def throttle_events(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_col: str,
) -> DataFrame:
    """Rows of ``df`` surviving the greedy throttle, original schema.

    Per key, events are ordered by (``ts_col``, ``tiebreak_col``) — the
    tiebreak makes equal-timestamp order deterministic — and an event is
    kept iff ``ts >= last_kept_ts + gap_seconds``. The first event of
    every key is always kept."""
    import pandas as pd  # noqa: F401 — Arrow batch interface

    cols = df.columns
    gap_ns = int(round(gap_seconds * 1_000_000_000))

    def fold(pdf):
        pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
        ts = pdf[ts_col].astype("datetime64[ns]").astype("int64").to_numpy()
        keep = [False] * len(ts)
        last = None
        for i, t in enumerate(ts):
            if last is None or t - last >= gap_ns:
                keep[i] = True
                last = t
        return pdf.loc[keep, cols]

    return df.groupBy(key_col).applyInPandas(fold, df.schema)


def throttle_events_sql(
    source_cte: str,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
    out_cols: str,
) -> str:
    """DuckDB oracle for :func:`throttle_events`: the same greedy fold as
    a linear recursive CTE stepping one row per key per iteration.
    ``source_cte`` must yield the throttle's input rows."""
    return f"""
WITH RECURSIVE src AS ({source_cte}), ordered AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col}
  ) AS _rn
  FROM src
), keep AS (
  SELECT *, {ts_col} AS _kept_ts, TRUE AS _kept
  FROM ordered WHERE _rn = 1
  UNION ALL
  SELECT o.*,
         CASE WHEN o.{ts_col} >= k._kept_ts + INTERVAL {gap_seconds} SECOND
              THEN o.{ts_col} ELSE k._kept_ts END,
         o.{ts_col} >= k._kept_ts + INTERVAL {gap_seconds} SECOND
  FROM ordered o JOIN keep k
    ON o.{key_col} = k.{key_col} AND o._rn = k._rn + 1
)
SELECT {out_cols} FROM keep WHERE _kept
"""
