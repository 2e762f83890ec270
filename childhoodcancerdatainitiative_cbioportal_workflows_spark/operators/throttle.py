"""Greedy per-key event throttling (rate limiting / alert de-duplication).

Keep an event iff its timestamp is at least ``gap`` seconds after the
PREVIOUSLY KEPT event of the same key — the alert-dedup / notification
rate-limit semantics. This is deliberately NOT the session/quiet-period
debounce (``streaming/events.sessionize`` covers that): which events
survive depends on which earlier events survived, a per-key sequential
fold that no window function expresses (``lag`` sees the previous ROW,
not the previous KEPT row).

It is therefore the package's canonical LEGITIMATE Pandas-UDF use: a
PARTITION fold over ``mapInPandas`` — hash-repartition on the key, sort
within partitions on (key, ts, tiebreak), then fold whole Arrow batches
with a cursor of (current key, last kept timestamp) that carries across
batch boundaries. Per-key ``applyInPandas`` computed the same thing
10x slower (r10 probe: 4.8s -> 0.46s on 100k events / 1.5k keys,
identical output): one pandas object PER KEY is pure Python overhead
when keys are small, while the partition fold streams every key in a
task through one numpy pass. Scale shape: the SAME single shuffle on
the key (repartition vs applyInPandas' grouping exchange), per-key
state is one timestamp, and within a key the fold JUMPS between kept
events with searchsorted — cost is O(kept · log events) per key, not
O(events), so an aggressive gap gets cheaper, not slower. The DuckDB
oracle replays the identical fold as a linear recursive CTE —
certifying a genuinely iterative, non-window semantics (the
bpe_merges / pagerank discipline applied to Pandas-UDF code).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def _key_eq(a: object, b: object) -> bool:
    """NULL-safe scalar key equality for the cross-batch cursor: two keys
    match iff both are NA (None/NaN/NaT — ``NaN != NaN`` would fragment a
    nullable-numeric NULL group into per-row groups) or compare equal."""
    import pandas as pd

    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return bool(a == b)


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
    every key is always kept. ``gap_seconds <= 0`` keeps every event
    (t - last >= gap is then always true — and the searchsorted jump
    below would not advance)."""
    import numpy as np
    import pandas as pd  # noqa: F401 — Arrow batch interface

    cols = df.columns
    gap_ns = int(round(gap_seconds * 1_000_000_000))
    if gap_ns <= 0:
        return df

    def fold(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # Cursor state carried across Arrow batches. ``have_key`` is an
        # explicit first-group flag: a ``cur_key = None`` sentinel would
        # collide with a genuine NULL key (None == the initial sentinel,
        # so the NULL group's first event would ride a stale ``last``).
        have_key = False
        cur_key: object = None
        last = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ts = (
                pdf[ts_col].astype("datetime64[ns]").astype("int64").to_numpy()
            )
            keys = pdf[key_col].to_numpy()
            # Group boundaries via factorize, which folds every NA into
            # one code (numpy ``!=`` on a float/NaT column fragments the
            # NULL group: NaN != NaN row-by-row).
            codes = pd.factorize(pdf[key_col], use_na_sentinel=False)[0]
            keep = np.zeros(n, dtype=bool)
            starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
            ends = np.r_[starts[1:], n]
            for s, e in zip(starts, ends):
                if not have_key or not _key_eq(keys[s], cur_key):
                    # new key: first event always kept
                    have_key = True
                    cur_key = keys[s]
                    keep[s] = True
                    last = ts[s]
                    s += 1
                # jump straight to the next keeper: first ts >= last+gap
                # (a key split across Arrow batches resumes here with the
                # carried cursor — sortWithinPartitions guarantees the
                # later batch holds the later timestamps)
                while True:
                    j = s + int(
                        np.searchsorted(ts[s:e], last + gap_ns, "left")
                    )
                    if j >= e:
                        break
                    keep[j] = True
                    last = ts[j]
                    s = j
            yield pdf.loc[keep, cols]

    return (
        df.repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, tiebreak_col)
        .mapInPandas(fold, df.schema)
    )


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
    ``source_cte`` must yield the throttle's input rows. The key join is
    NULL-safe (``IS NOT DISTINCT FROM``) so a NULL-key group throttles as
    one group, matching the engine fold.

    SF envelope: the recursive CTE's iteration count is the MAX rows per
    key, and every iteration rescans the ordered set — fine at sf0.1
    (~70 events/user, the largest shipped testdata) but quadratic-ish at
    sf1+. If a larger SF ever ships, precompute per-key keep-flags with a
    bounded unroll or cap the face's input window; the Spark side needs
    no change (the partition fold is O(kept·log events) per key)."""
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
    ON o.{key_col} IS NOT DISTINCT FROM k.{key_col} AND o._rn = k._rn + 1
)
SELECT {out_cols} FROM keep WHERE _kept
"""
