"""As-of (time-travel) join.

The reference has no as-of join — its closest shape is the point-lookup
VAF join (pedmatch-clinical-vcf-workflow.py:673-699, "first match wins") —
but any event-enrichment pipeline over the ``events`` table needs one:
"for each fact row, the most recent reference row at or before its
timestamp, per key".

Scale design (the part that matters at 100 TB):

* NOT a range join. The naive formulation ``l JOIN r ON l.key = r.key AND
  r.ts <= l.ts`` explodes to O(|l| x |r|/keys) rows before the per-row
  argmax; on a 1000-executor cluster that is the whole job.
* Instead: tag both sides, ``unionByName``, one shuffle on the join key,
  and a single running ``last(..., ignorenulls=True)`` window per key.
  Each right row's payload is carried forward to the left rows that
  follow it in (ts, side) order — O(n log n) per key partition, one
  exchange total, no replication, and AQE's skew split still applies
  because the exchange is a plain hash repartition on the key.
* Determinism: among right rows sharing (key, ts), the one with the
  greatest ``tiebreak`` wins (the window order makes it the last seen);
  pandas ``merge_asof`` leaves this unspecified, we pin it so results are
  stable under any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"
_TIE = "_asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    allow_exact_matches: bool = True,
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: attach ``right_cols`` (and the matched ``ts``)
    of the most recent ``right`` row with the same ``on`` keys and
    ``right.ts <= left.ts`` (strict ``<`` when ``allow_exact_matches``
    is False). Unmatched left rows keep null enrichment columns.

    ``tolerance_seconds`` nulls out matches older than the window, like
    pandas ``merge_asof(tolerance=...)``.
    """
    on = list(on)
    right_cols = list(right_cols)
    # The payload rides as ONE struct so all enrichment columns always come
    # from the same right row (per-column last(ignorenulls) could otherwise
    # mix rows when a payload field is null).
    payload = F.struct(
        F.col(ts).alias(ts), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts).alias(ts),
        F.lit(0).alias(_SIDE),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(_TIE),
        payload.alias("_asof_payload"),
    )
    left_out = [c for c in left.columns]
    l = left.select(
        *left_out,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_TIE].dataType).alias(_TIE),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # inclusive: right rows sort before left rows at equal ts (side 0 < 1)
    # strict:    left rows sort before right rows at equal ts
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), side_order, F.col(_TIE).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = u.select(
        *u.columns,
        F.last(F.col("_asof_payload"), ignorenulls=True).over(w).alias("_carry"),
    )
    carried = [f"{prefix}{ts}"] + [f"{prefix}{c}" for c in right_cols]
    out = enriched.filter(F.col(_SIDE) == 1).select(
        *left_out,
        F.col(f"_carry.{ts}").alias(f"{prefix}{ts}"),
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    if tolerance_seconds is not None:
        # materialize the flag BEFORE nulling: the first carried column is
        # the matched ts itself, and a per-column rewrite would evaluate
        # later columns' staleness against the already-nulled ts
        # double cast: TIMESTAMP_NTZ (nanos parquet sources) cannot cast
        # to long directly; ts -> timestamp -> epoch seconds works for both
        stale = (
            F.col(ts).cast("timestamp").cast("long")
            - F.col(f"{prefix}{ts}").cast("timestamp").cast("long")
        ) > F.lit(tolerance_seconds)
        out = out.select(
            *left_out,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in carried
            ],
        )
    return out
