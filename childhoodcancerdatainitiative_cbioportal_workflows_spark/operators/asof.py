"""As-of (time-travel) join.

The reference has no as-of join — its closest shape is the point-lookup
VAF join (pedmatch-clinical-vcf-workflow.py:673-699, "first match wins") —
but any event-enrichment pipeline over the ``events`` table needs one:
"for each fact row, the most recent reference row at or before its
timestamp, per key". Directions follow pandas ``merge_asof``: backward
(default), forward, nearest.

Scale design (the part that matters at 100 TB):

* NOT a range join. The naive formulation ``l JOIN r ON l.key = r.key AND
  r.ts <= l.ts`` explodes to O(|l| x |r|/keys) rows before the per-row
  argmax; on a 1000-executor cluster that is the whole job.
* Instead: tag both sides, ``unionByName``, one shuffle on the join key,
  and a running ``last(..., ignorenulls=True)`` window per key. Each
  right row's payload is carried to the left rows that follow it in
  (ts, side) order — O(n log n) per key partition, one exchange total,
  no replication, and AQE's skew split still applies because the
  exchange is a plain hash repartition on the key. ``nearest`` adds the
  reversed-order window over the SAME exchange (a second local sort,
  not a second shuffle) and picks the closer candidate per row.
* Determinism: among right rows sharing (key, ts), the one with the
  greatest ``tiebreak`` wins backward, the smallest forward; pandas
  leaves this unspecified, we pin it so results are stable under any
  partitioning. ``nearest`` breaks equal-distance ties backward (the
  pandas convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_SIDE = "_asof_side"
_TIE = "_asof_tie"


def _micros(c: Column) -> Column:
    # microsecond-exact epoch: the events table carries sub-second
    # timestamps, so whole-second truncation could tie/invert nearest
    # distances and misjudge tolerance by up to ~1s (the same discipline
    # twap_daily uses). cast("timestamp") first so TIMESTAMP_NTZ sources
    # (nanos parquet) take the supported path.
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Attach ``right_cols`` (and the matched ``ts``) of the as-of
    ``right`` row with the same ``on`` keys: the most recent at-or-before
    (``backward``), the earliest at-or-after (``forward``), or whichever
    of the two is closer (``nearest``). Strict inequality when
    ``allow_exact_matches`` is False. Unmatched left rows keep null
    enrichment columns.

    ``tolerance_seconds`` nulls out matches farther than the window, like
    pandas ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
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

    def _window(backward: bool):
        # inclusive: right rows sort before left rows at equal ts;
        # strict: left rows sort before right rows at equal ts.
        # backward scans ts asc (max tiebreak wins at equal right ts);
        # forward scans ts desc (min tiebreak wins).
        if backward:
            ts_order = F.col(ts).asc()
            side_order = (
                F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
            )
            tie_order = F.col(_TIE).asc_nulls_first()
        else:
            ts_order = F.col(ts).desc()
            side_order = (
                F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
            )
            tie_order = F.col(_TIE).desc_nulls_first()
        return (
            Window.partitionBy(*on)
            .orderBy(ts_order, side_order, tie_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carries = []
    if direction in ("backward", "nearest"):
        carries.append(
            F.last(F.col("_asof_payload"), ignorenulls=True)
            .over(_window(backward=True))
            .alias("_carry_b")
        )
    if direction in ("forward", "nearest"):
        carries.append(
            F.last(F.col("_asof_payload"), ignorenulls=True)
            .over(_window(backward=False))
            .alias("_carry_f")
        )
    enriched = u.select(*u.columns, *carries).filter(F.col(_SIDE) == 1)

    if direction == "backward":
        chosen = F.col("_carry_b")
    elif direction == "forward":
        chosen = F.col("_carry_f")
    else:
        d_b = _micros(F.col(ts)) - _micros(F.col(f"_carry_b.{ts}"))
        d_f = _micros(F.col(f"_carry_f.{ts}")) - _micros(F.col(ts))
        # equal distance breaks backward (pandas nearest convention)
        chosen = (
            F.when(F.col("_carry_b").isNull(), F.col("_carry_f"))
            .when(F.col("_carry_f").isNull(), F.col("_carry_b"))
            .when(d_f < d_b, F.col("_carry_f"))
            .otherwise(F.col("_carry_b"))
        )
    enriched = enriched.withColumn("_carry", chosen)

    carried = [f"{prefix}{ts}"] + [f"{prefix}{c}" for c in right_cols]
    out = enriched.select(
        *left_out,
        F.col(f"_carry.{ts}").alias(f"{prefix}{ts}"),
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    if tolerance_seconds is not None:
        # materialize the flag BEFORE nulling: the first carried column is
        # the matched ts itself, and a per-column rewrite would evaluate
        # later columns' staleness against the already-nulled ts
        dist = F.abs(_micros(F.col(ts)) - _micros(F.col(f"{prefix}{ts}")))
        stale = dist > F.lit(int(tolerance_seconds * 1_000_000))
        out = out.select(
            *left_out,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in carried
            ],
        )
    return out
