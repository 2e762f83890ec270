"""Time-series resampling with last-observation-carried-forward (LOCF).

The hypertable-rollup / gap-fill shape: regularize an irregular event
stream onto a fixed-width time grid, carrying the most recent observation
forward into empty buckets. No reference analogue (the reference is
batch-file ETL), but any events-table consumer needs it, and it reuses the
as-of carry machinery (:mod:`.asof`): union the grid with the events and
run ONE ``last(ignorenulls)`` window per key.

Scale shape: the grid is generated per key from that key's own [min, max]
bucket bounds — a tiny aggregate then a narrow ``sequence``+``explode``
(no driver-side calendar, no cross join against a global grid). The union
shuffles once on the key; window state is O(1) per row. Grid width is the
caller's lever: rows out = sum over keys of span/step.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def resample_locf(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_col: str,
    step: str = "1 hour",
    unit: str = "hour",
    tiebreak: str | None = None,
    out_bucket: str = "bucket",
    out_value: str = "locf_value",
) -> DataFrame:
    """One row per (key, ``unit`` bucket) from each key's first to last
    event, carrying the last ``value_col`` at-or-before the bucket
    instant (null until the key's first event). Among same-timestamp
    events the greatest ``tiebreak`` wins (pinned, like asof_join)."""
    keys = list(keys)
    bounds = df.groupBy(*keys).agg(
        F.date_trunc(unit, F.min(ts)).alias("_t0"),
        F.date_trunc(unit, F.max(ts)).alias("_t1"),
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"interval {step}"))
        ).alias("_tick"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(df.schema[value_col].dataType).alias("_val"),
        F.lit(None).cast(df.schema[tiebreak].dataType if tiebreak else "int").alias(
            "_tie"
        ),
    )
    ev = df.select(
        *keys,
        F.col(ts).alias("_tick"),
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_val"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tie"),
    )
    u = ev.unionByName(grid)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_tick").asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_locf", F.last("_val", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            *keys,
            F.col("_tick").alias(out_bucket),
            F.col("_locf").alias(out_value),
        )
    )
