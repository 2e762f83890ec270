"""Sketch aggregations — sublinear-state profiling at corpus scale.

Exact ``COUNT(DISTINCT)`` and exact percentiles shuffle every distinct
value; at 100 TB the profile queries that drive pipeline decisions (how
many users? what's the p99 document length?) should run on sketches:
HyperLogLog++ (``approx_count_distinct``, ~2% default error, KB of state)
and the Greenwald-Khanna/KLL-style ``percentile_approx``. Both are
mergeable partial aggregates — map-side combine works, the shuffle
carries one sketch per group, not the data.

These are library faces (tested against exact answers with the
documented error bounds) rather than oracle-registered queries: sketch
internals are engine-specific, so cross-engine hash equality is the
wrong contract for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_profile(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    value_col: str,
    rsd: float = 0.02,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group sketch profile: HLL++ distinct count of ``distinct_col``
    (relative std dev ``rsd``) and approximate ``percentiles`` of
    ``value_col`` (rank error ~1/accuracy). One aggregation, sketch-sized
    shuffle."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.percentile_approx(
            value_col, list(percentiles), accuracy
        ).alias("approx_percentiles"),
    )
