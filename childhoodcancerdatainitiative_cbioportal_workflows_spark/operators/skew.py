"""Skew-handling utilities.

AQE's skew-join split (on in ``core.session``) is the first line of defense;
these helpers cover the cases AQE cannot fix at 100 TB:

* :func:`salted_aggregate` — two-phase aggregation for hot grouping keys
  (one key holding a large fraction of all rows makes a single reducer the
  straggler; the salt spreads the partial aggregation, the second phase
  combines S partials per key instead of N rows).
* :func:`salted_join` — replicate the small side S times so the big side's
  hot keys spread over S reducers. For genomic interval joins prefer the
  binning in :mod:`.interval_join` (finer keys, no replication).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase agg: groupBy(keys + salt) partial, then groupBy(keys) final.

    ``aggs``: output_col -> (input_col, fn) where fn is one of
    sum/count/min/max (the re-combinable aggregates; avg callers derive
    sum/count themselves)."""
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[first[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[combiner[fn](out).alias(out) for out, (c, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``salt`` times — hot join keys spread across ``salt`` reducers. The
    small side must tolerate replication (dimension-sized)."""
    big_s = big.withColumn("_salt", (F.rand(seed=11) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
