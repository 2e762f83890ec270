"""Incremental aggregate maintenance (materialized-view refresh).

At 100 TB you never re-aggregate the whole fact table because a day of
rows arrived: you keep the aggregate's MERGEABLE PARTIAL STATE (sums,
counts, mins, maxes — never averages) and fold each delta's partial
state into it. This module is that fold: combine an existing partial-
state frame with a raw delta in one pass, recompute derived measures
(avg = sum/count) only at read time.

The registered face certifies the algebra end-to-end: base partial state
from the cold partition + delta rows folded in must equal the full
recompute (the DuckDB oracle) bit-for-bit — sums ride DECIMAL(18,4) so
the fold is order-free (the _dsum discipline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: fn name -> (first-pass agg, combine agg) — the mergeable aggregates
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_agg_state(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """First-pass partial state: ``aggs`` is output_col -> (input_col,
    fn) with fn in sum/count/min/max. This is what a 100 TB pipeline
    PERSISTS per partition instead of final measures."""
    return df.groupBy(*keys).agg(
        *[_MERGEABLE[fn][0](c).alias(out) for out, (c, fn) in aggs.items()]
    )


def merge_partial_aggs(
    base_state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold raw ``delta`` rows into an existing ``base_state`` (produced
    by :func:`partial_agg_state` with the same spec): one partial agg
    over the delta, one union, one combine — the delta-sized work of an
    incremental refresh, never a re-scan of the base."""
    delta_state = partial_agg_state(delta, keys, aggs)
    both = base_state.unionByName(delta_state, allowMissingColumns=False)
    return both.groupBy(*keys).agg(
        *[_MERGEABLE[fn][1](out).alias(out) for out, (c, fn) in aggs.items()]
    )
