"""Exact exponential-decay scoring (trending with a half-life), in
integer fixed point.

"Trending" rankers weight recent activity exponentially:
``score = Σ 2^(-age / half_life)``. Computed in floating point that sum
is partition-order-dependent and uncertifiable; this operator keeps it
EXACT by working in units of the oldest bucket's weight: with ages
quantized to ``half_life_days`` buckets ``b = age div half_life`` and
``B = (horizon-1) div half_life`` the maximum bucket, each event
contributes the INTEGER weight ``2^(B-b) = shiftleft(1, B-b)`` and the
per-key sum runs in DECIMAL(38,0) (the PMI overflow lesson: route any
product/sum that can pass int64 through DECIMAL before it wraps). The
result is the true decayed score scaled by the constant ``2^B`` — rank-
and ratio-preserving, bit-identical across engines and partitionings.

Plan shape: one scalar aggregate (the reference date — a single-row
broadcast, the `scalar-bcast` pattern in PLANS.md), one narrow
projection, one keyed aggregation. No windows, no Python.

Reference parity: the reference timestamps runs and sorts cohorts by
recency (`/root/reference/workflows/cnv.py` run-date stamps); decayed
scoring is the corpus-scale "what is hot now" generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def decay_weight_expr(age_col: str, half_life_days: int, max_b: int) -> Column:
    """The ONE definition of the integer decay weight,
    ``2^(max_b − age div half_life)``, shared by the batch operator and
    the streaming sink (streaming/decay.py) — their contract is
    bit-equality, so the weight arithmetic must have a single source."""
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"{max_b} - CAST({age_col} div {half_life_days} AS INT))"
    )


def decayed_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    half_life_days: int = 1,
    horizon_days: int = 30,
    score_col: str = "score_fp",
) -> DataFrame:
    """Per-key exact decayed event score over the trailing horizon.

    Events older than ``horizon_days`` (relative to the newest event
    date in ``df``) are excluded; remaining events weigh
    ``2^(B - age div half_life)`` with ``B = (horizon-1) div half_life``.
    Output: (key, score_fp BIGINT) — score_fp < n · 2^B, so with the
    default 30-day / 1-day horizon the BIGINT cast holds to ~8.6e9 rows
    per key; the internal sum is DECIMAL(38,0) regardless.
    """
    if half_life_days < 1 or horizon_days < 1:
        raise ValueError("half_life_days and horizon_days must be >= 1")
    max_b = (horizon_days - 1) // half_life_days
    ref = df.agg(F.max(F.to_date(ts_col)).alias("_ref"))
    aged = (
        df.select(F.col(key_col), F.to_date(ts_col).alias("_d"))
        .crossJoin(F.broadcast(ref))
        .withColumn("_age", F.datediff(F.col("_ref"), F.col("_d")))
        .filter((F.col("_age") >= 0) & (F.col("_age") < horizon_days))
        .withColumn("_w", decay_weight_expr("_age", half_life_days, max_b))
    )
    return aged.groupBy(key_col).agg(
        F.sum(F.col("_w").cast("decimal(38,0)")).cast("bigint").alias(score_col)
    )
