"""Robust per-group anomaly detection: median / MAD, fully distributed.

The 3σ rule (operators/stats.anomaly_flags) breaks on heavy-tailed data
— outliers inflate the very σ meant to catch them. The robust-statistics
standard replaces mean/σ with median and MAD (median absolute
deviation), whose breakdown point is 50%. This module computes BOTH as
exact order statistics on integer fixed-point values, with no collect,
no global sort, and no floats:

* the grouped low median is a pure DataFrame plan — per-(key, value)
  counts, a cumulative-count window per key ordered by value, and the
  rank-walk pick ``min(value) where cum ≥ (n+1) div 2`` (low-median
  convention: the ⌈n/2⌉-th order statistic, identical in both engines
  because it never interpolates);
* MAD is the same selection run again on ``|x − median|``;
* a row is anomalous iff ``|x − median| > mult · MAD`` — an integer
  comparison, so every boundary case is bit-decided.

Shuffle accounting: two keyed aggregations + two windows, all on the
group key; the per-key state after the first aggregation is the DISTINCT
value set, so on fixed-point grids (the module precondition, shared with
operators/stats.grouped_quantiles) the post-shuffle work is lattice-
sized, not row-sized. The parity-only trap for order statistics (both
engines agreeing on the wrong convention) is covered by a brute-force
model test, per the grouped_quantiles discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grouped_low_median(
    df: DataFrame, key_col: str, val_col: str, out_col: str = "med"
) -> DataFrame:
    """(key, low-median of val): the smallest value whose cumulative
    count reaches ceil(n/2) = (n+1) div 2. Exact, no interpolation."""
    counts = (
        df.select(F.col(key_col).alias("_k"), F.col(val_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy("_k", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # per-key total as a full-partition window over the SAME _k exchange
    # the cumulative window already established (guide §2.4: window after
    # window on one key needs one shuffle) — the old separate
    # groupBy(_k) total + join back re-read `counts` and added two more
    # exchanges per median pass.
    w_all = Window.partitionBy("_k")
    cum = counts.select(
        "_k",
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    return (
        cum.filter(F.expr("_cum >= (_n + 1) div 2"))
        .groupBy("_k")
        .agg(F.min("_v").alias(out_col))
        .select(F.col("_k").alias(key_col), out_col)
    )


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    val_col: str,
    mult: int = 3,
) -> DataFrame:
    """Per-key robust profile: (key, med_fp, mad_fp, n, n_anomalies)
    where a row is anomalous iff |x − med| > mult · MAD. ``val_col``
    must be integer fixed point (cents, micros, …)."""
    # the narrow (key, value) projection is scanned three times (median
    # counts, deviation pass, final profile) — persist it once so the
    # probe-measured residual alpha is the cache read, not three base
    # scans (SCALE_NOTES round 8d)
    v = (
        df.select(F.col(key_col).alias("_k"), F.col(val_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .persist()
    )
    med = None
    try:
        # persist the per-key medians (group-count-sized, tiny): `dev` is
        # referenced by BOTH the MAD selection and the final profile, so an
        # un-persisted med re-runs its two-exchange window chain per branch
        # (r18). Eager: the branches' broadcast builds race a lazy cache.
        med = grouped_low_median(v, "_k", "_v", out_col="_med").persist()
        med.count()
        dev = v.join(med, "_k").withColumn(
            "_dx", F.abs(F.col("_v") - F.col("_med"))
        )
        mad = grouped_low_median(dev, "_k", "_dx", out_col="_mad")
        out = (
            dev.join(mad, "_k")
            .groupBy("_k")
            .agg(
                F.min("_med").alias("med_fp"),
                F.min("_mad").alias("mad_fp"),
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("_dx") > F.lit(mult) * F.col("_mad")).cast("bigint")
                ).alias("n_anomalies"),
            )
            .select(
                F.col("_k").alias(key_col), "med_fp", "mad_fp", "n", "n_anomalies"
            )
        )
        # Lazy with caller-released cache (r18): the eager localCheckpoint
        # materialized the whole plan at build time and the caller's
        # action then re-read the checkpoint — one extra job and a
        # barrier for a group-count-sized result. The cache handle rides
        # the standard _with_caches contract instead.
        from ..llm.dedup import _with_caches

        return _with_caches(out, [v, med])
    except Exception:
        v.unpersist()
        if med is not None:
            med.unpersist()
        raise
