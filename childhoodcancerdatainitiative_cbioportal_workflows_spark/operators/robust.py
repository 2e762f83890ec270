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
    df: DataFrame,
    key_col: str,
    val_col: str,
    out_col: str = "med",
    n_buckets: int = 1,
) -> DataFrame:
    """(key, low-median of val): the smallest value whose cumulative
    count reaches ceil(n/2) = (n+1) div 2. Exact, no interpolation.

    ``n_buckets > 1`` (r19, the grouped_quantiles port — VERDICT r18
    task 5) switches the cumulative count to the TWO-PHASE bucketed
    prefix sum: the per-key distinct-value lattice is range-bucketed by
    per-key ``percentile_approx`` boundaries, the running count becomes
    ~``n_buckets`` bucket-local windows plus one tiny per-key offset
    window, and no single task ever sorts a whole key's lattice — the
    production setting for the huge-lattice/few-key regime, where the
    single window below caps parallelism at the group count. Boundaries
    only affect WHERE the prefix sum splits, never its value (bucket id
    is monotone in ``_v`` and ties share a bucket), so ``_cum`` — and the
    median — is bit-identical for every ``n_buckets`` (pinned by test).
    The default stays 1: the bucketed form adds an eager cache fill and
    two broadcast builds, a loss at bench scale and with many keys
    (where the (keys x n_buckets) broadcast sides grow). When
    ``n_buckets > 1`` the returned frame carries a cache handle
    (``_spark_graft_caches``) the caller must release."""
    counts = (
        df.select(F.col(key_col).alias("_k"), F.col(val_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy("_k", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if n_buckets < 2:
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
        caches: list[DataFrame] = []
    else:
        counts = counts.persist()
        counts.count()  # eager: the broadcast-build jobs race a lazy cache
        caches = [counts]
        fracs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = counts.groupBy("_k").agg(
            F.percentile_approx("_v", fracs, max(100, 4 * n_buckets)).alias(
                "_bs"
            )
        )
        bucketed = (
            counts.join(F.broadcast(bounds), "_k")
            .withColumn(
                "_bkt", F.size(F.filter("_bs", lambda x: x < F.col("_v")))
            )
            .drop("_bs")
        )
        per_bucket = bucketed.groupBy("_k", "_bkt").agg(
            F.sum("_c").alias("_bc")
        )
        owin = (
            Window.partitionBy("_k")
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        kwin = Window.partitionBy("_k")
        offsets = per_bucket.select(
            "_k",
            "_bkt",
            F.coalesce(F.sum("_bc").over(owin), F.lit(0)).alias("_offcum"),
            F.sum("_bc").over(kwin).alias("_n"),
        )
        w_cum = (
            Window.partitionBy("_k", "_bkt")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = bucketed.join(F.broadcast(offsets), ["_k", "_bkt"]).select(
            "_k",
            "_v",
            (F.col("_offcum") + F.sum("_c").over(w_cum)).alias("_cum"),
            F.col("_n"),
        )
    out = (
        cum.filter(F.expr("_cum >= (_n + 1) div 2"))
        .groupBy("_k")
        .agg(F.min("_v").alias(out_col))
        .select(F.col("_k").alias(key_col), out_col)
    )
    if not caches:
        return out
    from ..llm.dedup import _with_caches

    return _with_caches(out, caches)


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    val_col: str,
    mult: int = 3,
    n_buckets: int = 1,
) -> DataFrame:
    """Per-key robust profile: (key, med_fp, mad_fp, n, n_anomalies)
    where a row is anomalous iff |x − med| > mult · MAD. ``val_col``
    must be integer fixed point (cents, micros, …). ``n_buckets`` is
    passed through to both :func:`grouped_low_median` selections (the
    r19 bucketed prefix sum for the huge-lattice/few-key regime);
    results are ``n_buckets``-independent."""
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
    inner: list[DataFrame] = []
    try:
        # persist the per-key medians (group-count-sized, tiny): `dev` is
        # referenced by BOTH the MAD selection and the final profile, so an
        # un-persisted med re-runs its two-exchange window chain per branch
        # (r18). Eager: the branches' broadcast builds race a lazy cache.
        med0 = grouped_low_median(v, "_k", "_v", out_col="_med", n_buckets=n_buckets)
        inner += getattr(med0, "_spark_graft_caches", [])
        med = med0.persist()
        med.count()
        dev = v.join(med, "_k").withColumn(
            "_dx", F.abs(F.col("_v") - F.col("_med"))
        )
        mad = grouped_low_median(dev, "_k", "_dx", out_col="_mad", n_buckets=n_buckets)
        inner += getattr(mad, "_spark_graft_caches", [])
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

        return _with_caches(out, [v, med, *inner])
    except Exception:
        v.unpersist()
        if med is not None:
            med.unpersist()
        for c in inner:
            c.unpersist()
        raise
