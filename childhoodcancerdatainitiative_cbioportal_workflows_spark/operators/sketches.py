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


def _cms_bucket(col, row: int, w: int):
    """Deterministic md5-derived Count-Min bucket — the minhash_lsh_md5
    discipline: fold the first 8 md5 nibbles into a 32-bit int, mod w.
    Reproducible in ANY engine (the point: the sketch itself becomes
    oracle-checkable, unlike engine-opaque HLL/KLL internals above)."""
    h = F.md5(F.concat(F.lit(f"{row}:"), col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w).alias(
        f"b{row}"
    )


def countmin_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch of ``df[col]``'s frequency distribution:
    ``depth`` independent hash rows × ``width`` counters, built with ONE
    map-side-combinable aggregation per row over the exploded items
    (union'd, so still one shuffle of ≤ depth·width result rows). The
    sketch is (row, bucket, c) — linear, hence MERGEABLE: sketches of
    disjoint corpus shards sum counter-wise into the corpus sketch
    (pinned by test), which is what makes it a 100 TB structure: each
    partition ships depth·width longs, never its items."""
    from functools import reduce

    parts = [
        df.select(_cms_bucket(F.col(col), r, width).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(r).alias("row"), "bucket", "c")
        for r in range(depth)
    ]
    return reduce(DataFrame.unionByName, parts)


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]``: est = min over rows
    of the counter at that row's bucket — the classic CMS upper bound
    (est >= true count always; error ≤ 2N/width with prob 1-2^-depth).
    The sketch is broadcast (≤ depth·width rows)."""
    b = probes.select(
        F.col(col),
        *[_cms_bucket(F.col(col), r, width) for r in range(depth)],
    )
    est = None
    for r in range(depth):
        s_r = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("c").alias(f"c{r}")
        )
        b = b.join(F.broadcast(s_r), f"b{r}", "left")
    mins = F.least(*[F.coalesce(F.col(f"c{r}"), F.lit(0)) for r in range(depth)])
    return b.select(F.col(col), mins.alias("est_n"))
