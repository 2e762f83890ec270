"""Data-layout operators: Z-order (Morton-curve) clustered writes.

At 100 TB, pruning beats computing: a parquet lake laid out along a
space-filling curve lets min/max file statistics prune MULTI-dimensional
box predicates, where a linear sort only ever prunes its leading column.
This is the open-source counterpart of Delta OPTIMIZE ZORDER BY (the
Morton interleave itself is textbook; no Delta code involved): bucketize
each dimension to ``bits`` quantile-free min/max bins, interleave the
bits into one bigint z-value, range-repartition + sort by it, write.

Everything is built-in expressions — the interleave unrolls to shift/and
bit ops inside whole-stage codegen, the min/max pass is one tiny
aggregate broadcast back as literals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of pre-bucketized non-negative ints (< 2^bits)
    into one bigint: bit i of column j lands at position i*len(cols)+j."""
    n = len(cols)
    total = bits * n
    if total > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds bigint range")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * n + j)
    return out


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "_zval",
) -> DataFrame:
    """Append the z-value over min/max-normalized ``cols`` (numeric).
    The per-column bounds come from ONE aggregate, broadcast back via a
    literal-free crossJoin (single row)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    bounds = df.agg(*aggs)
    maxbin = (1 << bits) - 1
    joined = df.crossJoin(F.broadcast(bounds))
    bucketed = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        b = F.least(
            F.lit(maxbin),
            F.floor((F.col(c).cast("double") - lo) / span * maxbin).cast("long"),
        )
        bucketed.append(F.greatest(F.lit(0), b))
    z = interleave_bits(bucketed, bits)
    drop = [f"_min_{c}" for c in cols] + [f"_max_{c}" for c in cols]
    return joined.withColumn(out_col, z).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered along the Morton curve of
    ``cols``: range-repartition on the z-value (contiguous curve segments
    per file) + sort within partitions, so every file's min/max footer
    stats cover a small box in EVERY dimension."""
    zdf = with_zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(num_files, F.col("_zval"))
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )
