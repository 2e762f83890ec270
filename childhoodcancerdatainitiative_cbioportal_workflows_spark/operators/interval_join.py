"""Binned interval (range) join — the engine's one custom physical strategy.

Replaces the reference's shelled-out ``bedtools intersect -a genes -b segs
-wo -f 0.5`` (``workflows/cnv.py:413-436``): an overlap join between two
interval tables, keeping pairs whose overlap covers at least
``min_overlap_frac`` of the *left* interval, and emitting both rows plus the
overlap width (bedtools' ``-wo`` column).

Why not a plain non-equi join: Catalyst plans
``l.chrom==r.chrom AND l.start<r.end AND r.start<l.end`` as a shuffled join
on ``chrom`` with a per-key nested-loop filter — quadratic per chromosome and
badly skewed (chr1 >> chrY). At 100 TB that one key explodes.

Strategy (standard genomic binning, cf. Spark range-join literature):
  1. explode each interval into the fixed-width bins it touches:
     ``sequence(start div W, (end-1) div W)`` (integer division — exact
     past 2^53 where float floor is not; end <= start rows are dropped
     first);
  2. equi-join on ``(chrom, bin)`` — a normal shuffled/broadcast hash join
     with fine-grained keys, so skew is bounded by W, AQE handles the rest;
  3. keep genuinely overlapping pairs;
  4. de-duplicate *without a shuffle*: a pair that overlaps appears in every
     shared bin, but only one bin contains the overlap start — keep the pair
     only where ``bin == floor(greatest(l.start, r.start)/W)``.

Coordinates are half-open ``[start, end)`` (bedtools BED convention after the
reference's ``start-1`` shift at ``cnv.py:382``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_BIN = 1_000_000  # ~genomic Mb; segments/genes are << 1 Mb typically

#: auto-derived bin width is clamped to this range (a 16 bp floor keeps
#: degenerate all-1bp corpora from generating per-base join keys; the cap
#: keeps one bin from swallowing a whole chromosome)
_AUTO_BIN_MIN, _AUTO_BIN_MAX = 16, 1 << 30


def derive_bin_size(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str, str] = ("chrom", "start", "end"),
    right_cols: tuple[str, str, str] = ("chrom", "start", "end"),
) -> int:
    """Pick the bin width from the data (the auto-P/auto-m/auto-shards
    house pattern applied to the one custom physical strategy). The result
    of :func:`interval_join` is IDENTICAL for any width — only the plan's
    replication/skew changes — so this is purely a physical knob.

    The tension: an interval of length L explodes into ``ceil(L/W)`` bin
    rows (W too small -> whole-chromosome segments replicate millions of
    times), while every interval inside one W-window lands on one join
    key (W too big -> per-key quadratic fan-out). Taking
    ``W >= mean(len)`` bounds TOTAL replication to <= 2x the input rows
    (sum(len_i)/W <= N·mean/W <= N), and ``W >= p95(len)`` keeps 95% of
    intervals on <= 2 bins, so a pathological mix (1 bp reads + arm-length
    segments) can neither explode the long stratum nor key-collapse the
    short one. Rounded up to a power of two for stable, cache-friendly
    widths. One narrow aggregate over both inputs (at 100 TB, feed a
    sample); callers that need a pinned plan pass an int ``bin_size``."""
    lc, ls, le = left_cols
    rc, rs, re_ = right_cols
    lens = (
        left.select((F.col(le) - F.col(ls)).cast("long").alias("len"))
        .unionByName(
            right.select((F.col(re_) - F.col(rs)).cast("long").alias("len"))
        )
    )
    row = lens.agg(
        F.mean("len").alias("mean"),
        F.percentile_approx("len", 0.95, 10_000).alias("p95"),
    ).first()
    if row is None or row["mean"] is None:
        return DEFAULT_BIN
    w = int(max(row["p95"], row["mean"], _AUTO_BIN_MIN))
    w = 1 << (w - 1).bit_length()  # next power of two
    return min(w, _AUTO_BIN_MAX)


def _binned(df: DataFrame, chrom: str, start: str, end: str, bin_size: int, prefix: str) -> DataFrame:
    """Explode one side into its (chrom, bin) rows. Bin ids use INTEGER
    division (`div`), not float `/` + floor — doubles lose bucket
    boundaries past 2^53 (the exact_quantiles lesson; r8 advice).
    Coordinates are non-negative by the BED convention, where `div` and
    floor agree. Empty/inverted intervals (end <= start) are dropped
    BEFORE the explode: they can never overlap anything (the join
    filters overlap > 0), and `sequence` would otherwise count their
    bins DOWNWARD, manufacturing spurious rows."""
    out = df
    for c in df.columns:
        out = out.withColumnRenamed(c, f"{prefix}{c}")
    s_name, e_name = f"{prefix}{start}", f"{prefix}{end}"
    return (
        out.filter(F.col(e_name) > F.col(s_name))
        # The BED non-negativity assumption is ENFORCED, not assumed
        # (r9 advice): `div` truncates toward zero, so a negative start
        # would mis-bin relative to floor and silently drop overlapping
        # pairs. Fail loudly instead — assert_true returns NULL on pass,
        # so the filter keeps every row; it lives IN the filter (not a
        # dropped column) so Catalyst cannot prune the check away.
        .filter(
            F.assert_true(
                F.col(s_name) >= 0,
                F.lit(
                    "interval_join: negative start coordinate — binning "
                    "assumes BED-style start >= 0"
                ),
            ).isNull()
        )
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"CAST(`{s_name}` AS BIGINT) div {bin_size}"),
                    F.expr(
                        f"(CAST(`{e_name}` AS BIGINT) - 1) div {bin_size}"
                    ),
                )
            ),
        )
        .withColumn("_chrom", F.col(f"{prefix}{chrom}"))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_cols: tuple[str, str, str] = ("chrom", "start", "end"),
    right_cols: tuple[str, str, str] = ("chrom", "start", "end"),
    bin_size: int | str = "auto",
    min_overlap_frac: float | None = None,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    overlap_col: str = "overlap_bp",
) -> DataFrame:
    """Overlap-join two interval DataFrames; emit all columns (prefixed) plus
    the overlap width. ``min_overlap_frac`` filters pairs whose overlap is
    < frac * left interval length (bedtools ``-f``). ``bin_size="auto"``
    derives the width from the data (:func:`derive_bin_size` — the result
    is identical for any width; pass an int to pin the plan)."""
    lc, ls, le = left_cols
    rc, rs, re_ = right_cols
    if bin_size == "auto":
        bin_size = derive_bin_size(left, right, left_cols, right_cols)
    elif not isinstance(bin_size, int):
        raise ValueError(f"bin_size must be an int or 'auto', got {bin_size!r}")
    lb = _binned(left, lc, ls, le, bin_size, left_prefix)
    rb = _binned(right, rc, rs, re_, bin_size, right_prefix)
    return _overlap_join(
        lb, rb, left_cols, right_cols, bin_size, min_overlap_frac,
        left_prefix, right_prefix, overlap_col,
    )


def _overlap_join(
    lb: DataFrame,
    rb: DataFrame,
    left_cols: tuple[str, str, str],
    right_cols: tuple[str, str, str],
    bin_size: int,
    min_overlap_frac: float | None,
    left_prefix: str,
    right_prefix: str,
    overlap_col: str,
) -> DataFrame:
    """Join/filter/dedup over two already-binned sides — shared by the
    in-flight path (:func:`interval_join`) and the bucketed-storage path
    (:func:`interval_join_bucketed`); only where the (_chrom, _bin) rows
    come from differs."""
    _, ls, le = left_cols
    _, rs, re_ = right_cols
    j = lb.join(rb, on=["_chrom", "_bin"])
    l_start, l_end = F.col(f"{left_prefix}{ls}"), F.col(f"{left_prefix}{le}")
    r_start, r_end = F.col(f"{right_prefix}{rs}"), F.col(f"{right_prefix}{re_}")
    overlap = F.least(l_end, r_end) - F.greatest(l_start, r_start)
    j = j.filter(overlap > 0)
    # shuffle-free dedup: keep the pair only in the bin holding overlap
    # start (integer div, matching _binned's bin-id arithmetic exactly)
    j = j.filter(
        F.col("_bin")
        == F.expr(
            f"CAST(greatest(`{left_prefix}{ls}`, `{right_prefix}{rs}`) "
            f"AS BIGINT) div {bin_size}"
        )
    )
    j = j.withColumn(overlap_col, overlap)
    if min_overlap_frac is not None:
        j = j.filter(F.col(overlap_col) >= F.lit(min_overlap_frac) * (l_end - l_start))
    return j.drop("_bin", "_chrom")


def write_binned_bucketed(
    df: DataFrame,
    table: str,
    *,
    cols: tuple[str, str, str] = ("chrom", "start", "end"),
    bin_size: int,
    n_buckets: int,
    prefix: str,
    path: str | None = None,
) -> None:
    """Materialize one interval table PRE-BINNED and bucketed on
    ``(_chrom, _bin)`` — the 100 TB face of the interval join. Genomics
    workloads re-join the same gene/segment tables per cohort
    (``workflows/cnv.py:430`` reruns bedtools per run); paying the bin
    explode + shuffle ONCE at write time lets every subsequent
    :func:`interval_join_bucketed` against an equally-bucketed partner
    run with zero Exchange nodes (plan-asserted in
    tests/test_partitioning.py). ``bin_size`` is frozen into the layout —
    both sides and the later join must use the same value (pass an int,
    not "auto", so the plan is pinned)."""
    from ..sources.bucketed import write_bucketed

    c, s, e = cols
    b = _binned(df, c, s, e, bin_size, prefix)
    write_bucketed(
        b, table, ["_chrom", "_bin"], n_buckets,
        sort_cols=["_chrom", "_bin"], path=path,
    )


def interval_join_bucketed(
    spark,
    left_table: str,
    right_table: str,
    *,
    left_cols: tuple[str, str, str] = ("chrom", "start", "end"),
    right_cols: tuple[str, str, str] = ("chrom", "start", "end"),
    bin_size: int,
    min_overlap_frac: float | None = None,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    overlap_col: str = "overlap_bp",
) -> DataFrame:
    """Interval join over two :func:`write_binned_bucketed` tables:
    byte-identical output to :func:`interval_join` (same join, filters
    and bin-dedup), but both sides arrive pre-binned and co-bucketed so
    the equi-join on ``(_chrom, _bin)`` plans with NO Exchange — the
    shuffle was paid once at write time. ``bin_size`` must match the
    width the tables were written with (it drives the dedup filter)."""
    from ..sources.bucketed import read_bucketed

    return _overlap_join(
        read_bucketed(spark, left_table),
        read_bucketed(spark, right_table),
        left_cols, right_cols, bin_size, min_overlap_frac,
        left_prefix, right_prefix, overlap_col,
    )
