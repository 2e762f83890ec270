"""Distribution-drift statistics (two-sample Kolmogorov–Smirnov).

Training-data pipelines drift-check every refresh: did this week's crawl
shift the length/quality/price distribution vs the reference sample? The
KS statistic D = max_x |F_a(x) - F_b(x)| is the standard answer; this
module computes it EXACTLY in integer arithmetic — the ECDF difference is
compared as the cross product ``|c_a(x)·n_b - c_b(x)·n_a|`` (bigint), so
two engines agree bit-for-bit with no float ECDF division anywhere.

Scale shape — the naive form is a GLOBAL ordered window (one partition,
the curriculum-exact trap). This implementation is a two-phase
distributed prefix sum instead:

1. one aggregation collapses both samples to distinct-value rows
   ``(val, cnt_a, cnt_b)``;
2. values are range-bucketed by ``percentile_approx`` boundaries
   (mergeable sketch, broadcast lookup — the curriculum_buckets_approx
   trick). Bucket boundaries only affect WHERE the prefix sum is split,
   never its value, so the sketch's rank error is irrelevant to the
   result;
3. per-bucket subtotals (tiny: n_buckets rows) get cumulative offsets
   through a window over buckets; the per-value cumulative count is then
   offset + a window partitioned BY bucket — every partition-sized sort
   is bucket-local.

The final max is one map-side-combinable agg. No global sort, no single
partition anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    n_buckets: int = 64,
    unit: int = 1_000_000,
) -> DataFrame:
    """Exact two-sample KS between ``a[value_col]`` and ``b[value_col]``.

    Returns one row: ``n_a, n_b, d_cross`` (max |c_a·n_b - c_b·n_a|, an
    exact bigint) and ``d_fp`` = the KS statistic in integer ``unit``
    units, ``(d_cross * unit) div (n_a * n_b)`` with EVERY product
    (numerator AND the n_a·n_b divisor) operand-cast to DECIMAL(38,0)
    before multiplying, so two ~3e9-row samples can't wrap int64 (the
    PMI lesson). NULL values are excluded up front — an ECDF over NULLs
    is undefined, and engines disagree on NULL sort position (Spark
    windows order NULLS FIRST, DuckDB NULLS LAST)."""
    tagged = (
        a.select(F.col(value_col).alias("val"), F.lit(1).alias("_ga"))
        .unionByName(b.select(F.col(value_col).alias("val"), F.lit(0).alias("_ga")))
        .filter(F.col("val").isNotNull())
    )
    # The distinct-value table is referenced ~6x (bounds sketch, both
    # bucketed branches, subtotals, totals). A persist was tried here (r18)
    # and MEASURED SLOWER on both wall and CPU (1.75 s/4.7 CPU-s
    # re-deriving vs 2.2 s/13 CPU-s cached): each re-derivation is a
    # column-PRUNED partial aggregation over one scan — cheaper than the
    # eager-count job + cache write + 5 InMemoryTableScan reads it was
    # replaced with. At 100 TB the balance flips (each re-derivation is a
    # full corpus scan); a cluster caller should persist `a`/`b`-derived
    # vals outside this operator where the scan actually dominates.
    vals = tagged.groupBy("val").agg(
        F.sum("_ga").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("_ga")).cast("long").alias("cb"),
    )
    # range-bucket boundaries from a mergeable sketch; correctness does
    # not depend on their accuracy (see module docstring)
    if n_buckets < 2:  # degenerate: single bucket, no boundary sketch
        bucketed = vals.select("val", "ca", "cb", F.lit(0).alias("bkt"))
    else:
        bounds = vals.agg(
            F.percentile_approx(
                "val", [i / n_buckets for i in range(1, n_buckets)], 10_000
            ).alias("bs")
        )
        bucketed = vals.crossJoin(F.broadcast(bounds)).select(
            "val",
            "ca",
            "cb",
            F.size(F.filter("bs", lambda x: x < F.col("val"))).alias("bkt"),
        )
    per_bucket = bucketed.groupBy("bkt").agg(
        F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
    )
    owin = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )  # n_buckets rows: a tiny single-partition window, not a data one
    offsets = per_bucket.select(
        "bkt",
        F.coalesce(F.sum("ba").over(owin), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("bb").over(owin), F.lit(0)).alias("ob"),
    )
    vwin = Window.partitionBy("bkt").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bucketed.join(F.broadcast(offsets), "bkt").select(
        (F.col("oa") + F.sum("ca").over(vwin)).alias("c1"),
        (F.col("ob") + F.sum("cb").over(vwin)).alias("c2"),
    )
    totals = vals.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            # cross-multiply in DECIMAL(38,0): c·n wraps int64 once both
            # samples pass ~3e9 rows; the final bigint cast is LOUD under
            # ANSI if the max itself ever exceeds int64
            F.max(
                F.abs(
                    F.expr("CAST(c1 AS DECIMAL(38,0)) * n_b")
                    - F.expr("CAST(c2 AS DECIMAL(38,0)) * n_a")
                )
            )
            .cast("long")
            .alias("d_cross"),
        )
        # KS is undefined when either sample is empty: emit NO row (not a
        # null row, not an ANSI divide-by-zero). The filter runs before
        # the projection so the division can never see a zero divisor.
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "n_a",
            "n_b",
            "d_cross",
            F.expr(
                f"CAST((CAST(d_cross AS DECIMAL(38,0)) * {unit})"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("d_fp"),
        )
    )


def trend_slopes(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    y_scale: int = 100,
    unit: int = 1_000_000,
    min_points: int = 2,
) -> DataFrame:
    """Per-key OLS trend slope in EXACT integer arithmetic — the drift
    feature ("is this user's value rising?") computed so two engines
    agree bit-for-bit: x = whole seconds since the key's first event
    (exact integer µs division; OLS slope is shift-invariant, and the
    shift keeps x² inside int64), y = value on a 1/y_scale fixed-point
    grid, and slope_fp = (n·Σxy − Σx·Σy) · unit div (n·Σx² − (Σx)²)
    with an OPERAND of every product in both numerator and denominator
    cast to DECIMAL(38,0) BEFORE multiplying (the PMI overflow lesson —
    a cast after a finished int64 product arrives too late: long time
    spans make Σx, Σx² large enough that n·Σxy itself wraps first).
    Output: (key, n, slope_fp) — slope in y-units per second, scaled by
    unit.

    Scale shape: one map-side-combinable agg for the per-key t0, one
    shuffle-sharing agg for the sufficient statistics; no window, no
    sort. Keys with < min_points points or zero x-variance are dropped
    (their slope is undefined — and ANSI division would rightly error)."""
    t0 = df.groupBy(key_col).agg(F.min(ts_col).alias("_t0"))
    # x in whole seconds via exact integer µs division (`div`, not `/`:
    # long / long is double division in Spark)
    staged = df.join(t0, key_col).select(
        F.col(key_col),
        F.expr(
            # cast: unix_micros rejects TIMESTAMP_NTZ; the difference is
            # timezone-invariant so the session-tz interpretation cancels
            f"(unix_micros(CAST({ts_col} AS TIMESTAMP))"
            " - unix_micros(CAST(_t0 AS TIMESTAMP))) div 1000000"
        ).alias("x"),
        F.round(F.col(value_col) * y_scale).cast("long").alias("y"),
    )
    stats = staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        stats.withColumn(
            "num",
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
            ),
        )
        .withColumn(
            "den",
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
            ),
        )
        .filter((F.col("n") >= min_points) & (F.col("den") != 0))
        .select(
            key_col,
            "n",
            F.expr(f"CAST((num * {unit}) div den AS BIGINT)").alias("slope_fp"),
        )
    )


def anomaly_flags(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
    y_scale: int = 100,
    min_points: int = 3,
) -> DataFrame:
    """Per-key z-score outlier flags WITHOUT computing a z-score: flag a
    row when |x - mean| > k·std, evaluated as the cross-multiplied
    integer inequality ``(n·x - Σy)² > k²·(n·Σy² - (Σy)²)`` — no float
    mean, no sqrt, no division, so two engines agree on every boundary
    case bit-for-bit. Values ride a 1/y_scale fixed-point grid; every
    product on BOTH sides has an operand cast to DECIMAL(38,0) BEFORE
    the multiply (the PMI lesson — Σy·Σy wraps int64 near 1e6 rows per
    key at y_fp ~1e4, so a cast around a finished int64 product is no
    protection).

    Scale shape: one map-side-combinable stats agg per key + one
    broadcast-or-shuffle join back; no window. Keys with fewer than
    ``min_points`` rows are skipped (their std is noise). Returns the
    flagged rows: (key, id, y_fp, n)."""
    y = F.round(F.col(value_col) * y_scale).cast("long")
    staged = df.select(
        F.col(key_col), F.col(id_col), y.alias("y_fp")
    )
    stats = staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y_fp").alias("sy"),
        F.sum(F.col("y_fp") * F.col("y_fp")).alias("syy"),
    ).filter(F.col("n") >= min_points)
    lhs = F.expr("CAST(n AS DECIMAL(38,0)) * y_fp - sy")
    rhs = F.expr(
        f"CAST({k * k} AS DECIMAL(38,0))"
        " * (CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy)"
    )
    return (
        staged.join(stats, key_col)
        .filter((lhs * lhs) > rhs)
        .select(key_col, id_col, "y_fp", "n")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    grid: int = 100,
    n_buckets: int = 8192,
    validate: bool = False,
) -> DataFrame:
    """EXACT quantiles without a global sort: classic two-phase
    distributed selection. ``value_col`` must live on a 1/``grid``
    fixed-point lattice (prices, scores — anything stored with fixed
    decimals); values are scaled to exact integers up front.
    ``validate=True`` enforces that precondition (operators/lattice —
    the grouped sibling carries the same flag): continuous inputs raise
    LatticeViolation instead of returning plausible-but-quantized ranks.
    The check is FUSED into the phase-1 staging aggregate (extra
    n_off_lattice/max_deviation columns on the n/lo/hi pass the operator
    already runs) rather than a separate pre-scan — at 100 TB a pre-scan
    is a second full read of the column.

    Phase 1: one full-scan histogram over ``n_buckets`` equal-width
    ranges (map-side combinable) whose cumulative counts locate, for
    each requested p, the bucket containing rank ``ceil(p·n)`` — the
    bucket table is parameter-sized (never data-sized), so its driver
    collect is the bounded pagerank-style control-flow collect.
    Phase 2: one filtered scan of ONLY the target buckets, per-value
    counts, and a per-bucket cumulative window — the partition is
    bounded by the bucket's VALUE-GRID width (range/n_buckets/grid
    values), not by its row count, so a skewed bucket cannot blow up
    the window.

    Returns (p, value, rank): the rank-th smallest value (1-indexed,
    rank = ceil(p·n)) — DuckDB ``quantile_disc`` semantics, which the
    registered face's oracle states as an explicit ROW_NUMBER query.
    NULL values are excluded up front (r9 advice), matching
    ``grouped_quantiles``: counting NULL rows into n would shift every
    rank while the NULLs themselves can never be selected."""
    import math

    from pyspark.sql import Window

    v = F.round(F.col(value_col) * grid).cast("long")
    # Lattice validation is FUSED into the staging aggregate (r16 verdict
    # task 5: a separate pre-scan re-read the source column — a second
    # full pass at 100 TB); costs one persisted double/row, validate only.
    cols = [v.alias("_v")]
    agg_exprs = [
        F.count(F.lit(1)).alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    ]
    if validate:
        dev = F.abs(F.col(value_col) - F.round(F.col(value_col) * grid) / grid)
        cols.append(dev.alias("_dev"))
        agg_exprs += [
            F.coalesce(
                F.sum((F.col("_dev") > 0).cast("long")), F.lit(0)
            ).alias("n_off_lattice"),
            F.coalesce(F.max("_dev"), F.lit(0.0)).alias("max_abs_deviation"),
        ]
    staged = (
        df.filter(F.col(value_col).isNotNull()).select(*cols).persist()
    )
    try:
        agg = staged.agg(*agg_exprs).collect()[0]
        n, lo, hi = agg["n"], agg["lo"], agg["hi"]
        if validate:
            from .lattice import raise_if_off_lattice

            raise_if_off_lattice(
                value_col, grid, n, agg["n_off_lattice"],
                agg["max_abs_deviation"],
            )
        if n == 0:
            return df.sparkSession.createDataFrame(
                [], "p double, value double, rank long"
            )
        width = max(1, (hi - lo + n_buckets) // n_buckets)
        # bucket id by EXACT integer division (`div`, never float `/`:
        # _v - lo >= 0 so truncation == floor, and doubles lose bucket
        # boundaries once |hi - lo| passes 2^53); the identical
        # expression assigns buckets in both phases
        bucket_of = F.expr(f"(_v - {lo}) div {width}")
        hist = (
            staged.groupBy(bucket_of.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        cum, acc = {}, 0
        for row in sorted(hist, key=lambda r: r["b"]):
            cum[row["b"]] = (acc, acc + row["c"])  # [start, end) ranks
            acc += row["c"]
        targets = {}  # bucket -> [(p, rank, rank_within_bucket_base)]
        for p in ps:
            rank = max(1, math.ceil(p * n))
            for b, (s, e) in cum.items():
                if s < rank <= e:
                    targets.setdefault(b, []).append((p, rank, s))
                    break
        bucket_ids = sorted(targets)
        in_bucket = (
            staged.withColumn("b", bucket_of)
            .filter(F.col("b").isin(bucket_ids))
            .groupBy("b", "_v")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("b").orderBy("_v").rowsBetween(
            Window.unboundedPreceding, 0
        )
        ranked = in_bucket.select(
            "b", "_v", F.sum("c").over(w).alias("cum_in_bucket")
        ).collect()
        by_bucket: dict[int, list] = {}
        for r in ranked:
            by_bucket.setdefault(r["b"], []).append((r["_v"], r["cum_in_bucket"]))
        out = []
        for b, wants in targets.items():
            vals = sorted(by_bucket[b])
            for p, rank, base in wants:
                need = rank - base  # rank within the bucket
                for val, cumc in vals:
                    if cumc >= need:
                        out.append((float(p), val / grid, rank))
                        break
        return df.sparkSession.createDataFrame(
            sorted(out), "p double, value double, rank long"
        )
    finally:
        staged.unpersist()


def grouped_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ps: list[float],
    grid: int = 100,
    weight_col: str | None = None,
    validate: bool = False,
    n_buckets: int = 1,
) -> DataFrame:
    """EXACT per-group quantiles with ZERO driver collects — the grouped
    sibling of ``exact_quantiles`` and strictly better scale shape: where
    the global operator collects a parameter-sized histogram for
    control flow, this one is a single declarative plan end to end.

    Reference parity: the reference profiles per-cohort score/price
    distributions with pandas ``groupby().quantile()`` (pandas semantics,
    single-node); this is the distributed exact equivalent at DuckDB
    ``quantile_disc`` / rank = ceil(p*n) semantics.

    Shape: one map-side-combinable ``(key, value)`` count collapses the
    data to the distinct-value lattice, then ONE window over ``key``
    accumulates counts in value order — the partition is bounded by the
    group's distinct-value cardinality (the 1/``grid`` fixed-point
    lattice), never its row count. ``n_buckets > 1`` (r18) switches to a
    TWO-PHASE distributed prefix sum (the ks_drift bucketing, per key):
    the lattice is range-bucketed by per-key ``percentile_approx``
    boundaries, cumulative counts run as ~``n_buckets`` bucket-local
    windows plus one tiny per-key offset window, so no single task ever
    sorts a whole key's lattice — the production setting when the
    per-key lattice is huge and keys are few (the single window caps
    parallelism at the group count). Boundaries only affect WHERE the
    prefix sum splits, never its value — ``cum`` is bit-identical either
    way, so the result is ``n_buckets``-independent. The default stays 1:
    at bench scale the extra stages cost more than the 3-task window they
    parallelize, and with MANY keys the bucketed form's broadcast tables
    (keys x n_buckets rows) would outgrow an executor. The
    requested ps ride in as an exploded literal array (no join, no
    broadcast). Rank is computed in pure integer math: p is snapped to
    basis points (p_bp = round(p·10⁴)) and
    ``rank = ceil(p_bp·n / 10⁴) = (p_bp·n + 9999) div 10⁴`` — the
    add-then-truncate ceil, correct because every operand is positive
    (``-((-a) div b)`` would NOT be: div truncates toward zero, not
    floor). No float multiply, so engines agree on every boundary
    rank. p_bp·n stays in
    int64 up to n ≈ 9.2e14 rows per group (DECIMAL-route beyond, per
    the PMI lesson — not needed at any plausible per-group count).

    ``weight_col`` (optional, non-negative integer) switches to the
    WEIGHTED quantile: each row counts ``weight`` times, so rank walks
    total weight instead of row count ("the price at the median UNIT",
    "the doc-length at the median TOKEN") — identical plan, the lattice
    count just becomes a lattice weight-sum.

    Returns (key, p, value, rank, n): for each group and each p, the
    rank-th smallest value (1-indexed) on the 1/``grid`` lattice, with
    n = the group's row count (or total weight).

    ``validate=True`` enforces the lattice precondition by FUSING the
    round-trip deviation fold into the compaction aggregate and per-key
    window the operator already runs (r17 verdict task 2: the eager
    ``validate_lattice`` pre-scan was a second full read of the value
    column at 100 TB). The plan stays single-scan, zero-collect, and
    fully declarative; a violation surfaces at ACTION time as Spark's
    USER_RAISED_EXCEPTION carrying the
    :class:`~.lattice.LatticeViolation` message contract (per-key
    measured off-lattice count and worst deviation — every key emits at
    least one output row, so no violating key escapes the guard). The
    eager call-time check remains available as
    ``operators.lattice.validate_lattice`` for callers that prefer it.
    """
    p_bps = sorted({int(round(p * 10000)) for p in ps})
    v = F.round(F.col(value_col) * grid).cast("long")
    # NULL values are excluded up front: a NULL lattice point would ride
    # the ordered window, where engines disagree on NULL sort position
    # (Spark NULLS FIRST, DuckDB NULLS LAST) — the ks_drift lesson. A
    # NULL weight likewise contributes no mass rather than a NULL cell.
    if weight_col is None:
        mass = F.count(F.lit(1))
        cols = [F.col(key_col).alias("k"), v.alias("_v")]
        keep = F.col("_v").isNotNull()
    else:
        mass = F.sum("_w")
        cols = [
            F.col(key_col).alias("k"),
            v.alias("_v"),
            F.col(weight_col).cast("long").alias("_w"),
        ]
        keep = F.col("_v").isNotNull() & F.col("_w").isNotNull()
    cell_aggs = [mass.alias("c")]
    if validate:
        # round-trip deviation per row (lattice_deviation's expression),
        # folded through the cell aggregate the operator already runs
        dev = F.abs(F.col(value_col) - F.round(F.col(value_col) * grid) / grid)
        cols.append(dev.alias("_dev"))
        cell_aggs += [
            F.coalesce(
                F.sum((F.col("_dev") > 0).cast("long")), F.lit(0)
            ).alias("_off"),
            F.coalesce(F.max("_dev"), F.lit(0.0)).alias("_mdev"),
            F.count(F.lit(1)).alias("_nr"),
        ]
    staged = df.select(*cols).filter(keep)
    caches: list[DataFrame] = []
    if n_buckets < 2:
        # single-window form (parallelism = key count): the right plan when
        # keys are numerous — the (keys x n_buckets) broadcast tables of the
        # bucketed form would outgrow an executor broadcast, and many keys
        # already parallelize the window. Results identical either way.
        counts = staged.groupBy("k", "_v").agg(*cell_aggs)
        w_cum = (
            Window.partitionBy("k")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_all = Window.partitionBy("k")
        cum_cols = [
            F.col("k"),
            F.col("_v"),
            F.col("c"),
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        ]
        if validate:
            cum_cols += [
                F.sum("_off").over(w_all).alias("_offk"),
                F.max("_mdev").over(w_all).alias("_mdevk"),
                F.sum("_nr").over(w_all).alias("_nrk"),
            ]
        cum = counts.select(*cum_cols)
    else:
        # r18: two-phase distributed prefix sum (the ks_drift bucketing
        # trick, per key). The single window PARTITION BY key serializes
        # each key's whole distinct-value lattice into one task —
        # parallelism capped at the number of groups (3 for l_returnflag;
        # one giant task per key at 100 TB). Range-bucketing the lattice
        # by per-key percentile_approx boundaries splits every key into
        # ~n_buckets bucket-local windows plus one tiny per-key offset
        # window (<= n_buckets rows per key). Boundaries only affect WHERE
        # the prefix sum splits, never its value (bucket id = count of
        # boundaries < _v is monotone in _v and ties share a bucket), so
        # `cum` is bit-equal to the single-window form and the sketch's
        # rank error is irrelevant — accuracy rides at the cheap floor.
        # Both attach joins BROADCAST their (keys x n_buckets)-row sides
        # explicitly: the sides are aggregates of a cached frame, whose
        # static size estimates are useless, and the measured fallback was
        # three SortMergeJoins re-sorting the cell table. Callers with
        # very high key cardinality pass n_buckets=1 (the branch above).
        counts = staged.groupBy("k", "_v").agg(*cell_aggs).persist()
        counts.count()  # eager: broadcast-build jobs race a lazy cache
        caches = [counts]
        fracs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = counts.groupBy("k").agg(
            F.percentile_approx("_v", fracs, max(100, 4 * n_buckets)).alias("_bs")
        )
        bucketed = (
            counts.join(F.broadcast(bounds), "k")
            .withColumn(
                "_bkt", F.size(F.filter("_bs", lambda x: x < F.col("_v")))
            )
            .drop("_bs")
        )
        pb_aggs = [F.sum("c").alias("_bc")]
        if validate:
            pb_aggs += [
                F.sum("_off").alias("_offb"),
                F.max("_mdev").alias("_mdevb"),
                F.sum("_nr").alias("_nrb"),
            ]
        per_bucket = bucketed.groupBy("k", "_bkt").agg(*pb_aggs)
        owin = (
            Window.partitionBy("k")
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        kwin = Window.partitionBy("k")
        off_cols = [
            F.col("k"),
            F.col("_bkt"),
            F.coalesce(F.sum("_bc").over(owin), F.lit(0)).alias("_offcum"),
            F.sum("_bc").over(kwin).alias("n"),
        ]
        if validate:
            # the guard rides the per-key offset window (tiny)
            off_cols += [
                F.sum("_offb").over(kwin).alias("_offk"),
                F.max("_mdevb").over(kwin).alias("_mdevk"),
                F.sum("_nrb").over(kwin).alias("_nrk"),
            ]
        offsets = per_bucket.select(*off_cols)
        w_cum = (
            Window.partitionBy("k", "_bkt")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum_cols = [
            F.col("k"),
            F.col("_v"),
            F.col("c"),
            (F.col("_offcum") + F.sum("c").over(w_cum)).alias("cum"),
            F.col("n"),
        ]
        if validate:
            cum_cols += [F.col("_offk"), F.col("_mdevk"), F.col("_nrk")]
        cum = bucketed.join(F.broadcast(offsets), ["k", "_bkt"]).select(*cum_cols)
    probed = cum.withColumn(
        "p_bp", F.explode(F.array(*[F.lit(b) for b in p_bps]))
    ).withColumn(
        # clamp to >= 1 so p = 0.0 means "the minimum" instead of silently
        # emitting no row for the group (exact_quantiles' semantics — the
        # two quantile faces must agree; r8 advice)
        "rank",
        F.greatest(F.expr("(p_bp * n + 9999) div 10000"), F.lit(1)),
    )
    n_out = F.col("n")
    if validate:
        # LatticeViolation's message contract, raised in-plan: the rank
        # filter keeps >= 1 row per (key, p) — rank is clamped >= 1 and
        # every staged key has a cell with cum >= 1 — so a violating key
        # always evaluates its guard before emitting a quantized value
        msg = F.format_string(
            f"column {value_col!r} is not on the 1/{grid} lattice: "
            "%s/%s values off-lattice (key %s), "
            f"max |v - round(v*{grid})/{grid}| = %s "
            "— exact order statistics would silently quantize; pass data "
            "already aligned to the grid (or widen the grid)",
            F.col("_offk"),
            F.col("_nrk"),
            F.col("k").cast("string"),
            F.col("_mdevk"),
        )
        n_out = F.when(F.col("_offk") > 0, F.raise_error(msg)).otherwise(
            F.col("n")
        )
    from ..llm.dedup import _with_caches

    return _with_caches(
        probed.filter(
            (F.col("cum") >= F.col("rank"))
            & ((F.col("cum") - F.col("c")) < F.col("rank"))
        )
        .select(
            F.col("k").alias(key_col),
            (F.col("p_bp") / F.lit(10000.0)).alias("p"),
            (F.col("_v") / F.lit(float(grid))).alias("value"),
            "rank",
            n_out.alias("n"),
        ),
        caches,
    )


def simpson_diversity(
    df: DataFrame,
    key_col: str,
    cat_col: str,
) -> DataFrame:
    """Per-group Gini–Simpson diversity of a categorical mix — the
    corpus-health profile a training-data pipeline tracks per refresh
    (is this language's crawl still drawing from many sources, or did
    one domain swallow the mix?). Reference parity: the reference
    reports per-cohort value_counts tables and leaves diversity to the
    analyst; this emits the index itself.

    EXACT rational core: the unbiased estimator
    ``D = 1 - Σ c_i(c_i-1) / (N(N-1))`` is a ratio of two integers, so
    there is no float accumulation anywhere — both products ride
    DECIMAL(38,0) with an operand cast BEFORE the multiply (c_i ~ 3e9
    wraps int64 squared; the PMI lesson), and the only float ops are
    one correctly-rounded cast+divide at the very end, which two
    engines perform bit-identically on the same integers.

    Shape: two map-side-combinable aggs (``(key, cat)`` counts, then
    per-key fold) — no window, no driver collect. Groups with N <= 1
    get NULL diversity (the estimator is undefined).

    Returns (key, n_rows, n_cats, diversity)."""
    counts = df.groupBy(key_col, cat_col).agg(F.count(F.lit(1)).alias("c"))
    per_key = counts.groupBy(key_col).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cats"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).alias("num"),
    )
    den = F.expr("CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE)")
    return per_key.select(
        key_col,
        F.col("n").alias("n_rows"),
        "n_cats",
        F.when(
            F.col("n") > 1,
            F.lit(1.0) - F.col("num").cast("double") / den,
        ).alias("diversity"),
    )


def ks_drift_by_key(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    value_col: str,
    unit: int = 1_000_000,
    n_buckets: int = 1,
) -> DataFrame:
    """Per-segment exact two-sample KS — ``ks_drift`` partitioned by
    ``key_col``. Training-data refreshes drift-check each language /
    source / cohort separately (a global KS washes out a single
    segment's shift); this emits one exact row per segment.

    The grouped form is structurally SIMPLER than the global one: the
    global operator needs the percentile_approx bucket trick because
    its ordered window would otherwise be one giant partition, but here
    the window is already partitioned by segment and bounded by the
    segment's distinct-value lattice (the grouped_quantiles bound — for
    fixed-decimal scores/prices it is capped by the value grid, not the
    row count). Same integer discipline as the global: counts cross-
    multiplied with an operand cast to DECIMAL(38,0) BEFORE each
    product, NULL values excluded up front (engines disagree on NULL
    sort position), segments with an empty side emit no row.

    Returns (key, n_a, n_b, d_cross, d_fp) with
    ``d_fp = (d_cross·unit) div (n_a·n_b)`` — the KS statistic in
    integer ``unit`` units.

    ``n_buckets > 1`` (r19, the grouped_quantiles port — VERDICT r18
    task 5): the per-segment ordered window serializes each segment's
    whole distinct-value lattice into one task, capping parallelism at
    the segment count. The bucketed form range-splits each segment's
    lattice by per-key ``percentile_approx`` boundaries and runs the
    running counts as bucket-local windows plus one tiny per-key offset
    window — the production setting for few segments with huge value
    lattices. Boundaries only move WHERE the prefix sums split, never
    their values, so (c1, c2) — and the KS statistic — are bit-identical
    for every ``n_buckets`` (pinned by test). Default stays 1 (at bench
    scale the extra stages cost more than they parallelize); when
    ``n_buckets > 1`` the returned frame carries a cache handle the
    caller must release."""
    tagged = (
        a.select(
            F.col(key_col).alias("k"),
            F.col(value_col).alias("val"),
            F.lit(1).alias("_ga"),
        )
        .unionByName(
            b.select(
                F.col(key_col).alias("k"),
                F.col(value_col).alias("val"),
                F.lit(0).alias("_ga"),
            )
        )
        .filter(F.col("val").isNotNull())
    )
    vals = tagged.groupBy("k", "val").agg(
        F.sum("_ga").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("_ga")).cast("long").alias("cb"),
    )
    caches: list[DataFrame] = []
    if n_buckets < 2:
        vwin = Window.partitionBy("k").orderBy("val").rowsBetween(
            Window.unboundedPreceding, 0
        )
        kwin = Window.partitionBy("k")
        cum = vals.select(
            "k",
            F.sum("ca").over(vwin).alias("c1"),
            F.sum("cb").over(vwin).alias("c2"),
            F.sum("ca").over(kwin).alias("n_a"),
            F.sum("cb").over(kwin).alias("n_b"),
        )
    else:
        vals = vals.persist()
        vals.count()  # eager: the broadcast-build jobs race a lazy cache
        caches = [vals]
        fracs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = vals.groupBy("k").agg(
            F.percentile_approx("val", fracs, max(100, 4 * n_buckets)).alias(
                "_bs"
            )
        )
        bucketed = (
            vals.join(F.broadcast(bounds), "k")
            .withColumn(
                "_bkt", F.size(F.filter("_bs", lambda x: x < F.col("val")))
            )
            .drop("_bs")
        )
        per_bucket = bucketed.groupBy("k", "_bkt").agg(
            F.sum("ca").alias("_bca"), F.sum("cb").alias("_bcb")
        )
        owin = (
            Window.partitionBy("k")
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        kwin = Window.partitionBy("k")
        offsets = per_bucket.select(
            "k",
            "_bkt",
            F.coalesce(F.sum("_bca").over(owin), F.lit(0)).alias("_offa"),
            F.coalesce(F.sum("_bcb").over(owin), F.lit(0)).alias("_offb"),
            F.sum("_bca").over(kwin).alias("n_a"),
            F.sum("_bcb").over(kwin).alias("n_b"),
        )
        bwin = (
            Window.partitionBy("k", "_bkt")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = bucketed.join(F.broadcast(offsets), ["k", "_bkt"]).select(
            "k",
            (F.col("_offa") + F.sum("ca").over(bwin)).alias("c1"),
            (F.col("_offb") + F.sum("cb").over(bwin)).alias("c2"),
            "n_a",
            "n_b",
        )
    out = (
        cum.groupBy("k")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.expr("CAST(c1 AS DECIMAL(38,0)) * n_b")
                    - F.expr("CAST(c2 AS DECIMAL(38,0)) * n_a")
                )
            )
            .cast("long")
            .alias("d_cross"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            F.col("k").alias(key_col),
            "n_a",
            "n_b",
            "d_cross",
            F.expr(
                f"CAST((CAST(d_cross AS DECIMAL(38,0)) * {unit})"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("d_fp"),
        )
    )
    if not caches:
        return out
    from ..llm.dedup import _with_caches

    return _with_caches(out, caches)
