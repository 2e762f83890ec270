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
    df: DataFrame, col: str, depth: int = 4, width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``df[col]``'s frequency distribution:
    ``depth`` independent hash rows × ``width`` counters, built in ONE
    pass — each item explodes into its ``depth`` (row, bucket) cells and
    a single map-side-combinable aggregation sums them (r18; the old
    union of one aggregation per hash row scanned the items ``depth``
    times and ran the md5 bucket hash per scan). ``weight_col`` counts
    each item that many times — pass pre-aggregated (item, count) pairs
    so the hashes run once per DISTINCT item instead of once per
    occurrence (the counters are sums, so weighted-by-count over
    distinct items is bit-identical to counting occurrences). The
    sketch is (row, bucket, c) — linear, hence MERGEABLE: sketches of
    disjoint corpus shards sum counter-wise into the corpus sketch
    (pinned by test), which is what makes it a 100 TB structure: each
    partition ships depth·width longs, never its items."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rb"),
        w.alias("_w"),
    )
    return (
        cells.groupBy(F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("long").alias("c"))
    )


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


def _hll_alpha_num(p: int) -> int:
    """HLL bias constant as ONE exact integer: round(alpha_m * m^2 * 2^49)
    with alpha_m = 0.7213/(1 + 1.079/m) (Flajolet et al. 2007, m >= 128).
    Folding every float into a single shared integer literal is what lets
    two engines compute the estimate with pure integer division."""
    m = 1 << p
    if m < 128:  # the small-m alpha table is out of scope for this engine
        raise ValueError("hll requires p >= 7")
    return round(0.7213 / (1.0 + 1.079 / m) * m * m * (1 << 49))


def _hll_parts(col, p: int):
    """(register index, rho) from one md5 — the portable-HLL split: the
    first 4 hex nibbles (16 uniform bits) pick the register (m divides
    2^16, so `% m` stays exactly uniform), nibbles 5-16 give a 48-bit
    tail whose leading-zero count is rho. rho = 49 - bitlength(tail),
    computed EXACTLY via length(bin(v)) — both Spark and DuckDB print
    bin() without leading zeros — never via float log2 (exact only for
    powers of two, and only by accident)."""
    if p > 16 or p < 7:
        raise ValueError("p must be in [7, 16]")
    m = 1 << p
    h = F.md5(col)
    idx = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m
    v = F.conv(F.substring(h, 5, 12), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(49)).otherwise(
        (F.lit(49) - F.length(F.bin(v))).cast("int")
    )
    return idx, rho


def hll_sketch(df: DataFrame, col: str, p: int = 9) -> DataFrame:
    """Portable HyperLogLog register table for ``df[col]``: (idx, rho)
    with rho = max over items — ONE map-side-combinable aggregation whose
    shuffle carries at most m = 2^p rows per partition, never the items.
    md5-derived registers make the sketch itself engine-reproducible
    (the countmin_tokens discipline, commit e2462f3): a DuckDB oracle
    rebuilds the IDENTICAL table, so the sketch — not just its estimate
    — is certifiable. Absent idx rows mean register value 0.

    NULLs are not set members (the hll_overlap rule, r8 advice): without
    the filter md5(NULL) yields a (NULL, NULL) register row that inflates
    n_present by 1 and drops one 2^49 term from s_sum."""
    idx, rho = _hll_parts(F.col(col), p)
    return (
        df.filter(F.col(col).isNotNull())
        .select(idx.alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches register-wise by MAX — the 100 TB property:
    sketches of disjoint corpus shards merge into exactly the corpus
    sketch (pinned by test, mirroring countmin's linearity test)."""
    from functools import reduce

    return (
        reduce(DataFrame.unionByName, sketches)
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(sketch: DataFrame, p: int = 9) -> DataFrame:
    """Cardinality estimate from a register table, bit-exact across
    engines: the harmonic sum rides the integer lattice S = sum over all
    m registers of 2^(49-rho) (absent register: 2^49; max numerator
    m*2^49 < 2^63 for p <= 13), and est_n = A div S where A is the one
    precomputed integer constant — no float division anywhere, so the
    raw estimator is oracle-certifiable to the last digit.

    Returns one row (n_present, n_zero, s_sum, est_n, est_corrected):
    est_n is the exact-integer raw HLL estimate; est_corrected is the
    library convenience DOUBLE applying linear counting when zero
    registers exist and est <= 2.5m (ln is float — certified faces
    should select the integer columns only)."""
    m = 1 << p
    a_num = _hll_alpha_num(p)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.coalesce(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - rho)")), F.lit(0)
        ).alias("_present_sum"),
    )
    return (
        agg.select(
            "n_present",
            (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero"),
            (
                F.col("_present_sum")
                + (F.lit(m) - F.col("n_present")) * F.lit(1 << 49)
            ).alias("s_sum"),
        )
        .select(
            "n_present",
            "n_zero",
            "s_sum",
            F.expr(
                f"CAST(CAST('{a_num}' AS DECIMAL(38,0)) div s_sum AS BIGINT)"
            ).alias("est_n"),
        )
        .withColumn(
            "est_corrected",
            F.when(
                (F.col("n_zero") > 0) & (F.col("est_n") <= int(2.5 * m)),
                F.round(F.lit(m) * F.log(F.lit(m) / F.col("n_zero"))),
            ).otherwise(F.col("est_n").cast("double")),
        )
    )


def hll_sketch_grouped(
    df: DataFrame, group_col: str, col: str, p: int = 9
) -> DataFrame:
    """Per-group portable-HLL register tables: (group, idx, rho) — the
    grouped face of :func:`hll_sketch` ("distinct users per source"
    profiling). One map-side-combinable aggregation; the shuffle carries
    at most m rows per group per partition. Groups merge exactly like
    shards (register-wise MAX on (group, idx)). NULL values are not set
    members (same rule as :func:`hll_sketch`); a group whose values are
    all NULL therefore contributes no register rows at all."""
    idx, rho = _hll_parts(F.col(col), p)
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col), idx.alias("idx"), rho.alias("rho"))
        .groupBy(group_col, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_grouped(
    sketch: DataFrame, group_col: str, p: int = 9
) -> DataFrame:
    """Per-group estimates from a grouped register table — same exact
    integer lattice as :func:`hll_estimate`, one row per group:
    (group, n_present, n_zero, s_sum, est_n, est_corrected)."""
    m = 1 << p
    a_num = _hll_alpha_num(p)
    return (
        sketch.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.coalesce(
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - rho)")),
                F.lit(0),
            ).alias("_present_sum"),
        )
        .select(
            group_col,
            "n_present",
            (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero"),
            (
                F.col("_present_sum")
                + (F.lit(m) - F.col("n_present")) * F.lit(1 << 49)
            ).alias("s_sum"),
        )
        .select(
            group_col,
            "n_present",
            "n_zero",
            "s_sum",
            F.expr(
                f"CAST(CAST('{a_num}' AS DECIMAL(38,0)) div s_sum AS BIGINT)"
            ).alias("est_n"),
        )
        .withColumn(
            "est_corrected",
            F.when(
                (F.col("n_zero") > 0) & (F.col("est_n") <= int(2.5 * m)),
                F.round(F.lit(m) * F.log(F.lit(m) / F.col("n_zero"))),
            ).otherwise(F.col("est_n").cast("double")),
        )
    )


def bloom_build(
    df: DataFrame, col: str, k: int = 4, m: int = 16384
) -> DataFrame:
    """Portable Bloom filter over ``df[col]``: the present-bit table
    (row, bit) with k md5-derived positions per item (the _cms_bucket
    hash family — a Bloom filter is structurally a Count-Min that stores
    presence instead of counts). ONE distinct per hash row; the result
    is at most k*m rows regardless of input size. Engine-reproducible,
    so the filter itself is oracle-certifiable. Merge shard filters with
    :func:`bloom_merge` (bitwise OR == union distinct) — the 100 TB
    property: each partition ships its present bits, never its items.

    The membership contract: NO false negatives ever (certified as an
    output column of the registered face, not just asserted); false
    positives at the standard (1 - e^(-kn/m))^k rate — the right shape
    for a dedup PRE-filter, where "definitely new" rows skip the exact
    check entirely."""
    from functools import reduce

    parts = [
        df.select(
            F.lit(j).alias("row"),
            _cms_bucket(F.col(col), j, m).alias("bit"),
        )
        for j in range(k)
    ]
    return reduce(DataFrame.unionByName, parts).distinct()


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR shard filters together: union distinct of present bits."""
    from functools import reduce

    return reduce(DataFrame.unionByName, blooms).distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    k: int = 4,
    m: int = 16384,
) -> DataFrame:
    """Membership probe: maybe_member iff ALL k bits are present. The
    bit table is broadcast (<= k*m rows by construction). Returns
    (col, maybe_member); ``NOT maybe_member`` is a guaranteed
    non-member."""
    b = probes.select(
        F.col(col), *[_cms_bucket(F.col(col), j, m) for j in range(k)]
    )
    for j in range(k):
        side = bloom.filter(F.col("row") == j).select(
            F.col("bit").alias(f"b{j}"), F.lit(True).alias(f"p{j}")
        )
        b = b.join(F.broadcast(side), f"b{j}", "left")
    present = [F.coalesce(F.col(f"p{j}"), F.lit(False)) for j in range(k)]
    maybe = present[0]
    for x in present[1:]:
        maybe = maybe & x
    return b.select(F.col(col), maybe.alias("maybe_member"))


def hll_overlap(
    a: DataFrame,
    b: DataFrame,
    col: str,
    p: int = 9,
) -> DataFrame:
    """Set-overlap estimate |A ∩ B| by HLL inclusion–exclusion
    (est_a + est_b − est_union) in ONE scan of each input: rows are
    side-tagged and aggregated to per-(side, register) maxima, then a
    second (register-table-sized) grouping derives all THREE register
    tables at once — side A, side B, and their union (register-wise max
    IS the union sketch, the mergeability property the hll_merge test
    pins). The corpus-vs-corpus dedup triage question ("how much of
    this crawl is already in that one?") at 100 TB: the shuffle carries
    at most 2m register rows, never the keys.

    Every estimate rides the same integer lattice as ``hll_estimate``
    (S = Σ 2^(49-rho), est = A div S — no float anywhere), so the
    inclusion–exclusion difference is certifiable to the last digit.
    Returns one row (est_a, est_b, est_union, est_overlap) with
    est_overlap clamped at 0 (sketch noise can drive the raw
    difference negative)."""
    m = 1 << p
    a_num = _hll_alpha_num(p)
    tagged = (
        a.select(F.col(col).alias("_t"), F.lit(1).alias("_s"))
        .unionByName(b.select(F.col(col).alias("_t"), F.lit(0).alias("_s")))
        # NULL keys would md5 to a NULL register row that skews
        # n_present on both engines; a NULL is not a set member
        .filter(F.col("_t").isNotNull())
    )
    idx, rho = _hll_parts(F.col("_t"), p)
    regs = (
        tagged.select("_s", idx.alias("idx"), rho.alias("rho"))
        .groupBy("_s", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    per_idx = regs.groupBy("idx").agg(
        F.max(F.when(F.col("_s") == 1, F.col("rho"))).alias("ra"),
        F.max(F.when(F.col("_s") == 0, F.col("rho"))).alias("rb"),
        F.max("rho").alias("ru"),
    )
    def _psum(reg: str):
        return F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), 49 - {reg})")),
            F.lit(0),
        )

    agg = per_idx.agg(
        F.count("ra").alias("na"),
        _psum("ra").alias("pa"),
        F.count("rb").alias("nb"),
        _psum("rb").alias("pb"),
        F.count("ru").alias("nu"),
        _psum("ru").alias("pu"),
    )
    big = 1 << 49
    ests = agg.select(
        *[
            F.expr(
                f"CAST(CAST('{a_num}' AS DECIMAL(38,0))"
                f" div (p{s} + ({m} - n{s}) * CAST({big} AS BIGINT))"
                " AS BIGINT)"
            ).alias(f"est_{n}")
            for s, n in (("a", "a"), ("b", "b"), ("u", "union"))
        ]
    )
    return ests.select(
        "est_a",
        "est_b",
        "est_union",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ).alias("est_overlap"),
    )
