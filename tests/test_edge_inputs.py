"""Degenerate-input sweep: empty tables and single-row groups through the
round-7 operator surface. At 100 TB someone WILL feed an empty partition,
an empty delta, or a one-event user into every operator; each must return
an empty/correct frame with the right schema — never crash, never emit a
null-stats row (the ks_drift empty-side ANSI divide-by-zero this sweep
originally caught)."""

from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame([], "doc_id long, text string"),
        "events": spark.createDataFrame(
            [], "user_id long, event_id long, ts timestamp, value double"
        ),
        "pairs": spark.createDataFrame([], "id_a long, id_b long"),
    }


def test_text_ops_empty(spark, empties):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        collocations,
        exact_substring_spans,
        phrase_search,
    )

    assert exact_substring_spans(empties["docs"]).count() == 0
    assert phrase_search(empties["docs"], ["a", "b"]).count() == 0
    assert collocations(empties["docs"]).count() == 0


def test_graph_empty(spark, empties):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )

    out = kcore_peel(empties["pairs"], k=2, iters=2)
    assert out.columns == ["id", "deg"] and out.count() == 0


def test_stats_empty_and_undefined(spark, empties):
    """Empty inputs give EMPTY outputs; a one-sided-empty KS is undefined
    and must emit no row rather than divide by zero under ANSI."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        anomaly_flags,
        exact_quantiles,
        ks_drift,
        trend_slopes,
    )

    ev = empties["events"]
    assert trend_slopes(ev, "user_id", "ts", "value").count() == 0
    assert anomaly_flags(ev, "user_id", "value", "event_id").count() == 0
    assert exact_quantiles(ev, "value", [0.5]).count() == 0
    one = spark.createDataFrame([(1.0,)], "value double")
    assert ks_drift(one, ev.select("value"), "value").count() == 0
    assert ks_drift(ev.select("value"), one, "value").count() == 0
    assert ks_drift(ev.select("value"), ev.select("value"), "value").count() == 0


def test_throttle_empty_and_single(spark, empties):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    ev = empties["events"].select("user_id", "event_id", "ts")
    assert throttle_events(ev, "user_id", "ts", 60, "event_id").count() == 0
    single = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))],
        "user_id long, event_id long, ts timestamp",
    )
    assert throttle_events(single, "user_id", "ts", 60, "event_id").count() == 1


def test_incremental_empty_delta_and_base(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.incremental import (
        merge_partial_aggs,
        partial_agg_state,
    )

    aggs = {"n": ("v", "count"), "s": ("v", "sum")}
    base_rows = spark.createDataFrame([("x", 1.0)], "k string, v double")
    empty = spark.createDataFrame([], "k string, v double")
    base = partial_agg_state(base_rows, ["k"], aggs)
    # empty delta: base unchanged
    got = merge_partial_aggs(base, empty, ["k"], aggs).collect()
    assert [(r["k"], r["n"], r["s"]) for r in got] == [("x", 1, 1.0)]
    # empty base: result == delta's own partial state
    got2 = merge_partial_aggs(
        partial_agg_state(empty, ["k"], aggs), base_rows, ["k"], aggs
    ).collect()
    assert [(r["k"], r["n"], r["s"]) for r in got2] == [("x", 1, 1.0)]


def test_exact_quantiles_degenerate_distributions(spark):
    """All-equal values and a single row: every quantile is the value."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        exact_quantiles,
    )

    same = spark.createDataFrame([(5.0,)] * 10, "value double")
    out = exact_quantiles(same, "value", [0.25, 0.5, 0.99]).collect()
    assert [(r["p"], r["value"]) for r in out] == [
        (0.25, 5.0), (0.5, 5.0), (0.99, 5.0),
    ]
    one = spark.createDataFrame([(7.5,)], "value double")
    out1 = exact_quantiles(one, "value", [0.5]).collect()
    assert [(r["p"], r["value"], r["rank"]) for r in out1] == [(0.5, 7.5, 1)]


def test_anomaly_flags_survives_int64_wrapping_magnitudes(spark):
    """Regression (r8 advice): sy*sy must be DECIMAL-routed BEFORE the
    multiply. With y_fp ~1e10 per row and 100 rows, sy ~1e12 and sy^2
    ~1e24 — far past int64 — so the pre-fix BIGINT product errored under
    ANSI at modest, realistic per-key scale. Flag set is cross-checked
    against the exact-integer inequality computed in Python bigints."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        anomaly_flags,
    )

    vals = [4 * 10**5] * 99 + [8 * 10**5]  # integral: round(v*100) is exact
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    y = [v * 100 for v in vals]
    n, sy, syy = len(y), sum(y), sum(v * v for v in y)
    # the regime: int64 sufficient stats fit, their products do not
    assert syy < 2**63 and sy * sy > 2**63 and n * syy > 2**63
    got = {
        r["event_id"]
        for r in anomaly_flags(df, "user_id", "value", "event_id", k=3).collect()
    }
    want = {
        i for i, v in enumerate(y) if (n * v - sy) ** 2 > 9 * (n * syy - sy * sy)
    }
    assert got == want and got  # non-empty: the spike row is flagged


def test_trend_slopes_survives_int64_wrapping_magnitudes(spark):
    """Regression (r8 advice): num AND den operand-cast to DECIMAL(38,0)
    before multiplying. 100 points over a ~3-year span with y_fp ~1e8
    puts n*sxy, sx*sy and n*sxx past int64 while the int64 sufficient
    statistics themselves still fit — exactly the regime where the
    pre-fix late cast arrived after the wrap. Slope cross-checked
    against exact Python integer math (div truncates toward zero)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        trend_slopes,
    )

    base = dt.datetime(2020, 1, 1)
    xs = [i * 10**6 for i in range(100)]  # 0 .. ~3.1 years, whole seconds
    ys = [100_000 + 1_987 * i for i in range(100)]  # integral values
    rows = [
        (1, base + dt.timedelta(seconds=x), float(v)) for x, v in zip(xs, ys)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = trend_slopes(df, "user_id", "ts", "value").collect()
    y = [v * 100 for v in ys]
    n = len(xs)
    sx, sy = sum(xs), sum(y)
    sxy = sum(a * b for a, b in zip(xs, y))
    sxx = sum(a * a for a in xs)
    # the regime: int64 sufficient stats fit, their products do not
    assert max(sxy, sxx) < 2**63
    assert n * sxy > 2**63 and sx * sy > 2**63 and n * sxx > 2**63
    num, den = (n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx
    want = abs(num) // abs(den) * (1 if (num >= 0) == (den >= 0) else -1)
    assert [(r["user_id"], r["n"], r["slope_fp"]) for r in got] == [(1, n, want)]


def test_ks_drift_ignores_nulls(spark):
    """Regression (r8 advice): NULL values are excluded before counting —
    previously they inflated n_a/n_b and landed in bucket 0, with Spark
    and DuckDB disagreeing on NULL sort position. The result over a
    NULL-bearing input must equal the result over its non-null subset."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift,
    )

    a = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,), (None,)], "v double"
    )
    b = spark.createDataFrame([(2.0,), (None,), (4.0,)], "v double")
    got = ks_drift(a, b, "v").collect()[0]
    clean = ks_drift(
        a.filter("v IS NOT NULL"), b.filter("v IS NOT NULL"), "v"
    ).collect()[0]
    assert (got["n_a"], got["n_b"]) == (3, 2)
    assert got.asDict() == clean.asDict()


def test_grouped_quantiles_matches_bruteforce_and_boundary_ranks(spark):
    """grouped_quantiles == per-group sorted-list selection at
    rank = ceil(p*n), including p that lands EXACTLY on an integer rank
    (p=0.5, n even — the float-ceil boundary the basis-point integer
    math exists for), and singleton groups."""
    import math
    import random

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    rng = random.Random(8)
    rows = [("a", round(rng.uniform(1, 50), 2)) for _ in range(40)]  # even n
    rows += [("b", round(rng.uniform(-10, 10), 2)) for _ in range(7)]
    rows += [("solo", 3.14)]
    df = spark.createDataFrame(rows, "k string, value double")
    ps = [0.0, 0.25, 0.5, 0.9]
    got = {
        (r["k"], r["p"]): (r["value"], r["rank"], r["n"])
        for r in grouped_quantiles(df, "k", "value", ps).collect()
    }
    by_k: dict[str, list[float]] = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        vals.sort()
        for p in ps:
            rank = max(1, math.ceil(round(p * 10000) * len(vals) / 10000))
            assert got[(k, p)] == (vals[rank - 1], rank, len(vals)), (k, p)
    assert len(got) == len(by_k) * len(ps)


def test_validate_lattice_guard(spark):
    """The fixed-point contract (r8 verdict task 7): cents-aligned data
    passes, continuous data fails fast with the measured violation, and
    NULLs/empty inputs are tolerated."""
    import pytest

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        LatticeViolation,
        lattice_deviation,
        validate_lattice,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    cents = spark.createDataFrame(
        [("a", 1.25), ("a", 0.01), ("b", 317.40), ("b", None)],
        "k string, v double",
    )
    validate_lattice(cents, "v", 100)  # must not raise
    row = lattice_deviation(cents, "v", 100).collect()[0]
    assert (row["n_values"], row["n_off_lattice"]) == (3, 0)

    cont = spark.createDataFrame(
        [("a", 1.25), ("a", 1.0 / 3.0)], "k string, v double"
    )
    with pytest.raises(LatticeViolation, match="1/2 values off-lattice"):
        validate_lattice(cont, "v", 100)
    # wired into BOTH quantile operators under the flag. The grouped
    # guard is FUSED into the compaction aggregate (r17 verdict task 2:
    # no separate pre-scan), so the violation surfaces at ACTION time as
    # USER_RAISED_EXCEPTION carrying the LatticeViolation message.
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="off-lattice"):
        grouped_quantiles(cont, "k", "v", [0.5], validate=True).collect()
    # on-lattice data passes through the fused guard untouched
    ok = grouped_quantiles(cents, "k", "v", [0.5], validate=True).collect()
    assert {(r["k"], r["value"]) for r in ok} == {("a", 0.01), ("b", 317.40)}
    # weighted path carries the same fused guard
    from pyspark.sql import functions as F

    wcont = cont.withColumn("w", F.lit(2))
    with pytest.raises(SparkRuntimeException, match="off-lattice"):
        grouped_quantiles(
            wcont, "k", "v", [0.5], weight_col="w", validate=True
        ).collect()
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        exact_quantiles,
    )

    with pytest.raises(LatticeViolation):
        exact_quantiles(cont, "v", [0.5], validate=True)
    # empty input: vacuously on-lattice
    validate_lattice(cents.filter("v > 1e9"), "v", 100)


def test_grouped_quantiles_plan_is_two_exchanges_no_collect(spark):
    """The grouped operator's plan: the (key,value) count shuffle, the
    per-key window exchange, and nothing else — no cartesian, no
    driver-side control flow (the global exact_quantiles' collect is
    exactly what this operator eliminates)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    df = spark.createDataFrame(
        [("g", float(i % 13)) for i in range(100)], "k string, value double"
    )
    plan = (
        grouped_quantiles(df, "k", "value", [0.5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan
    assert plan.count("Exchange") <= 2
    # validate=True fuses the lattice guard into the same plan: the
    # deviation folds ride the existing cell aggregate and w_all window —
    # same exchange count, still one scan, still zero driver collects
    vplan = (
        grouped_quantiles(df, "k", "value", [0.5], validate=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in vplan
    assert vplan.count("Exchange") <= 2
    assert vplan.count("Scan ExistingRDD") <= plan.count("Scan ExistingRDD")


def test_grouped_quantiles_bucketed_prefix_sum_is_nbuckets_independent(spark):
    """r18: n_buckets > 1 switches to the two-phase bucketed prefix sum
    (bucket-local windows + per-key offsets). Bucket boundaries only move
    WHERE the cumulative sum splits, never its value, so the result must
    be identical to the single-window default for every n_buckets —
    plain, weighted, and the fused lattice guard alike."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.lattice import (
        LatticeViolation,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    rows = [
        ("a", float((i * 7) % 41) / 4 * 0.04, (i % 5) + 1) for i in range(500)
    ] + [("b", float(i % 3), 2) for i in range(40)] + [("c", 9.25, 1)]
    df = spark.createDataFrame(rows, "k string, value double, w long")
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]

    def run(**kw):
        out = grouped_quantiles(df, "k", "value", ps, **kw)
        got = sorted(map(tuple, out.collect()))
        release_plan_caches(out)
        return got

    base = run()
    base_w = run(weight_col="w")
    for nb in (2, 4, 64):
        assert run(n_buckets=nb) == base
        assert run(n_buckets=nb, weight_col="w") == base_w
    # the fused guard still raises on off-lattice data through the
    # bucketed path (the offsets window carries the per-key deviation)
    import pytest
    from py4j.protocol import Py4JJavaError

    cont = spark.createDataFrame(
        [("a", 0.005), ("a", 1.0)], "k string, value double"
    )
    # r19 (ADVICE): the raises tuple must not include bare Exception —
    # the in-plan raise_error surfaces as SparkRuntimeException
    # (USER_RAISED_EXCEPTION, PySpark converts the Py4JJavaError), the
    # eager path as LatticeViolation; a bare Exception would let any
    # error whose message mentions 'lattice' pass. The failing collect
    # also releases the n_buckets>1 persisted counts cache.
    from pyspark.errors import SparkRuntimeException

    out = grouped_quantiles(
        cont, "k", "value", [0.5], validate=True, n_buckets=4
    )
    try:
        with pytest.raises(
            (LatticeViolation, SparkRuntimeException, Py4JJavaError)
        ) as ei:
            out.collect()
    finally:
        release_plan_caches(out)
    assert "lattice" in str(ei.value).lower()


def test_simpson_diversity_exact_rational_and_degenerate_groups(spark):
    """Hand-computed Gini–Simpson: group 'x' = [a,a,b] -> num = 2·1 = 2,
    den = 3·2 = 6, D = 1 - 2/6; uniform pair -> D = 1; a single-row
    group and an all-same group pin the NULL / 0.0 boundaries."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        simpson_diversity,
    )

    rows = [
        ("x", "a"), ("x", "a"), ("x", "b"),
        ("u", "a"), ("u", "b"),
        ("solo", "a"),
        ("mono", "a"), ("mono", "a"),
    ]
    df = spark.createDataFrame(rows, "k string, cat string")
    got = {
        r["k"]: (r["n_rows"], r["n_cats"], r["diversity"])
        for r in simpson_diversity(df, "k", "cat").collect()
    }
    assert got["x"] == (3, 2, 1.0 - 2.0 / 6.0)
    assert got["u"] == (2, 2, 1.0)
    assert got["solo"] == (1, 1, None)
    assert got["mono"] == (2, 1, 0.0)


def test_ks_drift_by_key_matches_bruteforce_ecdf(spark):
    """Per-segment KS == brute-force ECDF sup computed from sorted lists
    per key; a key present only on one side emits no row."""
    import random

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift_by_key,
    )

    rng = random.Random(88)
    a_rows = [("x", round(rng.uniform(0, 10), 1)) for _ in range(30)]
    a_rows += [("y", round(rng.uniform(0, 10), 1)) for _ in range(11)]
    a_rows += [("a_only", 1.0)]
    b_rows = [("x", round(rng.uniform(3, 13), 1)) for _ in range(25)]
    b_rows += [("y", round(rng.uniform(0, 10), 1)) for _ in range(17)]
    b_rows += [("b_only", 2.0)]
    a = spark.createDataFrame(a_rows, "k string, value double")
    b = spark.createDataFrame(b_rows, "k string, value double")
    got = {
        r["k"]: (r["n_a"], r["n_b"], r["d_cross"], r["d_fp"])
        for r in ks_drift_by_key(a, b, "k", "value").collect()
    }
    assert set(got) == {"x", "y"}
    for k in ("x", "y"):
        va = sorted(v for kk, v in a_rows if kk == k)
        vb = sorted(v for kk, v in b_rows if kk == k)
        na, nb = len(va), len(vb)
        pooled = sorted(set(va) | set(vb))
        d_cross = max(
            abs(
                sum(1 for v in va if v <= x) * nb
                - sum(1 for v in vb if v <= x) * na
            )
            for x in pooled
        )
        assert got[k] == (na, nb, d_cross, d_cross * 1_000_000 // (na * nb)), k


def test_weighted_quantiles_matches_expanded_bruteforce(spark):
    """Weighted grouped_quantiles == unweighted selection over the
    weight-EXPANDED multiset (each row repeated weight times), the
    defining property of a weighted quantile. Zero-weight rows
    contribute nothing."""
    import math
    import random

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    rng = random.Random(80)
    rows = [
        ("g1", round(rng.uniform(1, 9), 2), rng.randint(0, 5))
        for _ in range(60)
    ] + [("g2", 4.0, 3), ("g2", 2.0, 1)]
    df = spark.createDataFrame(rows, "k string, value double, w long")
    ps = [0.5, 0.9]
    got = {
        (r["k"], r["p"]): (r["value"], r["rank"], r["n"])
        for r in grouped_quantiles(
            df, "k", "value", ps, weight_col="w"
        ).collect()
    }
    expanded: dict[str, list[float]] = {}
    for k, v, w in rows:
        expanded.setdefault(k, []).extend([v] * w)
    for k, vals in expanded.items():
        vals.sort()
        for p in ps:
            rank = math.ceil(round(p * 10000) * len(vals) / 10000)
            assert got[(k, p)] == (vals[rank - 1], rank, len(vals)), (k, p)


def test_grouped_quantiles_and_hll_overlap_ignore_nulls(spark):
    """NULL values/weights/keys contribute nothing: a NULL lattice point
    would ride the ordered window where Spark (NULLS FIRST) and DuckDB
    (NULLS LAST) disagree, and a NULL set member would fabricate an HLL
    register row on both engines."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_overlap,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", None, 5), ("g", 3.0, None), ("g", 2.0, 2)],
        "k string, value double, w long",
    )
    out = grouped_quantiles(df, "k", "value", [0.5]).collect()
    assert [(r["value"], r["n"]) for r in out] == [(2.0, 3)]  # NULL row gone
    outw = grouped_quantiles(df, "k", "value", [0.5], weight_col="w").collect()
    assert [(r["value"], r["n"]) for r in outw] == [(2.0, 3)]  # w=1 + w=2

    a = spark.createDataFrame([("x",), (None,)], "k string")
    b = spark.createDataFrame([("x",), (None,)], "k string")
    clean = hll_overlap(
        a.filter("k IS NOT NULL"), b.filter("k IS NOT NULL"), "k"
    ).collect()[0]
    dirty = hll_overlap(a, b, "k").collect()[0]
    assert clean.asDict() == dirty.asDict()


def test_exact_quantiles_excludes_nulls_from_ranks(spark):
    """Regression (r9 advice): NULL value rows must not count into n —
    pre-fix they shifted every rank (rank = ceil(p*n) over a count that
    included rows that can never be selected), diverging from
    grouped_quantiles' NULL handling."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        exact_quantiles,
    )

    rows = [(float(i),) for i in range(1, 10)] + [(None,)] * 6
    df = spark.createDataFrame(rows, "value double")
    out = exact_quantiles(df, "value", [0.5, 1.0]).collect()
    # n = 9 (NULLs excluded): median rank ceil(0.5*9)=5 -> 5.0; pre-fix
    # n = 15 gave rank 8 -> 8.0 for p=0.5 and an out-of-range rank 15
    # for p=1.0 (no row produced).
    assert [(r["p"], r["value"], r["rank"]) for r in out] == [
        (0.5, 5.0, 5),
        (1.0, 9.0, 9),
    ]
