"""Unit tests: LOCF resampling semantics and the fixed-point random
projection (determinism, exactness, shape)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    resample_locf,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
    projection_matrix,
    random_projection,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_resample_locf_carries_and_gaps(spark):
    df = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T10:15:00"), 1.0, 1),
            ("u", _ts("2024-01-01T10:45:00"), 2.0, 2),
            # 11:xx empty -> carries 2.0; 13:05 later event
            ("u", _ts("2024-01-01T13:05:00"), 3.0, 3),
        ],
        "user_id string, ts timestamp, value double, event_id long",
    )
    out = {
        r["bucket"]: r["locf_value"]
        for r in resample_locf(
            df, ["user_id"], "ts", "value", tiebreak="event_id"
        ).collect()
    }
    # grid from 10:00 to 13:00 inclusive
    assert len(out) == 4
    assert out[_ts("2024-01-01T10:00:00")] is None  # before first event
    assert out[_ts("2024-01-01T11:00:00")] == 2.0
    assert out[_ts("2024-01-01T12:00:00")] == 2.0
    assert out[_ts("2024-01-01T13:00:00")] == 2.0  # 13:05 is after the tick


def test_resample_locf_event_on_boundary_counts(spark):
    df = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T10:00:00"), 5.0, 1),
            ("u", _ts("2024-01-01T11:00:00"), 6.0, 2),
        ],
        "user_id string, ts timestamp, value double, event_id long",
    )
    out = {
        r["bucket"]: r["locf_value"]
        for r in resample_locf(
            df, ["user_id"], "ts", "value", tiebreak="event_id"
        ).collect()
    }
    # event exactly at the tick instant is included (events sort before grid)
    assert out[_ts("2024-01-01T10:00:00")] == 5.0
    assert out[_ts("2024-01-01T11:00:00")] == 6.0


def test_projection_matrix_deterministic_and_sparse():
    a = projection_matrix(8, 64, seed=42)
    b = projection_matrix(8, 64, seed=42)
    assert a == b
    flat = [x for row in a for x in row]
    assert set(flat) <= {-1, 0, 1}
    # Achlioptas sparsity: about 2/3 zeros
    assert 0.4 < flat.count(0) / len(flat) < 0.9


def test_projection_exact_under_repartition(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, random_projection(df, k=4).collect()))
    b = sorted(map(tuple, random_projection(df.repartition(9), k=4).collect()))
    assert a == b  # fixed-point sums are order-free

    # cross-check one row against a python fixed-point reference
    mat = projection_matrix(4, 64, seed=42)
    vec = dict(rows)[0]
    import numpy as np

    fp = [int(round(float(np.float32(v)) * 1e9)) for v in vec]
    expect = tuple(sum(f * p for f, p in zip(fp, row)) for row in mat)
    got = dict((r[0], tuple(r[1:])) for r in a)[0]
    assert got == expect


def test_cooccurrence_counts_reference(spark):
    from collections import Counter

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        cooccurrence_counts,
    )

    texts = ["a b c a b", "b b", "x", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["token_a"], r["token_b"], r["dist"]): r["n"]
        for r in cooccurrence_counts(df, window=2).collect()
    }
    ref = Counter()
    for t in texts:
        tk = t.split()
        for d in (1, 2):
            for i in range(len(tk) - d):
                ref[(tk[i], tk[i + d], d)] += 1
    assert got == dict(ref)


def test_fuzzy_self_join_matches_bruteforce(spark):
    import itertools

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    names = [
        "small ring", "small rung", "smell ring", "red widget", "red widgets",
        "blue bolt!", "blue bolts", "hot gearbox", "hot gearbix", "cold gearbox",
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_join(df, "id", "name", max_dist=1).collect()
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = sorted(
        (i, j, lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= 1
    )
    assert got == want and len(want) >= 4


def test_fuzzy_self_join_rejects_unsound_params_strict(spark):
    import pytest as _pytest

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    df = spark.createDataFrame([(1, "tiny"), (2, "tin")], "id long, name string")
    with _pytest.raises(ValueError, match="unsound"):
        fuzzy_self_join(df, "id", "name", max_dist=2, q=3, strict=True)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


def test_fuzzy_self_join_total_on_mixed_lengths(spark):
    """Short strings below the q-gram soundness bound no longer raise:
    the short stratum is length-bucket brute-forced, the long stratum
    blocked, and the union is still exact vs brute force — including
    short/short pairs, short/long pairs straddling the bound, and
    1-char strings (deletion to a 2-char neighbor)."""
    import itertools

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    names = [
        "a", "b", "ab", "abc", "abd", "abcd", "abcde", "abcdX",
        "small ring", "small rung", "smell ring",
        "red widget", "red widgets", "hot gearbox", "hot gearbix",
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_join(df, "id", "name", max_dist=1, q=3).collect()
    )
    want = sorted(
        (i, j, _lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if _lev(names[i], names[j]) <= 1
    )
    assert got == want
    # the mix genuinely exercises both strata: short/short ("a"-"b",
    # "ab"-"abc") and blocked-long ("small ring"-"small rung") pairs
    assert (0, 1, 1) in want and (8, 9, 1) in want


def test_fuzzy_self_join_unicode_codepoint_semantics(spark):
    """The OPERATOR's contract is codepoint-level Levenshtein (Spark's
    built-in), certified against a pure-Python model on multi-byte text
    — this is the codepoint half of the r17 fuzzy contract pin: the
    cross-engine faces guard to single-byte input (where DuckDB's
    byte-level levenshtein agrees), and this model test owns the
    non-ASCII semantics the oracle can't express. 'café'→'cafe' is one
    edit (one codepoint substituted, two UTF-8 bytes)."""
    import itertools

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    names = [
        "café", "cafe", "caff", "cafés", "数据", "数掂", "数据库",
        "naïve", "naive", "ü", "u", "résumé", "resume", "résume",
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_join(df, "id", "name", max_dist=1, q=3).collect()
    )
    want = sorted(
        (i, j, _lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if _lev(names[i], names[j]) <= 1
    )
    assert got == want
    # the multi-byte pairs are genuinely present: café/cafe (1 codepoint
    # edit, 2 byte edits — byte-level counting would drop it) and the
    # CJK pair 数据/数掂 (3-byte codepoints)
    assert (0, 1, 1) in want and (4, 5, 1) in want


def test_fuzzy_self_join_unicode_property(spark):
    """Hypothesis: operator == pure-Python codepoint model on corpora
    drawn from a mixed single/multi-byte alphabet, all strata."""
    import itertools

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    alphabet = "abé数ü"

    @given(
        names=st.lists(
            st.text(alphabet=alphabet, min_size=0, max_size=9),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(names):
        df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
        got = sorted(
            (r["id_a"], r["id_b"], r["dist"])
            for r in fuzzy_self_join(df, "id", "name", max_dist=1, q=3).collect()
        )
        want = sorted(
            (i, j, _lev(names[i], names[j]))
            for i, j in itertools.combinations(range(len(names)), 2)
            if _lev(names[i], names[j]) <= 1
        )
        assert got == want

    run()


def test_fuzzy_self_join_empty_schema_follows_id_type(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    df = spark.createDataFrame([], "id string, name string")
    out = fuzzy_self_join(df, "id", "name", max_dist=1)
    assert out.count() == 0
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema) == {
        "id_a": "string", "id_b": "string", "dist": "int",
    }


def test_pagerank_symmetry_and_determinism(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        pagerank_fixed,
    )

    # triangle + pendant: symmetric nodes 1,2 must tie exactly; hub 0
    # outranks them; pendant 3 ranks lowest
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (0, 3)], "id_a long, id_b long"
    )
    r = {row["id"]: row["rank_fp"] for row in pagerank_fixed(pairs, iters=3).collect()}
    assert r[1] == r[2]
    assert r[0] > r[1] > r[3]
    r2 = {
        row["id"]: row["rank_fp"]
        for row in pagerank_fixed(
            spark.createDataFrame(
                [(0, 1), (0, 2), (1, 2), (0, 3)], "id_a long, id_b long"
            ).repartition(5),
            iters=3,
        ).collect()
    }
    assert r == r2  # fixed-point: exact under any partitioning


def test_fuzzy_self_join_empty_input(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    df = spark.createDataFrame([], "id long, name string")
    assert fuzzy_self_join(df, "id", "name", max_dist=1).count() == 0
