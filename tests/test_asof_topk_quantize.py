"""Unit tests for the round-5b operator family: as-of join semantics
(inclusive/strict/tolerance/tie/null-payload), keep_topk, embedding
quantization bounds, and normalize_text dedup behavior."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    asof_join,
    keep_topk,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
    quantize_embeddings,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
    normalize_text,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00"), 100.0),
            (2, "u1", _ts("2024-01-01T12:00:00"), 200.0),
            (3, "u2", _ts("2024-01-01T11:00:00"), 300.0),
            (4, "u3", _ts("2024-01-01T09:00:00"), 400.0),  # no right rows
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01T09:30:00"), 1.0),
            (11, "u1", _ts("2024-01-01T10:00:00"), 2.0),  # exact-match tie w/ left 1
            (12, "u1", _ts("2024-01-01T10:00:00"), 3.0),  # same ts, higher id wins
            (13, "u1", _ts("2024-01-01T11:30:00"), 4.0),
            (14, "u2", _ts("2024-01-01T10:59:59"), 5.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    return left, right


def _collect(df):
    return {r["event_id"]: r for r in df.collect()}


def test_asof_inclusive_backward(asof_frames):
    left, right = asof_frames
    out = _collect(
        asof_join(left, right, ["user_id"], "ts", ["value"], tiebreak="event_id")
    )
    # exact match allowed; among the two ts=10:00 right rows, event_id 12 wins
    assert out[1]["asof_value"] == 3.0
    assert out[1]["asof_ts"] == _ts("2024-01-01T10:00:00")
    # most recent at-or-before 12:00 is 11:30
    assert out[2]["asof_value"] == 4.0
    assert out[3]["asof_value"] == 5.0
    # no right rows for u3 -> nulls
    assert out[4]["asof_value"] is None and out[4]["asof_ts"] is None


def test_asof_strict_excludes_exact(asof_frames):
    left, right = asof_frames
    out = _collect(
        asof_join(
            left,
            right,
            ["user_id"],
            "ts",
            ["value"],
            tiebreak="event_id",
            allow_exact_matches=False,
        )
    )
    # ts=10:00 rights no longer visible to left@10:00 -> falls back to 09:30
    assert out[1]["asof_value"] == 1.0


def test_asof_tolerance(asof_frames):
    left, right = asof_frames
    out = _collect(
        asof_join(
            left,
            right,
            ["user_id"],
            "ts",
            ["value"],
            tiebreak="event_id",
            tolerance_seconds=600,
        )
    )
    # left 2 @12:00 matched 11:30 (1800s ago) -> outside 600s tolerance
    assert out[2]["asof_value"] is None
    # left 3 @11:00 matched 10:59:59 (1s) -> kept
    assert out[3]["asof_value"] == 5.0


def test_asof_null_payload_does_not_mix_rows(spark):
    """A right row with a NULL payload field must still win (struct carry);
    per-column last(ignorenulls) would wrongly surface the older row's
    value next to the newer row's ts."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T10:00:00"), 7.0, 20),
            ("u", _ts("2024-01-01T11:00:00"), None, 21),
        ],
        "user_id string, ts timestamp, value double, event_id long",
    )
    row = asof_join(
        left, right, ["user_id"], "ts", ["value"], tiebreak="event_id"
    ).collect()[0]
    assert row["asof_ts"] == _ts("2024-01-01T11:00:00")
    assert row["asof_value"] is None  # from the 11:00 row, not 10:00's 7.0


def test_asof_deterministic_under_repartition(asof_frames):
    left, right = asof_frames
    a = asof_join(left, right, ["user_id"], "ts", ["value"], tiebreak="event_id")
    b = asof_join(
        left.repartition(7),
        right.repartition(5),
        ["user_id"],
        "ts",
        ["value"],
        tiebreak="event_id",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_keep_topk(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 5)) for i in range(20)] + [("b", 99, 9.0)],
        "grp string, id long, score double",
    )
    out = keep_topk(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], k=3,
        rank_col="rnk",
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append((r["rnk"], r["id"], r["score"]))
    assert len(by_grp["a"]) == 3
    # score 4.0 rows are ids 4,9,14,19 -> lowest ids win
    assert sorted(by_grp["a"]) == [(1, 4, 4.0), (2, 9, 4.0), (3, 14, 4.0)]
    assert by_grp["b"] == [(1, 99, 9.0)]


def test_quantize_roundtrip_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, codes 0
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    r1 = rows[1]
    assert r1["scale"] == 1.0
    assert r1["qvec"] == [64, -127, 32, 0]  # floor(0.5*127+0.5)=64
    # reconstruction error bounded by half a code step
    assert r1["max_err"] <= r1["scale"] / 127.0 * 0.5 + 1e-12
    r2 = rows[2]
    assert r2["scale"] == 0.0 and r2["qvec"] == [0, 0, 0, 0] and r2["max_err"] == 0.0


def test_quantize_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0])], "vec_id long, embedding array<float>"
    )
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_text_collapses_punct_and_case(spark):
    df = spark.createDataFrame(
        [("Hello,  WORLD!!", 1), ("hello world", 2), ("hello-world.", 3)],
        "text string, doc_id long",
    )
    out = (
        df.select(F.md5(normalize_text(F.col("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 3


def test_prefix_filter_equivalent_to_naive_jaccard(spark):
    """ppjoin prefix filtering must be a pure physical optimization:
    identical (id_a, id_b, jaccard) output to the naive shingle join."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        load_table,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    naive = sorted(map(tuple, ngram_jaccard_pairs(d, threshold=0.5).collect()))
    pref = sorted(
        map(tuple, ngram_jaccard_pairs_prefix(d, threshold=0.5).collect())
    )
    assert naive == pref and len(naive) > 0


def test_containment_catches_subset_duplicate(spark):
    """A short doc fully embedded in a long one: low Jaccard, containment 1."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"tok{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    cont = containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert jac == []  # union-normalized similarity misses it


def test_asof_matches_pandas_merge_asof(spark):
    """Independent oracle: pandas merge_asof (by=key, backward) on random
    data must agree with the Spark operator wherever the match is
    unambiguous (pandas leaves equal-ts right ties unspecified, so right
    timestamps are made unique per key here)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    base = np.datetime64("2024-01-01T00:00:00")
    lts = base + rng.choice(100_000, 300, replace=False).astype("timedelta64[s]")
    rts = base + rng.choice(100_000, 200, replace=False).astype("timedelta64[s]")
    lp = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": rng.integers(0, 5, 300),
            "ts": lts,
            "value": rng.uniform(0, 10, 300).round(3),
        }
    ).sort_values("ts")
    rp = pd.DataFrame(
        {
            "event_id": np.arange(1000, 1200),
            "user_id": rng.integers(0, 5, 200),
            "ts": rts,
            "value": rng.uniform(0, 10, 200).round(3),
        }
    ).sort_values("ts")
    # per-key-unique right timestamps: drop dup (user_id, ts)
    rp = rp.drop_duplicates(["user_id", "ts"])

    expected = pd.merge_asof(
        lp,
        rp[["user_id", "ts", "value"]].rename(
            columns={"ts": "asof_ts", "value": "asof_value"}
        ),
        left_on="ts",
        right_on="asof_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("event_id")

    got = (
        asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            ["user_id"],
            "ts",
            ["value"],
            tiebreak="event_id",
        )
        .toPandas()
        .sort_values("event_id")
    )
    for col in ("asof_ts", "asof_value"):
        g, e = got[col].to_numpy(), expected[col].to_numpy()
        both_na = pd.isna(got[col]).to_numpy() & pd.isna(expected[col]).to_numpy()
        assert ((g == e) | both_na).all(), col


def test_asof_forward_and_nearest(asof_frames):
    left, right = asof_frames
    fwd = _collect(
        asof_join(
            left, right, ["user_id"], "ts", ["value"],
            tiebreak="event_id", direction="forward",
        )
    )
    # left 1 @10:00: earliest at-or-after is ts=10:00; min event_id (11) wins
    assert fwd[1]["asof_value"] == 2.0
    # left 2 @12:00: nothing after -> null
    assert fwd[2]["asof_value"] is None
    # left 4 (u3): no right rows at all
    assert fwd[4]["asof_value"] is None

    near = _collect(
        asof_join(
            left, right, ["user_id"], "ts", ["value"],
            tiebreak="event_id", direction="nearest",
        )
    )
    # left 2 @12:00: backward 11:30 is the only candidate
    assert near[2]["asof_value"] == 4.0
    # left 3 (u2) @11:00: backward 10:59:59 (1s) is nearest
    assert near[3]["asof_value"] == 5.0


def test_asof_forward_nearest_match_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    base = np.datetime64("2024-01-01T00:00:00")
    lts = base + rng.choice(50_000, 200, replace=False).astype("timedelta64[s]")
    rts = base + rng.choice(50_000, 150, replace=False).astype("timedelta64[s]")
    lp = pd.DataFrame(
        {
            "event_id": np.arange(200),
            "user_id": rng.integers(0, 4, 200),
            "ts": lts,
        }
    ).sort_values("ts")
    rp = (
        pd.DataFrame(
            {
                "user_id": rng.integers(0, 4, 150),
                "ts": rts,
                "value": rng.uniform(0, 10, 150).round(3),
                "event_id": np.arange(1000, 1150),
            }
        )
        .sort_values("ts")
        .drop_duplicates(["user_id", "ts"])
    )
    for direction in ("forward", "nearest", "backward"):
        for exact in (True, False):
            if direction == "nearest" and not exact:
                continue  # pandas disallows the combination
            expected = pd.merge_asof(
                lp,
                rp[["user_id", "ts", "value"]].rename(
                    columns={"ts": "asof_ts", "value": "asof_value"}
                ),
                left_on="ts",
                right_on="asof_ts",
                by="user_id",
                direction=direction,
                allow_exact_matches=exact,
            ).sort_values("event_id")
            got = (
                asof_join(
                    spark.createDataFrame(lp),
                    spark.createDataFrame(rp),
                    ["user_id"],
                    "ts",
                    ["value"],
                    tiebreak="event_id",
                    direction=direction,
                    allow_exact_matches=exact,
                )
                .toPandas()
                .sort_values("event_id")
            )
            for col in ("asof_ts", "asof_value"):
                g, e = got[col].to_numpy(), expected[col].to_numpy()
                both_na = pd.isna(got[col]).to_numpy() & pd.isna(expected[col]).to_numpy()
                assert ((g == e) | both_na).all(), (direction, exact, col)


def test_asof_subsecond_timestamps_match_pandas(spark):
    """Microsecond-resolution cross-check: the events table carries
    sub-second timestamps, and whole-second truncation (the pre-r6 bug)
    can tie/invert nearest distances when candidates sit within ~2s of
    each other, and misjudge tolerance by up to ~1s. Dense microsecond
    offsets force many such near-ties; distances must be microsecond-
    exact to agree with pandas."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(41)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # all timestamps inside a 30-second span -> nearest candidates
    # routinely within 2s of each other, fractional parts everywhere
    lus = rng.choice(30_000_000, 250, replace=False).astype("timedelta64[us]")
    rus = rng.choice(30_000_000, 180, replace=False).astype("timedelta64[us]")
    lp = pd.DataFrame(
        {"event_id": np.arange(250), "user_id": rng.integers(0, 4, 250),
         "ts": base + lus}
    ).sort_values("ts")
    rp = (
        pd.DataFrame(
            {"user_id": rng.integers(0, 4, 180), "ts": base + rus,
             "value": rng.uniform(0, 10, 180).round(3),
             "event_id": np.arange(1000, 1180)}
        )
        .sort_values("ts")
        .drop_duplicates(["user_id", "ts"])
    )
    cases = [("backward", None), ("forward", None), ("nearest", None),
             ("nearest", 2), ("backward", 1)]
    for direction, tol in cases:
        expected = pd.merge_asof(
            lp,
            rp[["user_id", "ts", "value"]].rename(
                columns={"ts": "asof_ts", "value": "asof_value"}
            ),
            left_on="ts",
            right_on="asof_ts",
            by="user_id",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values("event_id")
        got = (
            asof_join(
                spark.createDataFrame(lp),
                spark.createDataFrame(rp),
                ["user_id"],
                "ts",
                ["value"],
                tiebreak="event_id",
                direction=direction,
                tolerance_seconds=tol,
            )
            .toPandas()
            .sort_values("event_id")
        )
        for col in ("asof_ts", "asof_value"):
            g, e = got[col].to_numpy(), expected[col].to_numpy()
            both_na = pd.isna(got[col]).to_numpy() & pd.isna(expected[col]).to_numpy()
            assert ((g == e) | both_na).all(), (direction, tol, col)


def test_asof_nearest_single_exchange(asof_frames):
    """nearest computes both directional carries over ONE hash exchange
    (two local sorts), never a second shuffle or a range join."""
    import re

    left, right = asof_frames
    plan = (
        asof_join(
            left, right, ["user_id"], "ts", ["value"],
            tiebreak="event_id", direction="nearest",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert plan.count("Window") == 2
