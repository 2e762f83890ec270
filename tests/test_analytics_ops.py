"""Model tests for the round-8b analytics operators.

Parity alone certifies agreement, not meaning (the floor-division
lesson, DESIGN.md): every operator here is additionally checked against
an independent brute-force Python model on synthetic inputs, including
the partitioning sweeps that the shared-testdata parity can't vary.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import rrf_fuse
from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    bfs_hops,
    decayed_scores,
    grouped_low_median,
    heavy_hitters,
    mad_anomalies,
    sorted_neighborhood_pairs,
)


# ---------------------------------------------------------------- heavy hitters
def _brute_hh(values, support_inv):
    n = len(values)
    thr = (n + support_inv - 1) // support_inv
    from collections import Counter

    return {v: c for v, c in Counter(values).items() if c >= thr}


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_heavy_hitters_exact_under_repartition(spark, parts):
    """The MG candidate pass may over-select but the recount must give
    the exact answer for EVERY partitioning and batch order."""
    rng = random.Random(7)
    # zipf-ish skew: a few giants, a long tail
    vals = (
        ["alpha"] * 400
        + ["beta"] * 150
        + ["gamma"] * 60
        + [f"tail{rng.randrange(500)}" for _ in range(800)]
    )
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(parts)
    got = {
        r["x"]: r["freq"] for r in heavy_hitters(df, "x", support_inv=20).collect()
    }
    assert got == _brute_hh(vals, 20)


def test_heavy_hitters_small_mg_budget_still_exact(spark):
    """Even an undersized MG budget (k < 2T, superset guarantee void for
    adversarial splits) must never produce a WRONG count — only the
    threshold filter decides membership, and on this skew the giants
    survive any per-partition summary of k >= 2."""
    vals = ["big"] * 900 + [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(4)
    got = {
        r["x"]: r["freq"]
        for r in heavy_hitters(
            df, "x", 10, mg_k=4, allow_undersized=True
        ).collect()
    }
    assert got == {"big": 900}
    # without the explicit opt-in, an undersized budget must fail loudly
    # instead of silently voiding the exactness guarantee
    with pytest.raises(ValueError, match="allow_undersized"):
        heavy_hitters(df, "x", 10, mg_k=4)


def test_heavy_hitters_nulls_and_empty(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    assert heavy_hitters(df, "x", 2).count() == 0


# ------------------------------------------------------------------------- bfs
def _brute_bfs(edges, seeds, max_hops):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


def test_bfs_hops_matches_model(spark):
    rng = random.Random(11)
    edges = sorted({
        (rng.randrange(40), rng.randrange(40)) for _ in range(60)
    })
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(0,), (1,)], "node bigint")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, seeds, 3).collect()}
    assert got == _brute_bfs(edges, [0, 1], 3)


def test_bfs_zero_hops_is_seed_set(spark):
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,)], "node bigint")
    assert bfs_hops(e, seeds, 0).collect() == [Row(node=1, hops=0)]


# ----------------------------------------------------------------------- decay
def test_decayed_scores_matches_model(spark):
    rows = [
        ("a", "2024-03-01"),
        ("a", "2024-03-01"),
        ("a", "2024-02-25"),
        ("b", "2024-02-28"),
        ("b", "2024-01-20"),  # outside 30d horizon relative to 03-01
    ]
    df = spark.createDataFrame(rows, "k string, d string").select(
        "k", F.to_timestamp("d").alias("ts")
    )
    got = {
        r["k"]: r["score_fp"]
        for r in decayed_scores(df, "k", "ts", half_life_days=2, horizon_days=30).collect()
    }
    # max_b = 14; ages relative to 2024-03-01: 0,0,5,2,41(dropped)
    def w(age):
        return 1 << (14 - age // 2)

    assert got == {"a": w(0) + w(0) + w(5), "b": w(2)}


# ------------------------------------------------------------------ median/MAD
def _low_median_model(xs):
    xs = sorted(xs)
    return xs[(len(xs) + 1) // 2 - 1]  # ceil(n/2)-th order statistic


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grouped_low_median_model(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"k{rng.randrange(4)}", rng.randrange(-50, 50))
        for _ in range(rng.randrange(1, 300))
    ]
    df = spark.createDataFrame(rows, "k string, x bigint")
    got = {r["k"]: r["med"] for r in grouped_low_median(df, "k", "x").collect()}
    by_k = {}
    for k, x in rows:
        by_k.setdefault(k, []).append(x)
    assert got == {k: _low_median_model(v) for k, v in by_k.items()}


def test_mad_anomalies_model(spark):
    # one tight cluster with two gross outliers
    xs = [100, 101, 102, 99, 98, 100, 100, 500, -300]
    df = spark.createDataFrame([("g", x) for x in xs], "k string, x bigint")
    row = mad_anomalies(df, "k", "x", mult=3).collect()[0]
    med = _low_median_model(xs)
    mad = _low_median_model([abs(x - med) for x in xs])
    assert row["med_fp"] == med and row["mad_fp"] == mad
    assert row["n"] == len(xs)
    assert row["n_anomalies"] == sum(abs(x - med) > 3 * mad for x in xs)
    # the 3σ rule would be dragged by the outliers; MAD must flag exactly
    # the two gross points here
    assert row["n_anomalies"] == 2


def test_median_and_ks_bucketed_prefix_sum_is_n_buckets_independent(spark):
    """r19 (VERDICT r18 task 5): the bucketed two-phase prefix sum ported
    to grouped_low_median / mad_anomalies / ks_drift_by_key must be
    bit-identical to the single-window default for every n_buckets —
    bucket boundaries only move WHERE the running counts split, never
    their values. Duplicated lattice points sit on the boundary ties on
    purpose; a released cache handle rides every bucketed result."""
    import random

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        release_plan_caches,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift_by_key,
    )

    rng = random.Random(19)
    rows = [
        (f"k{rng.randrange(3)}", rng.randrange(-20, 20)) for _ in range(400)
    ] + [("solo", 7)]
    df = spark.createDataFrame(rows, "k string, x bigint")

    def med(**kw):
        out = grouped_low_median(df, "k", "x", **kw)
        got = sorted(map(tuple, out.collect()))
        release_plan_caches(out)
        return got

    def madp(**kw):
        out = mad_anomalies(df, "k", "x", mult=3, **kw)
        got = sorted(map(tuple, out.collect()))
        release_plan_caches(out)
        return got

    base_med, base_mad = med(), madp()
    for nb in (2, 4, 64):
        assert med(n_buckets=nb) == base_med
        assert madp(n_buckets=nb) == base_mad

    a_rows = [("x", float(rng.randrange(0, 40)) / 2) for _ in range(120)]
    b_rows = [("x", float(rng.randrange(10, 50)) / 2) for _ in range(90)]
    a_rows += [("y", 1.5), ("y", 2.0), ("y", 2.0)]
    b_rows += [("y", 2.0), ("y", 3.5)]
    a = spark.createDataFrame(a_rows, "k string, value double")
    b = spark.createDataFrame(b_rows, "k string, value double")

    def ks(**kw):
        out = ks_drift_by_key(a, b, "k", "value", **kw)
        got = sorted(map(tuple, out.collect()))
        release_plan_caches(out)
        return got

    base_ks = ks()
    for nb in (2, 4, 64):
        assert ks(n_buckets=nb) == base_ks


# --------------------------------------------------------- sorted neighborhood
def test_sorted_neighborhood_model(spark):
    docs = [
        (1, "the quick brown fox"),
        (2, "the quick brown foxes"),
        (3, "the quick brown fox"),  # exact dup of 1, same block
        (4, "zebra stripes pattern"),
        (5, "zebra stripes patterns here"),
        (6, "completely different text entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    pairs = sorted_neighborhood_pairs(
        df, "doc_id", "text", window=2, block_prefix=2, key_prefix=10, min_pct=50
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # block 'th': ids 1,2,3 share the 10-char key 'thequickbr', so the
    # sort is id order [1,2,3] -> window-2 pairs (1,2),(1,3),(2,3), all
    # >=50% jaccard. block 'ze': {zebra,stripes,pattern} vs
    # {zebra,stripes,patterns,here} is 2/5 = 40% -> filtered at 50.
    assert got == {(1, 2), (1, 3), (2, 3)}
    for r in pairs:
        assert 100 * r["n_inter"] >= 50 * r["n_union"] and r["n_union"] > 0
    # at min_pct=40 the zebra pair qualifies (2/5 exactly)
    low = sorted_neighborhood_pairs(
        df, "doc_id", "text", window=2, block_prefix=2, key_prefix=10, min_pct=40
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in low} == {(1, 2), (1, 3), (2, 3), (4, 5)}


def test_sorted_neighborhood_no_cross_block_pairs(spark):
    docs = [(1, "aaaa xx"), (2, "bbbb xx")]  # different blocks, similar tail
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    assert (
        sorted_neighborhood_pairs(df, "doc_id", "text", window=3, min_pct=10).count()
        == 0
    )


# ------------------------------------------------------------------------- rrf
def test_rrf_fuse_model(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id bigint, rank bigint")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id bigint, rank bigint")
    got = {
        r["doc_id"]: (r["rrf_fp"], r["n_lists"])
        for r in rrf_fuse([a, b], topn=10).collect()
    }
    s = 10**9
    assert got == {
        10: (s // 61, 1),
        20: (s // 62 + s // 61, 2),
        30: (s // 63, 1),
        40: (s // 62, 1),
    }
    # doc 20 (in both lists) must outrank every single-list doc
    top = rrf_fuse([a, b], topn=1).collect()[0]
    assert top["doc_id"] == 20


# -------------------------------------------------- streaming decay twin
def test_decayed_trending_stream_matches_batch(spark, tmp_path):
    """The streaming counts-store + publish-time decay fold must equal
    the batch operator run over the full replayed history — including
    when a later batch ADVANCES the reference day (all previously stored
    days age by one, which a stored-score design would get wrong)."""
    import json
    import os

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        decayed_scores,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.streaming import (
        decayed_trending_sink,
        read_event_stream,
    )

    b0 = [
        {"event_id": 1, "ts": "2024-03-01T10:00:00", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-03-01T11:00:00", "user_id": 2, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-02-25T09:00:00", "user_id": 1, "event_type": "b", "value": 1.0, "props": "{}"},
    ]
    b1 = [
        # advances the reference day 03-01 -> 03-03: every stored day ages
        {"event_id": 4, "ts": "2024-03-03T08:00:00", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 5, "ts": "2024-03-03T09:00:00", "user_id": 3, "event_type": "b", "value": 1.0, "props": "{}"},
        {"event_id": 6, "ts": "2024-02-26T12:00:00", "user_id": 1, "event_type": "b", "value": 1.0, "props": "{}"},
    ]
    src = str(tmp_path / "events_decay")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as f:
        for e in b0:
            f.write(json.dumps(e) + "\n")
    store = str(tmp_path / "decay_store")
    board = str(tmp_path / "decay_board")
    stream = read_event_stream(spark, src, fmt="json", max_files_per_trigger=1)
    q = decayed_trending_sink(
        stream,
        store,
        board,
        half_life_days=2,
        horizon_days=30,
        # wide watermark: b1 backfills a day 6 days behind the stream
        # head, and THIS test pins aging equivalence, not late-drop
        watermark="40 days",
        checkpoint=str(tmp_path / "ckpt_decay"),
    )
    try:
        q.processAllAvailable()
        with open(os.path.join(src, "b1.json"), "w") as f:
            for e in b1:
                f.write(json.dumps(e) + "\n")
        q.processAllAvailable()
        got = {
            r["event_type"]: r["score_fp"]
            for r in spark.read.parquet(board).collect()
        }
    finally:
        q.stop()
    full = spark.createDataFrame(
        [(e["event_type"], e["ts"]) for e in b0 + b1],
        "event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expect = {
        r["event_type"]: r["score_fp"]
        for r in decayed_scores(
            full, "event_type", "ts", half_life_days=2, horizon_days=30
        ).collect()
    }
    assert got == expect
    # sanity against the hand model: ref 2024-03-03, max_b=14
    def w(age):
        return 1 << (14 - age // 2)

    assert expect == {"a": w(0) + 2 * w(2), "b": w(6) + w(7) + w(0)}


def test_minhash_group_signature_merge_and_estimate(spark):
    """The resemblance sketch's two contracts: (1) shard signatures merge
    by per-(g, j) MIN into exactly the whole-corpus signature (the HLL
    merge property with MIN), and (2) matches/k estimates a KNOWN Jaccard
    within the binomial 3-sigma band; NULL tokens are not set members."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.setsketch import (
        jaccard_estimate_pairs,
        minhash_group_signature,
    )

    # two sets with |A|=|B|=600, |A∩B|=300 -> J = 300/900 = 1/3
    rows = (
        [("A", f"tok-shared-{i}") for i in range(300)]
        + [("A", f"tok-a-{i}") for i in range(300)]
        + [("B", f"tok-shared-{i}") for i in range(300)]
        + [("B", f"tok-b-{i}") for i in range(300)]
        + [("A", None), ("B", None)]
    )
    df = spark.createDataFrame(rows, "g string, tok string")
    k = 128
    sig = minhash_group_signature(df, "g", "tok", num_hashes=k, seed=7)
    assert sig.count() == 2 * k  # NULLs contributed nothing

    # shard-merge property: split rows arbitrarily, sketch each shard,
    # merge by MIN -> identical signature table
    s1 = minhash_group_signature(
        df.filter(F.length("tok") % 2 == 0), "g", "tok", num_hashes=k, seed=7
    )
    s2 = minhash_group_signature(
        df.filter(F.length("tok") % 2 == 1), "g", "tok", num_hashes=k, seed=7
    )
    merged = (
        s1.unionByName(s2).groupBy("g", "j").agg(F.min("h").alias("h"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sig.collect())
    )

    est = jaccard_estimate_pairs(sig).collect()
    assert len(est) == 1 and est[0]["k"] == k
    j_hat = est[0]["matches"] / k
    true_j = 1.0 / 3.0
    sigma = (true_j * (1 - true_j) / k) ** 0.5
    assert abs(j_hat - true_j) <= 3 * sigma, j_hat


def test_decayed_trending_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a micro-batch with the
    same batch_id (restart/replay) must leave the counts store AND the
    published board byte-identical in content — the same discipline
    test_minhash_batch_replay_is_idempotent pins for the near-dup sink
    (r8 verdict task 5). The latest-_bid-wins merge makes the replayed
    rows collapse onto the rows they duplicate."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.streaming.decay import (
        _decay_update,
    )

    store, board = str(tmp_path / "store"), str(tmp_path / "board")
    kw = dict(
        store_path=store,
        board_path=board,
        key_col="event_type",
        half_life_days=2,
        horizon_days=30,
        max_b=14,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "day date, k string, n long")

    import datetime as dt

    d = dt.date
    b0 = [(d(2024, 3, 1), "a", 2), (d(2024, 2, 25), "b", 1)]
    # update-mode cumulative counts: batch 1 restates (03-01, a) at 3
    b1 = [(d(2024, 3, 3), "a", 1), (d(2024, 3, 1), "a", 3)]
    _decay_update(mk(b0), 0, **kw)
    _decay_update(mk(b1), 1, **kw)

    def snap(path):
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    store_before, board_before = snap(store), snap(board)
    # replay the LAST batch twice more with the same id
    _decay_update(mk(b1), 1, **kw)
    _decay_update(mk(b1), 1, **kw)
    assert snap(store) == store_before
    assert snap(board) == board_before
    # and the board is the decayed fold of the latest counts: ref 03-03
    got = {k: s for k, s, in board_before}
    assert got == {"a": 1 * (1 << 14) + 3 * (1 << 13), "b": 1 * (1 << 11)}


def test_sorted_neighborhood_multipass_recall(spark):
    """The reversed-key pass must catch a pair whose shared content is a
    suffix (different blocks under the prefix key) — the documented
    Hernandez-Stolfo recall fix; single-pass misses it by design."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        sorted_neighborhood_multipass,
    )

    docs = [
        (1, "alpha common tail words"),
        (2, "beta common tail words"),  # same suffix, different prefix block
        (3, "unrelated thing entirely xyz"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    one = sorted_neighborhood_multipass(
        df, "doc_id", "text", window=2, min_pct=50, passes=1
    ).collect()
    assert one == []
    two = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_multipass(
            df, "doc_id", "text", window=2, min_pct=50, passes=2
        ).collect()
    }
    assert two == {(1, 2)}


# ---------------------------------------------------------- hypothesis sweeps
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_HSETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    xs=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
    ks=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=60),
)
@_HSETTINGS
def test_low_median_hypothesis(spark, xs, ks):
    rows = [(k, x) for k, x in zip(ks, xs)]
    df = spark.createDataFrame(rows, "k string, x bigint")
    got = {r["k"]: r["med"] for r in grouped_low_median(df, "k", "x").collect()}
    by_k = {}
    for k, x in rows:
        by_k.setdefault(k, []).append(x)
    assert got == {k: _low_median_model(v) for k, v in by_k.items()}


@given(
    vals=st.lists(
        st.sampled_from(["hh1", "hh2", "t1", "t2", "t3", "t4", "t5", "t6"]),
        min_size=1,
        max_size=120,
    ),
    support_inv=st.sampled_from([2, 5, 10]),
    parts=st.sampled_from([1, 5]),
)
@_HSETTINGS
def test_heavy_hitters_hypothesis(spark, vals, support_inv, parts):
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(parts)
    got = {
        r["x"]: r["freq"]
        for r in heavy_hitters(df, "x", support_inv=support_inv).collect()
    }
    assert got == _brute_hh(vals, support_inv)


# ---------------------------------------------------------- sssp / hierarchy
def test_sssp_matches_model(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        sssp_hops,
    )

    rng = random.Random(3)
    edges = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(45)})
    edges = [(a, b, (a + b) % 5 + 1) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src bigint, dst bigint, wt bigint")
    seeds = [0, 1]
    got = {
        r["node"]: r["dist"]
        for r in sssp_hops(
            e, spark.createDataFrame([(s,) for s in seeds], "node bigint"), 3
        ).collect()
    }
    # brute force: min weight over all paths of <= 3 edges
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    best = {s: 0 for s in seeds}
    frontier = dict(best)
    for _ in range(3):
        nxt = {}
        for u, du in frontier.items():
            for v, w in adj.get(u, ()):
                nd = du + w
                if nd < best.get(v, 1 << 60):
                    best[v] = nd
                    nxt[v] = nd
        # Bellman-Ford relaxes from ALL current best labels each round
        frontier = dict(best)
    assert got == best


def test_tree_roots_and_rollup_model(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        hierarchy_rollup,
        tree_roots,
    )

    # forest: two trees (root 1 and root 2) + a deep chain under 1
    #   1 <- 10 <- 100 <- 1000 <- 10000   (depth 4)
    #   2 <- 20, 2 <- 21
    rows = [
        (1, 1, 5),
        (10, 1, 1),
        (100, 10, 1),
        (1000, 100, 1),
        (10000, 1000, 1),
        (2, 2, 7),
        (20, 2, 2),
        (21, 2, 3),
    ]
    df = spark.createDataFrame(rows, "node bigint, parent bigint, v bigint")
    got = {
        r["node"]: r["root"]
        for r in tree_roots(df, "node", "parent", rounds=2).collect()
    }
    # rounds=2 -> covers depth 4 exactly (2^2)
    assert got == {1: 1, 10: 1, 100: 1, 1000: 1, 10000: 1, 2: 2, 20: 2, 21: 2}
    agg = {
        r["root"]: (r["n_nodes"], r["total"])
        for r in hierarchy_rollup(df, "node", "parent", "v", rounds=2).collect()
    }
    assert agg == {1: (5, 9), 2: (3, 12)}
    # insufficient rounds clamp at the 2^rounds-th ancestor, not the root
    shallow = {
        r["node"]: r["root"]
        for r in tree_roots(df, "node", "parent", rounds=1).collect()
    }
    assert shallow[10000] == 100  # 2 hops up, not yet the root


def test_tree_roots_heals_dangling_and_null_parents(spark):
    """Dangling pointers don't lose rows (r8 advice): a node whose parent
    is NULL or absent from the node set is self-rooted, so every node
    appears exactly once and rollup counts cover the whole input."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        hierarchy_rollup,
        tree_roots,
    )

    rows = [
        (1, 1, 5),      # proper root
        (10, 1, 1),     # child of 1
        (50, 999, 2),   # parent 999 does not exist -> self-rooted
        (51, 50, 3),    # child of the healed root
        (60, None, 4),  # NULL parent -> self-rooted
    ]
    df = spark.createDataFrame(rows, "node bigint, parent bigint, v bigint")
    got = {
        r["node"]: r["root"]
        for r in tree_roots(df, "node", "parent", rounds=3).collect()
    }
    assert got == {1: 1, 10: 1, 50: 50, 51: 50, 60: 60}
    agg = {
        r["root"]: (r["n_nodes"], r["total"])
        for r in hierarchy_rollup(df, "node", "parent", "v", rounds=3).collect()
    }
    assert agg == {1: (2, 6), 50: (2, 5), 60: (1, 4)}
    assert sum(n for n, _ in agg.values()) == len(rows)


def test_rrf_fuse_dedups_within_list(spark):
    """A retriever emitting the same doc at two ranks in ONE list (e.g.
    one row per matching chunk) must contribute once, best rank wins —
    no double-dip, and n_lists stays the number of LISTS."""
    a = spark.createDataFrame(
        [(10, 3), (10, 17), (20, 1)], "doc_id bigint, rank bigint"
    )
    b = spark.createDataFrame([(10, 2)], "doc_id bigint, rank bigint")
    got = {
        r["doc_id"]: (r["rrf_fp"], r["n_lists"])
        for r in rrf_fuse([a, b], topn=10).collect()
    }
    s = 10**9
    assert got == {10: (s // 63 + s // 62, 2), 20: (s // 61, 1)}


def test_multipass_rejects_excess_passes(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        sorted_neighborhood_multipass,
    )

    df = spark.createDataFrame([(1, "x y")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="passes"):
        sorted_neighborhood_multipass(df, "doc_id", "text", passes=4)


def test_snapshot_diff_model(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k bigint, s string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 30), (4, "D", 40), (5, "e", 50)],
        "k bigint, s string, v int",
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # 1 removed; 2 identical; 3 NULL->30 must be CHANGED (null-safe
    # compare, not three-valued-logic 'unknown'); 4 changed; 5 added
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "added",
    }


def test_tree_roots_healing_join_does_not_amplify_duplicate_ids(spark):
    """Regression (r9 advice): the dangling-parent healing join probes a
    DEDUPLICATED id set. Unique ids are the forest contract, but a
    violation must not be silently amplified by the heal itself —
    rounds=0 isolates the healing join from the doubling self-joins."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        tree_roots,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 99)],  # duplicate node 1; node 2 dangles
        "node bigint, parent bigint",
    )
    out = tree_roots(df, "node", "parent", rounds=0).collect()
    assert len(out) == 3  # one row per INPUT row, no join fan-out
    assert {(r["node"], r["root"]) for r in out} == {(1, 1), (2, 2)}


def test_jaccard_estimate_pairs_at_thousand_groups_and_guard(spark):
    """Pins the setsketch scale contract (r9 verdict): the plane join IS
    G^2 in group count — at G = 10^3, k = 8 it produces exactly
    C(1000,2) = 499500 pair rows from a 4M-row intermediate (fine: the
    operator's corpus-level contract) — and the max_groups guard turns
    entity-scale group counts into a loud error pointing at LSH banding
    instead of a silent 10^12-row join."""
    import pytest

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.setsketch import (
        jaccard_estimate_pairs,
    )

    # synthetic signatures: even groups share one signature, odd groups
    # another -> even-even pairs match on all 8 planes, even-odd on none
    sig = spark.range(1000).selectExpr(
        "id AS g",
        "explode(sequence(0, 7)) AS j",
    ).selectExpr("g", "j", "CAST(j + 1000 * (g % 2) AS BIGINT) AS h")

    out = jaccard_estimate_pairs(sig)
    agg = out.selectExpr(
        "COUNT(*) AS pairs",
        "SUM(matches) AS total_matches",
        "MIN(k) AS kmin",
        "MAX(k) AS kmax",
    ).collect()[0]
    assert agg["pairs"] == 499500  # C(1000, 2)
    # within-parity pairs: 2 * C(500,2) = 249500, each matching 8 planes
    assert agg["total_matches"] == 249500 * 8
    assert (agg["kmin"], agg["kmax"]) == (8, 8)

    with pytest.raises(ValueError, match="max_groups"):
        jaccard_estimate_pairs(sig, max_groups=10)
