"""Deterministic splitting/sampling + vocab build (llm/sampling.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
    build_vocab,
    dataset_split,
    hash_sample,
)


def test_dataset_split_deterministic_and_proportional(spark):
    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = dataset_split(ids).groupBy("split").count().toPandas()
    frac = dict(zip(out.split, out["count"] / 20_000))
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # pure function of the key: same assignment on a re-partitioned copy
    a = dataset_split(ids).select("doc_id", "split").toPandas()
    b = (
        dataset_split(ids.repartition(13)).select("doc_id", "split")
        .toPandas()
    )
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.split_a == merged.split_b).all()


def test_dataset_split_growing_a_split_is_monotone(spark):
    """Cumulative boundaries: growing train only steals from the NEXT
    split; no train member ever leaves train."""
    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    small = dataset_split(ids, [("train", 0.6), ("val", 0.2), ("test", 0.2)])
    big = dataset_split(ids, [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    s = set(small.filter(F.col("split") == "train").toPandas().doc_id)
    g = set(big.filter(F.col("split") == "train").toPandas().doc_id)
    assert s <= g


def test_hash_sample_nested(spark):
    ids = spark.range(10_000).withColumnRenamed("id", "doc_id")
    s20 = set(hash_sample(ids, 0.2).toPandas().doc_id)
    s50 = set(hash_sample(ids, 0.5).toPandas().doc_id)
    assert s20 <= s50
    assert abs(len(s50) / 10_000 - 0.5) < 0.02


def test_sample_within_split_composes(spark):
    """A hash sample of the train split is a subset of train, and the same
    docs are selected whether sampling runs before or after the split —
    both read the same md5 bucket, so the ops commute."""
    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    train = dataset_split(ids).filter(F.col("split") == "train")
    a = set(hash_sample(train, 0.3).toPandas().doc_id)
    b_pre = hash_sample(ids, 0.3)
    b = set(
        dataset_split(b_pre).filter(F.col("split") == "train").toPandas().doc_id
    )
    t = set(train.toPandas().doc_id)
    assert a <= t
    assert a == b  # commutes: same bucket drives both ops


def test_pack_sequences_contiguous(spark):
    """Per-shard offsets must tile the token stream exactly: sorted by
    doc_id within a shard, each doc starts where the previous ended, and
    pack_id is the budget-floor of the offset."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import pack_sequences

    docs = [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(200)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pack_sequences(df, budget=16, num_shards=4).toPandas()
    assert len(out) == 200
    for shard, grp in out.groupby("shard"):
        grp = grp.sort_values("doc_id")
        expect = 0
        for r in grp.itertuples():
            assert r.offset == expect, (shard, r.doc_id)
            assert r.pack_id == r.offset // 16
            expect += r.n_tokens


def test_repetition_ratio(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        repetition_ratio,
    )

    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam spam spam"),
            (1, "a quick brown fox jumps over the lazy dog"),
            (2, "too short"),
        ],
        ["doc_id", "text"],
    )
    got = dict(
        df.select("doc_id", repetition_ratio(F.col("text")).alias("r")).collect()
    )
    assert got[0] > 0.8  # 6 identical trigrams of 6 total -> 5/6
    assert got[1] == 0.0  # all trigrams distinct
    assert got[2] == 0.0  # < n tokens -> no shingles


def test_build_vocab_matches_pandas(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a cat and a dog"),
        (3, "the bird flew over the log"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = build_vocab(df, min_df=2, max_df_frac=0.6).toPandas()
    # independent pandas cross-check
    tok_sets = {i: set(t.lower().split()) for i, t in docs}
    dfreq: dict[str, int] = {}
    for toks in tok_sets.values():
        for t in toks:
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {
        t: c for t, c in dfreq.items() if c >= 2 and c <= 0.6 * len(docs)
    }
    assert dict(zip(got.token, got.df)) == want
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got.sort_values("vocab_id").token) == [t for t, _ in ranked]
    assert sorted(got.vocab_id) == list(range(1, len(want) + 1))


def test_pack_sequences_resharding_invariants(spark):
    """r4 verdict #5: changing num_shards relabels streams but never
    changes the per-document token counts, and every shard count yields
    the same lawful layout (id-ordered cumulative offsets, budget-floor
    pack ids). Also pins the shard-assignment law itself: shard =
    hash_bucket(doc_id) % num_shards, so halving the shard count merges
    streams pairwise-predictably rather than reshuffling membership."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import pack_sequences
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    docs = [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(200)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    buckets = dict(
        df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    )
    outs = {
        ns: pack_sequences(df, budget=16, num_shards=ns).toPandas()
        for ns in (2, 4, 8)
    }
    base = outs[4].set_index("doc_id").n_tokens.sort_index()
    for ns, out in outs.items():
        # token counts are shard-independent
        assert out.set_index("doc_id").n_tokens.sort_index().equals(base)
        # membership law: shard = bucket % ns
        for r in out.itertuples():
            assert r.shard == buckets[r.doc_id] % ns
        # lawful layout within every shard
        for shard, grp in out.groupby("shard"):
            grp = grp.sort_values("doc_id")
            expect = 0
            for r in grp.itertuples():
                assert r.offset == expect
                assert r.pack_id == r.offset // 16
                expect += r.n_tokens


def test_pack_sequences_auto_shards(spark):
    """num_shards=None derives shards = max(MIN_SHARDS, tokens/target) —
    the auto-sizing keeps every per-shard window sort bounded without a
    knob, and small corpora floor at MIN_SHARDS."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import pack_sequences
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        MIN_SHARDS,
    )

    docs = [(i, " ".join(["tok"] * 10)) for i in range(100)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # small corpus: floors at MIN_SHARDS
    out = pack_sequences(df, budget=16).toPandas()
    assert out.shard.max() < MIN_SHARDS
    # tiny target: 1000 tokens / 250-token shards -> 4 > floor would be 64,
    # so drop the floor by targeting: 1000 // 4 = 250 -> max(64, 4) = 64;
    # instead check the derived count directly with a sub-floor target
    out2 = pack_sequences(df, budget=16, target_tokens_per_shard=5).toPandas()
    # 1000 tokens / 5 = 200 shards derived; only ~100 docs so <=100 occupied
    assert out2.groupby("shard").ngroups > MIN_SHARDS // 2


def test_stratified_hash_sample_nests_and_composes(spark):
    """Per-stratum fractions hold, growing a fraction only ADDS members
    (same-bucket nesting), unlisted strata keep the default, and a
    stratified sample is a subset of the plain hash_sample at the max
    fraction (all ops read the same md5 bucket)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        stratified_hash_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(15_000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    small = stratified_hash_sample(
        df, {"a": 0.5, "b": 0.2}, "source", default_fraction=0.1
    ).toPandas()
    frac = small.groupby("source").size() / 5_000
    assert abs(frac["a"] - 0.5) < 0.03
    assert abs(frac["b"] - 0.2) < 0.03
    assert abs(frac["c"] - 0.1) < 0.03
    big = stratified_hash_sample(
        df, {"a": 0.7, "b": 0.4}, "source", default_fraction=0.1
    ).toPandas()
    assert set(small.doc_id) <= set(big.doc_id)  # nesting
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import hash_sample

    plain = set(hash_sample(df, 0.5).toPandas().doc_id)
    assert set(small.doc_id) <= plain  # subset of max-fraction plain sample


def test_chunk_documents_tiling(spark):
    """Chunks tile the token stream with the exact stride/overlap law:
    chunk i starts at i*stride, consecutive chunks share `overlap` tokens,
    the last chunk is the ragged remainder, short docs give one chunk,
    empty docs give none."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        chunk_documents,
    )

    docs = [
        (0, " ".join(f"t{i}" for i in range(10))),  # 10 toks: 2 chunks @ (8,2)
        (1, " ".join(f"t{i}" for i in range(8))),   # exactly one chunk
        (2, "a b"),                                  # shorter than chunk
        (3, "   "),                                  # empty after tokenize
        (4, " ".join(f"t{i}" for i in range(21))),  # 21 toks
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=8, overlap=2).toPandas()
    assert 3 not in set(out.doc_id)  # empty doc -> no chunks
    stride = 6
    for doc_id, text in docs:
        toks = text.split()
        grp = out[out.doc_id == doc_id].sort_values("chunk_id")
        if not toks:
            assert grp.empty
            continue
        import math

        want_chunks = math.ceil(max(len(toks) - 2, 1) / stride)
        assert list(grp.chunk_id) == list(range(want_chunks))
        rebuilt = []
        for r in grp.itertuples():
            ctoks = r.chunk_text.split()
            assert ctoks == toks[r.chunk_id * stride : r.chunk_id * stride + 8]
            assert r.n_tokens == len(ctoks)
            rebuilt = rebuilt[: r.chunk_id * stride] + ctoks
        assert rebuilt == toks  # overlap-tiling loses no token


def test_chunk_documents_no_shuffle(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        chunk_documents,
    )

    df = spark.createDataFrame([(0, "a b c d e f")], ["doc_id", "text"])
    p = chunk_documents(df, 4, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


def test_weighted_sample_k_proportional_and_exact_size(spark):
    """A-ES sampling: exactly k rows; high-weight rows are sampled far
    more often than low-weight rows across disjoint key populations."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        weighted_sample_k,
    )

    # ids 0..999 weight 1.0; ids 1000..1999 weight 0.05
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit(1.0)).otherwise(F.lit(0.05)).alias("w"),
    )
    out = weighted_sample_k(df, F.col("w"), k=200).collect()
    assert len(out) == 200
    heavy = sum(1 for r in out if r["doc_id"] < 1000)
    assert heavy > 150  # weight ratio 20:1 -> heavy side dominates

    # deterministic under repartitioning
    again = weighted_sample_k(df.repartition(13), F.col("w"), k=200).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_temperature_sample_upweights_small_domains(spark):
    """alpha<1 must give the SMALL domain a strictly higher sampling rate
    than the big one (rate ∝ n^(alpha-1)), keep totals near the budget,
    and stay deterministic under repartitioning. The shared testdata has
    uniform sources, so the differential path is pinned here on a skewed
    synthetic corpus."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        temperature_sample,
    )

    # domain A: 3000 docs, domain B: 100 docs
    df = spark.range(3100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3000, F.lit("big")).otherwise(F.lit("small")).alias(
            "source"
        ),
    )
    out = temperature_sample(
        df, domain_col="source", alpha=0.3, budget_frac=0.2
    )
    rates = {
        r["source"]: r["rate_bound"]
        for r in out.select("source", "rate_bound").distinct().collect()
    }
    # uncapped rate ratio = (100/3000)^(0.3-1) = 30^0.7 ≈ 10.8x in favor
    # of small — which caps at 1.0 here (rate_bound 10000) while big
    # samples at ~15%
    assert rates["small"] == 10000
    assert rates["big"] < 2000
    rows = out.collect()
    kept = len(rows)
    # expected kept = 0.2*3100 = 620 (small caps at 1.0: expected
    # small-rate = min(1, c*100^-0.7); verify the realized total is the
    # analytic expectation within hash noise)
    import math

    z = 3000**0.3 + 100**0.3
    c = 0.2 * 3100 / z
    expect = sum(
        n * min(1.0, math.floor(c * n ** (-0.7) * 10000) / 10000)
        for n in (3000, 100)
    )
    assert abs(kept - expect) < 0.15 * expect
    again = temperature_sample(
        df.repartition(13), domain_col="source", alpha=0.3, budget_frac=0.2
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)


def test_soft_dedup_weights_inverse_cluster_size(spark):
    """weight_fp = floor(1e6 / cluster size) exactly; unpaired docs keep
    1e6; a chain pair-list (a-b, b-c) forms ONE cluster of 3."""
    from pyspark.sql import functions as F  # noqa: F401

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        release_plan_caches,
        soft_dedup_weights,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = soft_dedup_weights(docs, pairs)
    got = {r["doc_id"]: r["weight_fp"] for r in out.collect()}
    release_plan_caches(out)
    assert got == {
        0: 333333, 1: 333333, 2: 333333,  # chain -> one 3-cluster
        3: 500000, 4: 500000,             # pair
        5: 1000000,                       # untouched
    }


def test_collocations_exact_integer_ratio(spark):
    """lr_fp is exact integer arithmetic: verify against a hand-computed
    likelihood ratio on a tiny corpus, min_count filtering included."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        collocations,
    )

    # "new york" appears 5x (passes min_count), tokens: new 5, york 5;
    # filler "a b" appears 6x with very common tokens -> low ratio
    corpus = ["new york " + "a b " * 3] * 5 + ["a b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    rows = {
        (r["token_a"], r["token_b"]): (r["n_pair"], r["lr_fp"])
        for r in collocations(df, min_count=5, top_k=10).collect()
    }
    # totals: per rep doc tokens = [new, york, a, b, a, b, a, b] -> bigrams 7 each
    # T = 5*7 + 1 = 36 bigrams
    assert ("new", "york") in rows
    n_pair, lr = rows[("new", "york")]
    assert n_pair == 5
    assert lr == (5 * 36 * 1_000_000) // (5 * 5)  # exact integer ratio
    # the boilerplate pair ranks below the collocation
    assert rows[("new", "york")][1] > rows.get(("a", "b"), (0, 0))[1]


def test_collocations_survives_int64_overflow_regime(spark):
    """ADVICE r6: n_pair * T * 1e6 exceeds int64 once n_pair * T >
    ~9.2e12 — under ANSI mode the old bigint product ERRORED there. One
    4M-repetition bigram gives n_ab*T ≈ 3.2e13; the DECIMAL(38,0) route
    must return the exact quotient (verified against Python bigints)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        collocations,
    )

    reps = 4_000_000
    df = spark.createDataFrame(
        [(0, "alpha beta " * reps)], "doc_id long, text string"
    )
    rows = {
        (r["token_a"], r["token_b"]): (r["n_pair"], r["lr_fp"])
        for r in collocations(df, min_count=5, top_k=10).collect()
    }
    t = 2 * reps - 1  # total bigrams in the doc
    n_ab = reps  # alpha->beta occurrences
    assert n_ab * t * 1_000_000 > 2**63 - 1  # genuinely past int64
    assert rows[("alpha", "beta")] == (
        n_ab,
        (n_ab * t * 1_000_000) // (reps * reps),
    )
    n_ba = reps - 1  # beta->alpha occurrences
    assert rows[("beta", "alpha")] == (
        n_ba,
        (n_ba * t * 1_000_000) // (reps * reps),
    )


def test_curriculum_approx_tracks_exact(spark):
    """The parallel approx-quantile curriculum must produce near-equal
    phases whose quality ordering agrees with the exact ntile form:
    phase 1 holds the best docs, per-phase counts within 25% of N/k, and
    q ranges are monotone non-increasing across phases."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        curriculum_buckets,
        curriculum_buckets_approx,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        load_table,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    n = d.count()
    exact = {r["phase"]: r for r in curriculum_buckets(d, n_buckets=5).collect()}
    approx = {
        r["phase"]: r for r in curriculum_buckets_approx(d, n_buckets=5).collect()
    }
    assert set(approx) == set(exact) == {1, 2, 3, 4, 5}
    for p, row in approx.items():
        assert abs(row["n_docs"] - n / 5) <= 0.25 * (n / 5), (p, row["n_docs"])
    # quality ordering: each phase's min >= next phase's max (up to ties
    # sharing one fixed-point value across the cut)
    for p in range(1, 5):
        assert approx[p]["q_min"] >= approx[p + 1]["q_max"] - 1
    # top phase agrees with exact on where the best documents live
    assert approx[1]["q_max"] == exact[1]["q_max"]
    assert sum(r["n_docs"] for r in approx.values()) == n
