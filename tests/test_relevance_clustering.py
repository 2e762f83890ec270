"""Relevance (BM25, unigram LM), Gopher rules, clustering and incremental
dedup: semantics pinned against independent Python/numpy computations on
crafted inputs (the registered oracles prove engine parity on the shared
testdata; these prove the math is the math it claims to be), plus plan-shape
assertions for the scale contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
    GOPHER_DEFAULTS,
    gopher_keep,
    gopher_metrics,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
    assign_clusters,
    bm25_topk,
    cluster_profile,
    exact_dedup,
    incremental_dedup,
    unigram_logprob_profile,
)

DOCS = [
    (0, "spark join shuffle join join window"),
    (1, "window stream watermark stream state"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "join window join stream"),
    (4, "completely unrelated words only here"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent reference implementation (same fixed-point idf)."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        score = 0.0
        matched = 0
        for term in terms:
            tf = tk.count(term)
            if tf > 0:
                matched += 1
            df = sum(1 for v in toks.values() if term in v)
            idf6 = math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6)
            norm = 1.0 - b + b * (len(tk) / avgdl)
            score += (idf6 / 1e6) * (tf * (k1 + 1.0) / (tf + k1 * norm))
        if matched:
            out[i] = (math.floor(score * 10000) / 10000, matched)
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    terms = ["join", "stream"]
    got = {
        r.doc_id: (r.score, r.matched_terms)
        for r in bm25_topk(df, terms, k=10).collect()
    }
    want = _py_bm25(DOCS, terms)
    assert got == want
    # doc 0 mentions 'join' 3x, doc 3 has both terms: both must outrank doc 1
    assert got[3][1] == 2 and got[0][0] > got[1][0]
    # non-matching docs are absent
    assert 2 not in got and 4 not in got


def test_bm25_plan_shape(spark):
    """Corpus side stays narrow: no Generate (explode) anywhere, the stats
    row enters via a broadcast join, and top-k is TakeOrderedAndProject."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = bm25_topk(df, ["join", "stream"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_unigram_logprob_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {r.doc_id: r for r in unigram_logprob_profile(df).collect()}
    toks = {i: t.lower().split() for i, t in DOCS}
    counts: dict[str, int] = {}
    for tk in toks.values():
        for t in tk:
            counts[t] = counts.get(t, 0) + 1
    T, V = sum(counts.values()), len(counts)
    for i, tk in toks.items():
        lp6 = sum(math.floor(math.log((counts[t] + 1) / (T + V)) * 1e6) for t in tk)
        assert rows[i].n_tokens == len(tk)
        assert rows[i].sum_lp6 == lp6
        assert rows[i].mean_logprob == (lp6 / len(tk)) / 1e6
    # the all-stopword English doc is built from rarer tokens -> lower mean
    assert rows[2].mean_logprob < rows[0].mean_logprob


def test_tfidf_matches_reference(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        tfidf_features,
    )

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    vocab = build_vocab(df, min_df=2, max_df_frac=1.0)
    vmap = {r.token: (r.vocab_id, r.df) for r in vocab.collect()}
    got = {
        (r.doc_id, r.token_id): (r.tf, r.tfidf)
        for r in tfidf_features(df, vocab).collect()
    }
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    want = {}
    for i, tk in toks.items():
        for t in set(tk):
            if t not in vmap:
                continue
            vid, dfr = vmap[t]
            idf6 = math.floor(math.log((1 + n) / (1 + dfr)) * 1e6)
            want[(i, vid)] = (tk.count(t), tk.count(t) * (idf6 / 1e6))
    assert got == want
    # every weight positive (smooth idf) and OOV tokens absent
    assert all(w > 0 for _, w in got.values())


GOPHER_DOCS = [
    (0, " ".join(["word"] * 30) + " the is"),     # passes everything
    (1, "tiny doc"),                              # too few words
    (2, " ".join(["###"] * 25) + " the"),         # symbols, no alpha
    (3, ""),                                      # empty
    (4, " ".join(["supercalifragilistic"] * 25)), # mean word len > 10, no stopwords
]


def test_gopher_metrics_and_keep(spark):
    df = spark.createDataFrame(GOPHER_DOCS, ["doc_id", "text"])
    m = gopher_metrics(F.col("text"))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            m["n_words"].alias("n_words"),
            m["mean_word_len"].alias("mwl"),
            m["symbol_ratio"].alias("sym"),
            m["alpha_frac"].alias("alpha"),
            m["n_stopwords"].alias("sw"),
            gopher_keep(m).alias("keep"),
        ).collect()
    }
    assert rows[0].n_words == 32 and rows[0].sw == 2 and rows[0].keep
    assert rows[1].n_words == 2 and not rows[1].keep
    assert rows[2].alpha == pytest.approx(1 / 26) and not rows[2].keep
    assert rows[3].n_words == 0 and rows[3].mwl == 0.0 and not rows[3].keep
    assert rows[4].mwl == 20.0 and rows[4].sw == 0 and not rows[4].keep
    # threshold override flips a single rule
    m2 = gopher_metrics(F.col("text"))
    relaxed = df.select(
        "doc_id", gopher_keep(m2, min_words=1, min_stopwords=0).alias("keep")
    )
    assert {r.doc_id: r.keep for r in relaxed.collect()}[1] is True


def test_assign_clusters_matches_numpy(spark):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((40, 8))
    cents = rng.standard_normal((4, 8)).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.id: r.cluster_id for r in assign_clusters(df, cents).collect()}
    cm = np.array(cents)
    cos = (vecs @ cm.T) / (
        np.linalg.norm(vecs, axis=1, keepdims=True) * np.linalg.norm(cm, axis=1)
    )
    want = cos.argmax(axis=1)
    assert got == {i: int(c) for i, c in enumerate(want)}


def test_assign_clusters_tie_breaks_low_cid(spark):
    """Duplicate centroids -> exact cosine tie -> lowest cluster id wins
    (the fold keeps the FIRST maximum)."""
    c = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(0, [2.0, 0.0, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    rows = assign_clusters(df, [c, c, [0.0, 1.0, 0.0, 0.0]]).collect()
    assert rows[0].cluster_id == 0


def test_cluster_profile_partitions_corpus(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8))
    cents = rng.standard_normal((3, 8)).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    prof = cluster_profile(df, cents).collect()
    assert sum(r.n_vectors for r in prof) == 60
    for r in prof:
        assert -1.0 <= r.mean_cos <= 1.0


def test_cluster_assignment_plan_is_shuffle_free(spark):
    """The n-side assignment must not shuffle: no Exchange in the
    assign_clusters plan beyond the input spread repartition."""
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id bigint, embedding array<double>",
    )
    plan = assign_clusters(df, [[1.0, 0.0], [0.0, 1.0]])._jdf.queryExecution().executedPlan().toString()
    # one round-robin spread of the tiny input is allowed; no hash exchange
    assert "hashpartitioning" not in plan, plan


def test_semantic_dup_pairs_finds_planted_dup(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        semantic_dup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 8))
    vecs = list(base)
    vecs.append(base[7] + 0.01 * rng.standard_normal(8))  # near-dup of 7 -> id 30
    cents = rng.standard_normal((4, 8)).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    pairs = semantic_dup_pairs(df, cents, threshold=0.9)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (7, 30) in got
    # no crossJoin anywhere: bucketing must carry the join
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_weighted_hash_sample_semantics(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        hash_sample,
        weighted_hash_sample,
    )

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    assert weighted_hash_sample(df, F.lit(0.0)).count() == 0
    assert weighted_hash_sample(df, F.lit(1.0)).count() == 2000
    # constant weight w ≡ hash_sample(w): same bucket, same bound
    a = {r.doc_id for r in weighted_hash_sample(df, F.lit(0.3)).collect()}
    b = {r.doc_id for r in hash_sample(df, 0.3).collect()}
    assert a == b
    # per-row weights: acceptance rate tracks the weight
    w = F.when(F.col("doc_id") < 1000, F.lit(0.1)).otherwise(F.lit(0.9))
    out = weighted_hash_sample(df, w).groupBy((F.col("doc_id") < 1000).alias("lo")).count()
    rates = {r.lo: r["count"] / 1000 for r in out.collect()}
    assert rates[True] < 0.2 and 0.8 < rates[False] <= 1.0


def test_bigram_counts_semantics(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bigram_counts

    df = spark.createDataFrame(
        [
            (0, "a b a b c"),   # pairs: (a,b) (b,a) (a,b) (b,c)
            (1, "solo"),        # no pairs
            (2, ""),            # no pairs
            (3, "A b"),         # lowercased -> (a,b)
        ],
        ["doc_id", "text"],
    )
    got = {(r.token_a, r.token_b): r.n for r in bigram_counts(df).collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    # top-k cut is deterministic: ties broken by (token_a, token_b)
    top = bigram_counts(df, top_k=2).collect()
    assert [(r.token_a, r.token_b) for r in top] == [("a", "b"), ("b", "a")]


def test_incremental_dedup_semantics(spark):
    old = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], ["doc_id", "text"]
    )
    seen = exact_dedup(old).select("fp")
    batch = spark.createDataFrame(
        [
            (10, "alpha  beta"),        # dup of seen (normalization collapses ws)
            (11, "epsilon zeta"),       # fresh
            (12, "epsilon zeta"),       # intra-batch dup of 11
            (13, "Gamma Delta"),        # dup of seen (case-folded)
            (14, "eta theta"),          # fresh
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in incremental_dedup(batch, seen).collect()}
    assert set(out) == {11, 14}
    assert out[11].n_copies == 2 and out[14].n_copies == 1
    # idempotence: feeding survivors' fingerprints back yields nothing new
    seen2 = seen.unionByName(
        incremental_dedup(batch, seen).select("fp")
    )
    assert incremental_dedup(batch, seen2).count() == 0
