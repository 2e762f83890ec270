"""LLM-pipeline operator tests: dedup families vs brute-force ground truth,
similarity search recall, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
    attach_media_metadata,
    cosine_topk,
    decode_and_featurize,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_dedup,
    lsh_ann_topk,
    minhash_dedup_pairs,
    minhash_dedup_pairs_universal,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup_pairs,
    simhash_dedup_pairs_md5,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
    MULTIMODAL_SCHEMA,
)

WORDS = "the quick brown fox jumps over lazy dog data spark shuffle join scan".split()


def _doc(rng, n):
    return " ".join(rng.choice(WORDS, n))


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        rows.append((i, _doc(rng, 60)))
    # exact duplicates (whitespace/case variants)
    rows.append((100, rows[0][1]))
    rows.append((101, "  " + rows[0][1].upper() + " "))
    # near-duplicate: one word changed
    base = rows[1][1].split()
    base[10] = "changed"
    rows.append((102, " ".join(base)))
    # empty doc
    rows.append((103, ""))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


def test_exact_dedup(spark, docs):
    df, pdf = docs
    out = exact_dedup(df).toPandas()
    grp = out[out.n_copies >= 3]
    assert len(grp) == 1 and grp.keeper_id.iloc[0] == 0  # 0,100,101 collapse
    assert out.n_copies.sum() == len(pdf)


def _true_jaccard(a: str, b: str, n=3):
    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_ngram_jaccard_pairs_matches_bruteforce(spark, docs):
    df, pdf = docs
    out = ngram_jaccard_pairs(df, threshold=0.5).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    # brute force over all pairs
    want = {}
    recs = list(pdf.itertuples(index=False))
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            jac = _true_jaccard(a.text, b.text)
            if jac >= 0.5:
                key = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id))
                want[key] = round(jac, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_minhash_lsh_finds_near_dups(spark, docs):
    df, pdf = docs
    out = minhash_dedup_pairs(df, threshold=0.5).toPandas()
    pairs = {(r.id_a, r.id_b) for r in out.itertuples()}
    # the doctored near-dup pair (1, 102) must be found (high true Jaccard)
    assert (1, 102) in pairs
    # exact dup pair found with est_jaccard 1.0
    exact = out[(out.id_a == 0) & (out.id_b == 100)]
    assert len(exact) == 1 and exact.est_jaccard.iloc[0] == 1.0
    # no wildly-false positives: every reported pair has real jaccard >= 0.3
    texts = dict(zip(pdf.doc_id, pdf.text))
    for a, b in pairs:
        assert _true_jaccard(texts[a], texts[b], n=3) >= 0.3


def test_simhash_near_dups(spark, docs):
    df, pdf = docs
    fps = simhash(df).toPandas()
    assert fps.simhash.dtype == np.int64
    by_id = dict(zip(fps.id, fps.simhash))
    # identical normalized content -> identical fingerprint
    assert by_id[0] == by_id[100] == by_id[101]
    out = simhash_dedup_pairs(df, max_hamming=8, blocks=16).toPandas()
    pairs = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert (0, 100) in pairs and (0, 101) in pairs
    # near-dup found at small hamming distance
    assert (1, 102) in pairs


def test_dedup_components_chain_and_islands(spark):
    """Min-label propagation: a 4-node chain (needs >1 round), a 2-node
    island, and a triangle all resolve to min-id components."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dedup_components,
    )

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (50, 60), (70, 80), (80, 90), (70, 90)],
        ["id_a", "id_b"],
    )
    want = {
        10: 10, 20: 10, 30: 10, 40: 10,
        50: 50, 60: 50,
        70: 70, 80: 70, 90: 70,
    }
    # union-find fast path and the distributed propagation loop must agree
    fast = {r.id: r.component for r in dedup_components(pairs).collect()}
    dist = {
        r.id: r.component
        for r in dedup_components(pairs, small_graph_threshold=0).collect()
    }
    assert fast == want and dist == want


def test_dedup_components_self_pairs_branch_agreement(spark):
    """A node appearing ONLY in self-pairs (id_a == id_b) must get a
    singleton label on BOTH branches — the distributed path drops
    self-loops internally and used to lose such nodes entirely, while the
    union-find branch labeled them (ADVICE r4)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dedup_components,
    )

    pairs = spark.createDataFrame(
        [(5, 5), (10, 20), (20, 20)], ["id_a", "id_b"]
    )
    want = {5: 5, 10: 10, 20: 10}
    fast = {r.id: r.component for r in dedup_components(pairs).collect()}
    dist = {
        r.id: r.component
        for r in dedup_components(pairs, small_graph_threshold=0).collect()
    }
    assert fast == want and dist == want


def test_star_contraction_property(spark):
    """Large-star/small-star contraction vs driver union-find on random
    graphs AND the pathological chain (diameter = n): labels agree exactly
    and rounds stay O(log n) — the chain is the case plain min-label
    propagation degenerates on (n rounds)."""
    import math
    import random

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _driver_union_find,
        star_contraction,
    )

    rng = random.Random(29)
    cases = []
    # random sparse graphs over shuffled (non-contiguous) id spaces
    for trial in range(3):
        n = 60 + 30 * trial
        ids = rng.sample(range(10_000), n)
        edges = [
            tuple(rng.sample(ids, 2)) for _ in range(int(n * 1.3))
        ]
        cases.append((f"random{trial}", edges, n))
    # pathological chain: 10-20-30-...; diameter n, worst case for
    # propagation, must still close in O(log n) star rounds
    chain_n = 256
    chain_ids = [10 * (i + 1) for i in range(chain_n)]
    cases.append(
        ("chain", list(zip(chain_ids, chain_ids[1:])), chain_n)
    )

    for name, edges, n in cases:
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        labels, rounds = star_contraction(df)
        got = {r.id: r.component for r in labels.collect()}
        want = {
            r.id: r.component
            for r in _driver_union_find(edges, spark).collect()
        }
        assert got == want, f"{name}: labels diverge from union-find"
        bound = int(math.log2(n)) + 2
        assert rounds <= bound, f"{name}: {rounds} rounds > O(log n) bound {bound}"


def test_ngram_stoplist_bounds_skew(spark):
    """Adversarial stopword corpus: every doc shares the same boilerplate
    shingles (one hot join key owning |D|^2 rows without a stoplist). With
    max_doc_freq set, boilerplate drops out: boilerplate-only pairs vanish
    and Jaccard is computed over the filtered shingle space, matching a
    brute force over the same space."""
    boiler = "the of and to in is that it for as"  # shared by every doc
    rows = [(i, f"{boiler} unique{i} token{i} filler{i} suffix{i}") for i in range(30)]
    rows.append((100, rows[0][1]))  # true near-dup beyond the boilerplate
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    naive = ngram_jaccard_pairs(df, n=3, threshold=0.5).toPandas()
    # boilerplate alone pushes unrelated docs over threshold: skew AND noise
    assert len(naive) > 1

    out = ngram_jaccard_pairs(df, n=3, threshold=0.5, max_doc_freq=5).toPandas()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    assert set(pairs) == {(0, 100)}  # only the genuine duplicate survives
    assert pairs[(0, 100)] == 1.0  # identical over the filtered space


def test_minhash_universal_finds_near_dups(spark, docs):
    """The oracle-checkable universal-hash MinHash family must find the same
    engineered dups as the xxhash64 production family."""
    df, pdf = docs
    out = minhash_dedup_pairs_universal(df, threshold=0.5).toPandas()
    pairs = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert (1, 102) in pairs
    exact = out[(out.id_a == 0) & (out.id_b == 100)]
    assert len(exact) == 1 and exact.est_jaccard.iloc[0] == 1.0
    texts = dict(zip(pdf.doc_id, pdf.text))
    for a, b in pairs:
        assert _true_jaccard(texts[a], texts[b], n=3) >= 0.3


def test_simhash_md5_near_dups(spark, docs):
    """md5-bit SimHash (oracle-checkable) mirrors the xxhash64 family:
    identical docs at hamming 0, the doctored near-dup found."""
    df, pdf = docs
    out = simhash_dedup_pairs_md5(df, max_hamming=8, blocks=16).toPandas()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.itertuples()}
    assert pairs[(0, 100)] == 0 and pairs[(0, 101)] == 0
    assert (1, 102) in pairs


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered vectors (the realistic embedding shape LSH is built for):
    6 clusters x 5 members, small intra-cluster noise."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 16))
    base = np.vstack(
        [c + 0.15 * rng.standard_normal((5, 16)) for c in centers]
    ).astype(np.float32)
    base[5] = base[4] + rng.standard_normal(16).astype(np.float32) * 0.005  # near-dup
    pdf = pd.DataFrame(
        {"vec_id": range(30), "embedding": [list(map(float, v)) for v in base]}
    )
    return spark.createDataFrame(pdf), base


def _cos_matrix(base):
    x = base / np.linalg.norm(base, axis=1, keepdims=True)
    return x @ x.T


def test_cosine_topk_exact(spark, vectors):
    df, base = vectors
    out = cosine_topk(df, df.filter(F.col("vec_id") < 5), k=3).toPandas()
    cm = _cos_matrix(base.astype(np.float64))
    for q in range(5):
        sims = [(cm[q, c], c) for c in range(30) if c != q]
        want = [c for _, c in sorted(sims, key=lambda t: (-t[0], t[1]))[:3]]
        got = list(out[out.q_id == q].sort_values("rank").c_id)
        assert got == want, f"query {q}"


def test_lsh_ann_recall(spark, vectors):
    df, base = vectors
    exact = cosine_topk(df, df, k=3).toPandas()
    approx = lsh_ann_topk(df, df, k=3, num_planes=4, num_tables=8).toPandas()
    # recall@3 over all queries; generous buckets -> expect high recall
    hits = tot = 0
    for q in range(30):
        want = set(exact[exact.q_id == q].c_id)
        got = set(approx[approx.q_id == q].c_id)
        hits += len(want & got)
        tot += len(want)
    assert hits / tot >= 0.8
    # the engineered near-dup must be found
    assert 5 in set(approx[approx.q_id == 4].c_id)


def test_embedding_dup_pairs(spark, vectors):
    df, base = vectors
    out = embedding_dup_pairs(df, threshold=0.95).toPandas()
    assert (4, 5) in {(r.id_a, r.id_b) for r in out.itertuples()}
    cm = _cos_matrix(base.astype(np.float64))
    for r in out.itertuples():
        assert cm[r.id_a, r.id_b] >= 0.949


def test_ivf_flat_recall(spark, vectors):
    """IVF with a sampled coarse quantizer: generous nprobe recovers the
    exact top-k on the clustered fixture, and the engineered near-dup is
    found."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import ivf_flat_topk

    df, base = vectors
    exact = cosine_topk(df, df, k=3).toPandas()
    approx = ivf_flat_topk(
        df, df, centroid_ids=[0, 5, 10, 15, 20, 25], k=3, nprobe=3
    ).toPandas()
    hits = tot = 0
    for q in range(30):
        want = set(exact[exact.q_id == q].c_id)
        got = set(approx[approx.q_id == q].c_id)
        hits += len(want & got)
        tot += len(want)
    assert hits / tot >= 0.8
    assert 5 in set(approx[approx.q_id == 4].c_id)


def test_cosine_topk_np_equivalent(spark, vectors):
    """The Arrow-batched numpy matmul path must reproduce the JVM fold
    baseline exactly (same pairs, same ranks, cos equal at the rounded
    precision) — it is pinned here instead of the DuckDB oracle because
    BLAS reassociates the float sum."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
        cosine_topk_np,
    )

    df, _ = vectors
    want = cosine_topk(df, df.filter(F.col("vec_id") < 10), k=3).toPandas()
    got = cosine_topk_np(df, df.filter(F.col("vec_id") < 10), k=3).toPandas()
    on = ["q_id", "rank"]
    merged = want.sort_values(on).reset_index(drop=True).merge(
        got.sort_values(on).reset_index(drop=True), on=on, suffixes=("_w", "_g")
    )
    assert len(merged) == len(want) == len(got)
    assert (merged.c_id_w == merged.c_id_g).all()
    assert (merged.cos_sim_w - merged.cos_sim_g).abs().max() <= 1e-4

    # tie stress: many IDENTICAL vectors -> equal cos at the cut; the
    # contract keeps the smallest c_ids (a bare argpartition cut fails this)
    dup = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(20),
                "embedding": [[1.0, 0.0, 0.0, 0.0]] * 15 + [[0.0, 1.0, 0.0, 0.0]] * 5,
            }
        )
    )
    got_t = cosine_topk_np(dup, dup.filter(F.col("vec_id") == 0), k=3).toPandas()
    assert list(got_t.sort_values("rank").c_id) == [1, 2, 3]


def test_ivf_trained_beats_sampled(spark):
    """Trained k-means quantizer vs uniform id-sample quantizer on a
    skew-clustered corpus: random id sampling lands nearly all centroids
    in the dominant cluster, so minority-cluster queries probe the wrong
    lists; trained centroids follow density and recover recall."""
    import numpy as np

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ivf_flat_topk,
        ivf_flat_topk_trained,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((6, 16)) * 3.0
    sizes = [200, 24, 16, 12, 8, 8]
    parts = [
        centers[i] + 0.2 * rng.standard_normal((s, 16)) for i, s in enumerate(sizes)
    ]
    base = np.vstack(parts)
    n = base.shape[0]
    perm = rng.permutation(n)  # shuffle so id order carries no cluster info
    base = base[perm]
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [list(map(float, v)) for v in base]}
    )
    df = spark.createDataFrame(pdf)
    queries = df.filter(F.col("vec_id") < 40)

    def recall(approx, exact):
        hits = tot = 0
        for q in exact.q_id.unique():
            want = set(exact[exact.q_id == q].c_id)
            got = set(approx[approx.q_id == q].c_id)
            hits += len(want & got)
            tot += len(want)
        return hits / tot

    exact = cosine_topk(df, queries, k=5).toPandas()
    sampled_ids = sorted(int(x) for x in rng.choice(n, size=8, replace=False))
    sampled = ivf_flat_topk(
        df, queries, centroid_ids=sampled_ids, k=5, nprobe=2
    ).toPandas()
    cents = train_ivf_centroids(df, k=8, seed=29)
    trained = ivf_flat_topk_trained(df, queries, cents, k=5, nprobe=2).toPandas()
    r_sampled, r_trained = recall(sampled, exact), recall(trained, exact)
    assert r_trained > r_sampled, (r_trained, r_sampled)
    assert r_trained >= 0.9, r_trained


def test_embedding_dup_pairs_lsh_recall_and_plan(spark, vectors):
    """The LSH-routed near-dup path: no cross product anywhere in the
    physical plan (the 100 TB scale requirement), and at true near-dup
    thresholds it recovers the engineered pair the exact variant finds."""
    df, base = vectors
    lsh = embedding_dup_pairs_lsh(df, threshold=0.95, dim=16, seed=29)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    out = lsh.toPandas()
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert (4, 5) in got  # engineered near-dup (cos ~ 1.0)
    cm = _cos_matrix(base.astype(np.float64))
    for a, b in got:
        assert cm[a, b] >= 0.949  # no false positives: every pair verified
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(df, threshold=0.95).toPandas().itertuples()
    }
    assert len(got & exact) / len(exact) >= 0.5  # documented recall floor


def test_rolling_fingerprints_shift_invariant(spark):
    """Content-defined sampling: fingerprints selected by h % p == 0 are
    positions in the CONTENT, not the file — prepending text leaves the
    original document's selected fingerprints intact (the winnowing
    property block-offset schemes lack)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        with_rolling_fingerprints,
    )

    rng = np.random.default_rng(17)
    body = " ".join(rng.choice(WORDS, 400))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [body, "inserted prefix words " + body]})
    )
    fps = {
        r.doc_id: set(r.fingerprints)
        for r in with_rolling_fingerprints(df).select("doc_id", "fingerprints").collect()
    }
    assert fps[1], "selection must be non-empty on a 400-word doc"
    # every fingerprint of the body (minus the first window's worth) survives
    assert len(fps[1] & fps[2]) / len(fps[1]) >= 0.95


def test_frame_sampling_and_resize(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        resize_images,
        sample_frames,
    )

    rows = [
        (1, b"vid-bytes", {"mime": "video/mp4", "width": 640, "height": 480, "duration_ms": 3500, "source_uri": "s3://m/v.mp4"}),
        (2, b"img-bytes", {"mime": "image/png", "width": 100, "height": 80, "duration_ms": None, "source_uri": "s3://m/i.png"}),
    ]
    df = spark.createDataFrame(rows, schema=MULTIMODAL_SCHEMA)

    frames = sample_frames(df, every_ms=1000, max_frames=16).toPandas()
    # 3500ms at 1000ms spacing -> frames at 0,1000,2000,3000; image emits none
    assert frames.media_id.unique().tolist() == [1]
    assert frames.frame_idx.tolist() == [0, 1, 2, 3]
    assert frames.ts_ms.tolist() == [0, 1000, 2000, 3000]
    frames2 = sample_frames(df, every_ms=1000, max_frames=2).toPandas()
    assert len(frames2) == 2  # max_frames cap
    # deterministic frame payloads (stub decode is content-addressed)
    again = sample_frames(df, every_ms=1000, max_frames=16).toPandas()
    assert [bytes(b) for b in frames.frame_payload] == [bytes(b) for b in again.frame_payload]

    resized = resize_images(df, 32, 32).toPandas().set_index("media_id")
    assert resized.loc[2].meta["width"] == 32 and resized.loc[2].meta["height"] == 32
    assert resized.loc[1].meta["width"] == 640  # video untouched
    assert bytes(resized.loc[2].payload) != b"img-bytes"  # payload rewritten
    assert bytes(resized.loc[1].payload) == b"vid-bytes"


def test_multimodal_null_meta_rows(spark):
    """MULTIMODAL_SCHEMA declares meta nullable: NULL-meta rows must flow
    through every multimodal op (no frames, passthrough resize, stub
    features) instead of raising on attribute access."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        resize_images,
        sample_frames,
    )

    rows = [
        (1, b"payload-bytes", None),
        (2, b"img-bytes", {"mime": "image/png", "width": 9, "height": 9, "duration_ms": None, "source_uri": None}),
    ]
    df = spark.createDataFrame(rows, schema=MULTIMODAL_SCHEMA)
    assert sample_frames(df).count() == 0  # null meta emits no frames, no crash
    resized = resize_images(df, 32, 32).toPandas().set_index("media_id")
    assert resized.loc[1].meta is None  # passthrough
    assert bytes(resized.loc[1].payload) == b"payload-bytes"
    assert resized.loc[2].meta["width"] == 32
    feats = decode_and_featurize(df, feat_dim=4).toPandas().set_index("media_id")
    assert feats.loc[1].mime is None and len(feats.loc[1].feature) == 4


def test_real_image_decode_path(spark):
    """When PIL is importable the real decode/resize path must run (skipped
    in containers without it; the stub path is pinned by the other tests)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        resize_images,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
        _PILImage,
    )

    if _PILImage is None:
        pytest.skip("PIL not available in this environment")
    from io import BytesIO

    img = _PILImage.new("L", (8, 8), color=128)
    buf = BytesIO()
    img.save(buf, format="PNG")
    rows = [(1, buf.getvalue(), {"mime": "image/png", "width": 8, "height": 8, "duration_ms": None, "source_uri": None})]
    df = spark.createDataFrame(rows, schema=MULTIMODAL_SCHEMA)
    out = resize_images(df, 4, 4).toPandas()
    decoded = _PILImage.open(BytesIO(bytes(out.payload[0])))
    assert decoded.size == (4, 4)  # a real resized image, not stub digest bytes
    feats = decode_and_featurize(df, feat_dim=4).toPandas()
    # real pixel features of a uniform gray image: all ~128/255 - 0.5
    assert all(abs(v - (128 / 255.0 - 0.5)) < 1e-6 for v in feats.feature[0])


def test_multimodal_plumbing(spark):
    rows = [
        (1, b"\x89PNG fake image bytes", {"mime": "image/png", "width": 4, "height": 4, "duration_ms": None, "source_uri": "s3://m/1.png"}),
        (2, b"RIFF fake wav bytes", {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 1200, "source_uri": "s3://m/2.wav"}),
        (3, None, {"mime": "video/mp4", "width": 640, "height": 480, "duration_ms": 5000, "source_uri": "s3://m/3.mp4"}),
    ]
    df = spark.createDataFrame(rows, schema=MULTIMODAL_SCHEMA)
    meta = attach_media_metadata(df).toPandas()
    assert meta.payload_bytes.tolist()[:2] == [21, 19]
    feats = decode_and_featurize(df, feat_dim=8).toPandas().sort_values("media_id")
    assert list(feats.mime) == ["image/png", "audio/wav", "video/mp4"]
    assert all(len(f) == 8 for f in feats.feature)
    # deterministic: same payload -> same feature
    feats2 = decode_and_featurize(df, feat_dim=8).toPandas().sort_values("media_id")
    assert [list(f) for f in feats.feature] == [list(f) for f in feats2.feature]
    # content hash matches JVM-side sha1
    jvm = attach_media_metadata(df).select("media_id", "content_sha1").toPandas()
    merged = feats.merge(jvm, on="media_id", suffixes=("_py", "_jvm"))
    nonnull = merged[merged.payload_bytes > 0]
    assert (nonnull.content_sha1_py == nonnull.content_sha1_jvm).all()


def test_ivf_assignment_is_narrow(spark, vectors):
    """r4 verdict #4: the candidate-side nearest-centroid assignment must
    not shuffle (the old crossJoin+window expanded n x K rows and shuffled
    them all by id). The fold-based assignment plan is pure projection —
    no Exchange, no Window — and agrees with a brute-force numpy argmax
    (cos desc, cid asc tie-break) on every vector."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
        _nearest_centroid,
    )

    df, base = vectors
    cent_ids = [0, 5, 10, 15, 20, 25]
    cent_list = [(i, [float(x) for x in base[i]]) for i in cent_ids]
    v = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assign = v.select("id", _nearest_centroid(F.col("vec"), cent_list).alias("list_id"))
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan

    got = {r.id: r.list_id for r in assign.collect()}
    x = base.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cm = x @ x[cent_ids].T
    for i in range(len(base)):
        best = max(range(len(cent_ids)), key=lambda j: (cm[i, j], -cent_ids[j]))
        assert got[i] == cent_ids[best], f"vector {i}"


def test_ivf_full_plan_single_window_family(spark, vectors):
    """End-to-end IVF plan: the only window regions left are the small
    query-probe ranking and the final top-k rank — the n x K assignment
    window is gone (count physical ``Window [`` nodes; WindowGroupLimit
    pushdown helpers don't match)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import ivf_flat_topk

    df, _ = vectors
    out = ivf_flat_topk(df, df, centroid_ids=[0, 5, 10, 15, 20, 25], k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 2, plan


def test_ann_recall_monotone_and_full_probe_exact(spark):
    """recall@k is the certified cost of the IVF approximation: it must
    be non-decreasing in nprobe, and probing ALL K lists makes the
    candidate set the whole corpus — recall exactly 1.0 (the estimator
    degrades gracefully to brute force)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ann_recall,
        cosine_topk,
        ivf_flat_topk,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry._common import (
        _ivf_centroid_ids,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        load_table,
    )
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(emb.vec_id < 20)
    exact = cosine_topk(emb, q, k=5).persist()
    cids = _ivf_centroid_ids()
    recalls = []
    for nprobe in (1, 4, len(cids)):
        approx = ivf_flat_topk(emb, q, centroid_ids=cids, k=5, nprobe=nprobe)
        row = ann_recall(exact, approx, 5, nprobe).collect()[0]
        assert row["n_exact"] == 100  # 20 queries x k=5
        recalls.append(row["recall_fp"])
    exact.unpersist()
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1_000_000  # all lists probed == brute force
