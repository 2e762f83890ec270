"""Property-based tests (hypothesis): operator semantics pinned against
brute-force models over generated inputs, not hand-picked fixtures
(SURVEY §5's determinism/ordering concerns, systematically explored).
Example counts are small — every example runs Spark jobs."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
    quality_score,
    token_count,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    interval_join,
    keep_first,
    pair_rows,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_interval = st.tuples(
    st.sampled_from(["chr1", "chr2"]),
    st.integers(0, 400),
    st.integers(1, 300),  # length (allows bin-spanning at bin_size=100)
)


@given(
    left=st.lists(_interval, min_size=1, max_size=12),
    right=st.lists(_interval, min_size=1, max_size=12),
    frac=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
@SETTINGS
def test_interval_join_matches_model(spark, left, right, frac):
    g = pd.DataFrame(
        [(i, c, s, s + ln) for i, (c, s, ln) in enumerate(left)],
        columns=["gid", "chrom", "start", "end"],
    )
    s = pd.DataFrame(
        [(i, c, st_, st_ + ln) for i, (c, st_, ln) in enumerate(right)],
        columns=["sid", "chrom", "start", "end"],
    )
    out = interval_join(
        spark.createDataFrame(g),
        spark.createDataFrame(s),
        bin_size=100,
        min_overlap_frac=frac,
        left_prefix="g_",
        right_prefix="s_",
    ).toPandas()
    m = g.merge(s, on="chrom", suffixes=("_g", "_s"))
    ov = np.minimum(m.end_g, m.end_s) - np.maximum(m.start_g, m.start_s)
    exp = m[(ov > 0) & (ov >= frac * (m.end_g - m.start_g))]
    assert set(zip(out.g_gid, out.s_sid)) == set(zip(exp.gid, exp.sid))
    assert len(out) == len(exp)  # no duplicate pairs from bin spanning


@given(
    sizes=st.lists(st.integers(1, 7), min_size=1, max_size=4),
    drop=st.booleans(),
)
@SETTINGS
def test_pair_rows_model(spark, sizes, drop):
    rows, k = [], 0
    for gi, n in enumerate(sizes):
        for j in range(n):
            rows.append((f"g{gi}", j, f"v{k}"))
            k += 1
    pdf = pd.DataFrame(rows, columns=["grp", "ord", "val"])
    out = (
        pair_rows(spark.createDataFrame(pdf), "grp", "ord", ["val"], drop_unpaired=drop)
        .toPandas()
        .sort_values(["grp", "pair_id"])
    )
    for gi, n in enumerate(sizes):
        got = out[out.grp == f"g{gi}"]
        assert len(got) == (n // 2 if drop else (n + 1) // 2)
        grp_vals = pdf[pdf.grp == f"g{gi}"].sort_values("ord").val.tolist()
        for r in got.itertuples():
            assert r.val_1 == grp_vals[2 * int(r.pair_id)]
            partner = 2 * int(r.pair_id) + 1
            expect_2 = grp_vals[partner] if partner < n else None
            assert (r.val_2 == expect_2) or (expect_2 is None and pd.isna(r.val_2))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 5), st.integers(0, 99)),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_keep_first_matches_pandas(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "uid"]).drop_duplicates("uid")
    out = (
        keep_first(
            spark.createDataFrame(pdf),
            ["k"],
            [F.col("v").asc(), F.col("uid").asc()],  # total order -> determinism
        )
        .toPandas()
        .sort_values("k")
    )
    exp = (
        pdf.sort_values(["k", "v", "uid"]).drop_duplicates("k").sort_values("k")
    )
    assert out.uid.tolist() == exp.uid.tolist()


_texts = st.text(
    alphabet=st.sampled_from(list("ab .!?é中")), max_size=40
)


@given(texts=st.lists(_texts, min_size=1, max_size=10))
@SETTINGS
def test_text_function_bounds(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    out = df.select(
        token_count(F.col("t")).alias("n"), quality_score(F.col("t")).alias("q")
    ).toPandas()
    assert (out.n == pd.Series([len(t.split()) for t in texts])).all()
    assert ((out.q >= 0) & (out.q <= 1)).all()


# --------------------------------------------------- round-5 relevance family

_words = st.sampled_from(["join", "hash", "scan", "stream", "the", "a", "zz9"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=10))
@SETTINGS
def test_bigram_counts_model(spark, texts):
    """Total bigram mass equals sum(max(0, len-1)); counts match a pandas
    model regardless of partitioning."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bigram_counts

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).repartition(5)
    got = {(r.token_a, r.token_b): r.n for r in bigram_counts(df).collect()}
    want: dict[tuple[str, str], int] = {}
    for t in texts:
        tk = t.lower().split()
        for a, b in zip(tk, tk[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
    assert sum(got.values()) == sum(max(0, len(t.split()) - 1) for t in texts)


@given(texts=st.lists(_doc.filter(lambda t: t.strip()), min_size=2, max_size=8))
@SETTINGS
def test_bm25_partitioning_invariant(spark, texts):
    """Scores/ranking are a pure function of the corpus multiset — invariant
    to row order and partitioning."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bm25_topk

    rows = [(i, t) for i, t in enumerate(texts)]
    a = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    b = spark.createDataFrame(rows[::-1], ["doc_id", "text"]).coalesce(1)
    terms = ["join", "zz9"]
    ra = sorted(map(tuple, bm25_topk(a, terms, k=20).collect()))
    rb = sorted(map(tuple, bm25_topk(b, terms, k=20).collect()))
    assert ra == rb


@given(
    n=st.integers(10, 60),
    frac_lo=st.sampled_from([0.0, 0.2, 0.5]),
)
@SETTINGS
def test_weighted_sample_monotone_in_weight(spark, n, frac_lo):
    """Raising every weight can only ADD rows (bucket predicate is monotone
    in the bound) — the property that makes weighted mixes tunable without
    resampling churn."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        weighted_hash_sample,
    )

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    lo = {r.doc_id for r in weighted_hash_sample(df, F.lit(frac_lo)).collect()}
    hi = {r.doc_id for r in weighted_hash_sample(df, F.lit(frac_lo + 0.4)).collect()}
    assert lo <= hi


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400)),  # (key, t-sec)
        min_size=1,
        max_size=25,
    ),
    gap=st.sampled_from([1, 7, 50]),
)
@SETTINGS
def test_throttle_matches_greedy_model(spark, events, gap):
    """throttle_events == the obvious sequential greedy fold, for any
    key mix, duplicate timestamps included (tiebreak = event id)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    import datetime as dt

    rows = [
        (k, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t))
        for i, (k, t) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, eid long, ts timestamp")
    got = {
        r["eid"]
        for r in throttle_events(df, "k", "ts", gap, "eid").collect()
    }
    want = set()
    for k in {r[0] for r in rows}:
        last = None
        for kk, eid, ts in sorted(
            (r for r in rows if r[0] == k), key=lambda r: (r[2], r[1])
        ):
            if last is None or (ts - last).total_seconds() >= gap:
                want.add(eid)
                last = ts
    assert got == want


@given(
    a=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
    b=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
)
@SETTINGS
def test_ks_drift_matches_numpy_model(spark, a, b):
    """ks_drift's integer cross-product KS == the textbook ECDF sup
    distance computed with numpy over the pooled support."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        ks_drift,
    )

    da = spark.createDataFrame([(v,) for v in a], "v int")
    db = spark.createDataFrame([(v,) for v in b], "v int")
    row = ks_drift(da, db, "v", n_buckets=4).collect()[0]
    xs = np.array(sorted(set(a) | set(b)))
    ca = np.array([sum(1 for v in a if v <= x) for x in xs])
    cb = np.array([sum(1 for v in b if v <= x) for x in xs])
    d_cross = int(np.max(np.abs(ca * len(b) - cb * len(a))))
    assert (row["n_a"], row["n_b"], row["d_cross"]) == (len(a), len(b), d_cross)
    assert row["d_fp"] == (d_cross * 1_000_000) // (len(a) * len(b))


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ),
    k=st.sampled_from([2, 3]),
)
@SETTINGS
def test_kcore_matches_python_peel(spark, edges, k):
    """kcore_peel at high iters == the classic repeat-until-fixed-point
    peel on the same undirected simple graph."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )

    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not e:
        return
    pairs = spark.createDataFrame(sorted(e), "id_a long, id_b long")
    got = {
        (r["id"], r["deg"])
        for r in kcore_peel(pairs, k=k, iters=13).collect()
    }
    cur = set(e)
    while True:
        deg: dict[int, int] = {}
        for x, y in cur:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        alive = {v for v, d in deg.items() if d >= k}
        nxt = {(x, y) for x, y in cur if x in alive and y in alive}
        if nxt == cur:
            break
        cur = nxt
    deg = {}
    for x, y in cur:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    want = {(v, d) for v, d in deg.items()}
    assert got == want


def _py_hll(items, p=9):
    """Pure-Python model of the portable HLL — same md5 split, same
    integer lattice (the DuckDB oracle's third sibling)."""
    import hashlib

    m = 1 << p
    regs: dict[int, int] = {}
    for s in items:
        h = hashlib.md5(s.encode("utf-8")).hexdigest()
        idx = int(h[:4], 16) % m
        v = int(h[4:16], 16)
        rho = 49 if v == 0 else 49 - v.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s_sum = sum(1 << (49 - r) for r in regs.values()) + (m - len(regs)) * (
        1 << 49
    )
    a = round(0.7213 / (1.0 + 1.079 / m) * m * m * (1 << 49))
    return regs, s_sum, a // s_sum


@given(
    items=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_hll_matches_python_model(spark, items):
    """The portable HLL's registers AND integer estimate equal a
    pure-Python reimplementation of the same construction on arbitrary
    unicode inputs — md5 split, bin-length rho, integer-lattice sum and
    A div S are engine-independent to the last digit (the property the
    DuckDB oracle certifies on one dataset, here on many)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    df = spark.createDataFrame([(s,) for s in items], "k string")
    sk = hll_sketch(df, "k", 9)
    got_regs = {r["idx"]: r["rho"] for r in sk.collect()}
    row = hll_estimate(sk, 9).collect()[0]
    want_regs, want_s, want_est = _py_hll(items, 9)
    assert got_regs == want_regs
    assert (row["s_sum"], row["est_n"]) == (want_s, want_est)


@given(
    parents=st.lists(
        st.one_of(st.none(), st.integers(0, 24)), min_size=1, max_size=25
    ),
    data=st.data(),
)
@SETTINGS
def test_tree_roots_matches_python_model(spark, parents, data):
    """Pointer doubling == the naive parent chase on ARBITRARY forests:
    node ids 0..n-1, parents drawn from a wider id space so they may be
    self, missing (dangling), NULL, or form deep chains; the healed
    semantics (NULL/absent parent -> self-rooted) and the depth-clamp
    contract (rounds covering >= max depth resolve every node) both hold
    against a step-by-step Python walk."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        tree_roots,
    )

    n = len(parents)
    ids = set(range(n))
    # heal exactly as documented: NULL or absent -> self
    eff = {
        i: (p if (p is not None and p in ids) else i)
        for i, p in enumerate(parents)
    }
    # break accidental cycles (a->b->a): hypothesis may generate them;
    # the operator contract is forests, so re-point one edge of any
    # cycle to self (deterministic: the smallest node in the cycle)
    def chase(i, limit):
        seen = []
        cur = i
        for _ in range(limit + 1):
            if eff[cur] == cur:
                return cur, len(seen)
            seen.append(cur)
            cur = eff[cur]
            if cur in seen:  # cycle: cut it at its smallest member
                eff[min(seen[seen.index(cur):] )] = min(
                    seen[seen.index(cur):]
                )
                return chase(i, limit)
        return cur, len(seen)

    want = {}
    max_depth = 1
    for i in range(n):
        root, depth = chase(i, n)
        want[i] = root
        max_depth = max(max_depth, max(depth, 1))
    rounds = max(1, (max_depth - 1).bit_length())

    # feed Spark the RAW parents (NULL / dangling included) so the
    # operator's own healing is what's under test; only cycle-cut nodes
    # (eff re-pointed to self, a contract repair the operator does not
    # do) are fed their repaired edge
    fed = [
        (
            i,
            i
            if eff[i] == i
            and parents[i] is not None
            and parents[i] in ids
            and parents[i] != i
            else parents[i],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(fed, "node bigint, parent bigint")
    got = {
        r["node"]: r["root"]
        for r in tree_roots(df, "node", "parent", rounds).collect()
    }
    assert got == want


@given(
    cents=st.lists(st.integers(-500, 500), min_size=1, max_size=60),
    nulls=st.integers(0, 5),
    ps=st.lists(
        st.sampled_from([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
@SETTINGS
def test_exact_quantiles_matches_sorted_model(spark, cents, nulls, ps):
    """exact_quantiles (two-phase distributed selection) against the
    brute-force definition: value = sorted(values)[max(1, ceil(p*n)) - 1]
    — the independent MEANING check the oracle-parity suite cannot give
    (parity certifies cross-engine agreement, not the rank contract).
    NULL rows ride along and must not shift ranks (r9 advice)."""
    import math

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        exact_quantiles,
    )

    rows = [(c / 100.0,) for c in cents] + [(None,)] * nulls
    df = spark.createDataFrame(rows, "value double")
    got = {
        r["p"]: (r["value"], r["rank"])
        for r in exact_quantiles(df, "value", ps, n_buckets=4).collect()
    }
    vals = sorted(c / 100.0 for c in cents)
    n = len(vals)
    for p in ps:
        rank = max(1, math.ceil(p * n))
        assert got[p] == (vals[rank - 1], rank), (p, got[p], vals)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(-300, 300),
            st.integers(0, 4),
        ),
        min_size=1,
        max_size=40,
    ),
    p=st.sampled_from([0.25, 0.5, 0.9, 1.0]),
)
@SETTINGS
def test_grouped_weighted_quantiles_match_expansion_model(spark, rows, p):
    """grouped_quantiles with weights against weight EXPANSION: a row of
    weight w must behave exactly like w copies of itself, with rank
    walking total mass via the documented basis-point integer ceil
    ((p_bp*n + 9999) div 10^4). Zero-weight rows contribute nothing;
    groups whose total mass is zero emit no rows."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    df = spark.createDataFrame(
        [(k, c / 100.0, w) for k, c, w in rows],
        "k string, value double, w long",
    )
    got = {
        r["k"]: (r["value"], r["rank"], r["n"])
        for r in grouped_quantiles(
            df, "k", "value", [p], weight_col="w"
        ).collect()
    }
    p_bp = int(round(p * 10000))
    expect = {}
    for key in {k for k, _, _ in rows}:
        expanded = sorted(
            c / 100.0 for k, c, w in rows if k == key for _ in range(w)
        )
        if not expanded:
            continue
        n = len(expanded)
        rank = (p_bp * n + 9999) // 10000
        expect[key] = (expanded[rank - 1], rank, n)
    assert got == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        max_size=30,
    ),
    n_docs=st.integers(1, 25),
)
@SETTINGS
def test_soft_dedup_weights_matches_union_find(spark, edges, n_docs):
    """soft_dedup_weights (AQE-decided join since r13) == a Python
    union-find model on ANY pair graph: every doc's weight is
    floor(1e6 / |its component|), docs outside the pair graph keep 1e6,
    and pair endpoints not present in docs must not leak into the
    output (left join semantics)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        release_plan_caches,
        soft_dedup_weights,
    )

    e = {(a, b) for a, b in edges if a != b}
    docs = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    pairs = spark.createDataFrame(
        sorted(e) or [(0, 0)], "id_a long, id_b long"
    )
    if not e:
        pairs = pairs.filter("id_a != id_a")  # empty pair graph

    out = soft_dedup_weights(docs, pairs)
    got = {r["doc_id"]: r["weight_fp"] for r in out.collect()}
    release_plan_caches(out)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in e:
        parent[find(a)] = find(b)
    sizes: dict[int, int] = {}
    for v in parent:
        r = find(v)
        sizes[r] = sizes.get(r, 0) + 1
    want = {
        i: (1_000_000 // sizes[find(i)] if i in parent else 1_000_000)
        for i in range(n_docs)
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=24,
    ),
)
@settings(
    max_examples=8,  # the star-contraction branch runs iterative Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_components_both_branches_match_union_find(spark, edges):
    """dedup_components' two physical paths — driver union-find (small
    graphs) and alternating large/small-star contraction (the 1M+-edge
    scale path) — must BOTH produce the canonical min-id-reachable
    labeling on ANY pair graph, including self-loops, parallel edges,
    and chains (the diameter-n shape star contraction exists for)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        dedup_components,
    )

    pairs = spark.createDataFrame(sorted(set(edges)), "id_a long, id_b long")

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in set(edges):
        parent[find(a)] = find(b)
    members: dict[int, list[int]] = {}
    for v in parent:
        members.setdefault(find(v), []).append(v)
    want = {
        v: min(vs) for vs in members.values() for v in vs
    }

    fast = {r.id: r.component for r in dedup_components(pairs).collect()}
    slow = {
        r.id: r.component
        for r in dedup_components(pairs, small_graph_threshold=0).collect()
    }
    assert fast == want
    assert slow == want


@given(
    words=st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                 min_size=3, max_size=8),
        min_size=1,
        max_size=4,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minhash_universal_identity_and_disjointness(spark, words):
    """MinHash+LSH structural guarantees on ANY corpus: two docs with
    IDENTICAL text (true Jaccard 1.0) always emit a candidate pair
    (equal shingle sets -> equal signatures -> every band collides,
    est_jaccard = 1); docs sharing NO shingle vocabulary never pair
    (est_jaccard ~ 0 under the threshold, band collisions filtered);
    and output pairs are canonical (id_a < id_b) and distinct."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_dedup_pairs_universal,
    )

    texts = [" ".join(ws) for ws in words]
    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, t))          # original
        rows.append((2 * i + 1, t))      # exact twin
    alien = len(rows)
    rows.append((alien, "zeta eta theta iota kappa"))  # disjoint vocab
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs_universal(
            df, threshold=0.5, num_hashes=16, bands=4
        ).collect()
    }
    for i in range(len(texts)):
        assert (2 * i, 2 * i + 1) in got, (i, texts[i], got)
    assert all(a < b for a, b in got)
    assert not any(alien in pair for pair in got)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["red", "blue", "green", "gold", "gray"]),
                 min_size=3, max_size=10),
        min_size=2,
        max_size=5,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_containment_pairs_matches_set_model(spark, docs):
    """containment_pairs == the brute-force set model
    C(A,B) = |A∩B| / min(|A|,|B|) over distinct word 3-gram shingles,
    for every doc pair, at threshold 0 (full matrix) — pinning the
    explode/self-join/count plan against plain Python sets, including
    the rounding and the id_a < id_b canonicalization."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        containment_pairs,
    )

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, n=3, threshold=0.0).collect()
    }

    def shingles(ws):
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles(docs[i]), shingles(docs[j])
            if a & b:
                want[(i, j)] = round(len(a & b) / min(len(a), len(b)), 4)
    assert got == want


@given(
    vals=st.lists(
        st.one_of(
            st.floats(-5, 5, allow_nan=False),
            st.sampled_from([2.0, 0.3, -0.3, -1.0, 2.0000001, -1.0000001]),
            st.none(),
        ),
        min_size=1,
        max_size=40,
    ),
)
@SETTINGS
def test_gistic_call_matches_reference_branch_order(spark, vals):
    """gistic_call == the reference's exact elif chain (cnv.py:465-481)
    for ANY log2 ratio, pinning the boundary semantics (> / < strict,
    branch order: amp before gain, deep-del before loss) and NULL
    passthrough (CASE WHEN on NULL input falls to the else branch -> 0,
    matching pandas' NaN comparison behavior in the reference)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.genomics import (
        gistic_call,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v double")
    got = {r.i: r.g for r in df.select("i", gistic_call(F.col("v")).alias("g")).collect()}

    def model(v):
        if v is None:
            return 0
        if v > 2.0:
            return 2
        elif v > 0.3:
            return 1
        elif v < -1.0:
            return -2
        elif v < -0.3:
            return -1
        return 0

    assert got == {i: model(v) for i, v in enumerate(vals)}


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["red", "blue", "green", "gold", "gray"]),
                 min_size=3, max_size=10),
        min_size=2,
        max_size=5,
    ),
    threshold=st.sampled_from([0.2, 0.5]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ngram_jaccard_both_plans_match_set_model(spark, docs, threshold):
    """ngram_jaccard_pairs AND its prefix-filtered twin (docstring
    contract: identical output, different physical plan) both equal the
    brute-force set model |A∩B|/|A∪B| over distinct 3-gram shingles —
    the exact-truth construction lsh_recall certifies against. Rounding
    modeled with HALF_UP (Spark's F.round), not Python's bankers'."""
    from decimal import ROUND_HALF_UP, Decimal

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    def shingles(ws):
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles(docs[i]), shingles(docs[j])
            if not (a & b):
                continue
            jac = float(
                (Decimal(len(a & b)) / Decimal(len(a | b))).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
            if jac >= threshold:
                want[(i, j)] = jac

    for fn in (ngram_jaccard_pairs, ngram_jaccard_pairs_prefix):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in fn(df, n=3, threshold=threshold).collect()
        }
        assert got == want, (fn.__name__, got, want)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=12),
        min_size=2,
        max_size=5,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_spans_matches_python_model(spark, docs):
    """exact_substring_spans (posexplode + distinct-doc gram count +
    gaps-and-islands window) == a direct Python model of the RefinedWeb
    exact-substring shape on ANY corpus: same duplicated-gram set, same
    island merging (gap > L starts a new island), same integer coverage
    arithmetic, docs without duplicated spans absent from the output."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        exact_substring_spans,
    )

    L = 2
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_islands, r.dup_tokens, r.n_tokens, r.dup_frac_fp)
        for r in exact_substring_spans(df, gram_words=L, min_docs=2).collect()
    }

    grams_by_doc = []
    for ws in docs:
        grams_by_doc.append(
            {i + 1: " ".join(ws[i:i + L]) for i in range(len(ws) - L + 1)}
        )
    from collections import defaultdict
    gram_docs = defaultdict(set)
    for d, gmap in enumerate(grams_by_doc):
        for g in gmap.values():
            gram_docs[g].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}

    want = {}
    for d, gmap in enumerate(grams_by_doc):
        pos = sorted(p for p, g in gmap.items() if g in dup)
        if not pos:
            continue
        islands = []
        for p in pos:
            if islands and p - islands[-1][-1] <= L:
                islands[-1].append(p)
            else:
                islands.append([p])
        covered = sum(isl[-1] - isl[0] + L for isl in islands)
        n_tok = len(docs[d])
        want[d] = (len(islands), covered, n_tok, covered * 1_000_000 // n_tok)
    assert got == want


@given(
    corpus=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    ),
    bench=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "q"]), min_size=1, max_size=6),
        min_size=1,
        max_size=3,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decontaminate_matches_set_model(spark, corpus, bench):
    """decontaminate (broadcast benchmark-shingle probe) == the direct
    set model on ANY corpus/benchmark pair: n_hits = |doc's distinct
    3-grams ∩ benchmark 3-gram union|, contaminated = n_hits > 0, and
    EVERY corpus doc appears in the output (clean docs with 0), short
    docs included (fewer than n tokens -> no shingles -> clean)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        decontaminate,
    )

    N = 3
    cdf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    bdf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(bench)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in decontaminate(cdf, bdf, n=N).collect()
    }

    def sh(ws):
        return {" ".join(ws[i:i + N]) for i in range(len(ws) - N + 1)}

    bench_sh = set().union(*(sh(ws) for ws in bench)) if bench else set()
    want = {}
    for i, ws in enumerate(corpus):
        hits = len(sh(ws) & bench_sh)
        want[i] = (hits, hits > 0)
    assert got == want


# ------------------------------------------------- round-15 order-sensitive family
# (r14 verdict task 5: the remaining order-sensitive operators pinned
# against brute-force Python models — asof tie rules, top-k under
# duplicate sort keys, breakend pairing under interleaved arrival.)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10)), min_size=1, max_size=10
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10)), min_size=1, max_size=10
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    allow_exact=st.booleans(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_tie_model(spark, left, right, direction, allow_exact):
    """asof_join == the documented tie model on ANY (key, ts) multiset:
    backward = max ts at-or-before (max tiebreak among equal right ts),
    forward = min ts at-or-after (min tiebreak), nearest = the closer of
    the two with equal distance breaking BACKWARD (pandas convention);
    strict inequalities when allow_exact_matches=False. Small ts/key
    domains force heavy tie collisions on both sides."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        asof_join,
    )

    lpdf = pd.DataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], columns=["k", "ts", "lid"]
    )
    rpdf = pd.DataFrame(
        [(k, ts, i, 100 + i) for i, (k, ts) in enumerate(right)],
        columns=["k", "ts", "tb", "val"],
    )
    out = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        on=["k"],
        ts="ts",
        right_cols=["val"],
        tiebreak="tb",
        direction=direction,
        allow_exact_matches=allow_exact,
    ).toPandas()
    got = {r.lid: (None if pd.isna(r.asof_val) else int(r.asof_val))
           for r in out.itertuples()}

    def model(k, ts):
        cand = rpdf[rpdf.k == k]
        back = cand[(cand.ts <= ts)] if allow_exact else cand[(cand.ts < ts)]
        fwd = cand[(cand.ts >= ts)] if allow_exact else cand[(cand.ts > ts)]
        b = None
        if len(back):
            m = back[back.ts == back.ts.max()]
            b = m.loc[m.tb.idxmax()]
        f = None
        if len(fwd):
            m = fwd[fwd.ts == fwd.ts.min()]
            f = m.loc[m.tb.idxmin()]
        if direction == "backward":
            pick = b
        elif direction == "forward":
            pick = f
        elif b is None or f is None:
            pick = b if f is None else f
        else:  # nearest: strictly closer forward wins, ties go backward
            pick = f if (f.ts - ts) < (ts - b.ts) else b
        return None if pick is None else int(pick.val)

    want = {int(r.lid): model(r.k, r.ts) for r in lpdf.itertuples()}
    assert got == want
    assert len(out) == len(lpdf)  # enrichment never drops/duplicates left rows


@given(
    arrivals=st.lists(st.integers(0, 2), min_size=1, max_size=14),
    drop=st.booleans(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pair_rows_interleaved_arrival_model(spark, arrivals, drop):
    """pair_rows == the reference's 2-at-a-time loop on a random
    INTERLEAVED FUSION_ID arrival sequence (the existing model test
    feeds contiguous groups; the reference's file order interleaves
    breakend groups freely and pairs each group's rows in file order).
    The arrival index is the order column, as a scan-attached
    monotonically_increasing_id would be; the input is repartitioned so
    physical layout can't stand in for the order column."""
    pdf = pd.DataFrame(
        [(f"g{g}", i, f"v{i}") for i, g in enumerate(arrivals)],
        columns=["grp", "ord", "val"],
    )
    out = (
        pair_rows(
            spark.createDataFrame(pdf).repartition(5),
            "grp", "ord", ["val"], drop_unpaired=drop,
        )
        .toPandas()
        .sort_values(["grp", "pair_id"])
    )
    want = []
    for g in sorted({f"g{a}" for a in arrivals}):
        vals = pdf[pdf.grp == g].sort_values("ord").val.tolist()
        for p in range(0, len(vals), 2):
            if p + 1 < len(vals):
                want.append((g, p // 2, vals[p], vals[p + 1]))
            elif not drop:
                want.append((g, p // 2, vals[p], None))
    got = [
        (r.grp, int(r.pair_id), r.val_1, None if pd.isna(r.val_2) else r.val_2)
        for r in out.itertuples()
    ]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3)), min_size=1, max_size=20
    ),
    k=st.integers(1, 3),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_keep_topk_duplicate_sort_keys(spark, rows, k):
    """keep_topk under DUPLICATE sort keys (tiny v domain forces ties):
    (a) with a total order (v, uid) the surviving uids equal the pandas
    head(k) exactly, independent of input partitioning; (b) ordered on
    the duplicated v alone, row identity is unspecified but the per-group
    row count is min(k, group size) and the surviving v-multiset is the
    k smallest of the group's v-multiset — the value-level guarantee the
    registry faces rely on when they append uid tiebreakers."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        keep_topk,
    )

    pdf = pd.DataFrame(
        [(kk, v, i) for i, (kk, v) in enumerate(rows)], columns=["k", "v", "uid"]
    )
    df = spark.createDataFrame(pdf).repartition(7)

    total = keep_topk(df, ["k"], [F.col("v").asc(), F.col("uid").asc()], k).toPandas()
    exp = pdf.sort_values(["k", "v", "uid"]).groupby("k").head(k)
    assert sorted(total.uid) == sorted(exp.uid)

    dup = keep_topk(df, ["k"], [F.col("v").asc()], k).toPandas()
    for kk, grp in pdf.groupby("k"):
        got_v = sorted(dup[dup.k == kk].v.tolist())
        want_v = sorted(grp.v.tolist())[: min(k, len(grp))]
        assert got_v == want_v


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 300), st.integers(0, 50)),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_resample_locf_matches_model(spark, rows):
    """resample_locf == the brute-force carry model on ANY irregular
    (key, ts) multiset with heavy duplicate timestamps: one row per
    (key, minute bucket) from trunc(min) to trunc(max); the carried
    value at tick t is the event with the greatest ts <= t, ties broken
    by greatest tiebreak (the asof pin); ticks before the key's first
    event carry null. The tiny ts domain (<=5 minutes of seconds)
    forces same-second collisions and grid ticks that coincide exactly
    with event instants (the at-or-before INCLUSIVE edge)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        resample_locf,
    )

    pdf = pd.DataFrame(
        [(k, s, v, i) for i, (k, s, v) in enumerate(rows)],
        columns=["k", "sec", "v", "uid"],
    )
    pdf["ts"] = pd.to_datetime(pdf["sec"], unit="s")
    out = resample_locf(
        spark.createDataFrame(pdf[["k", "ts", "v", "uid"]]).repartition(5),
        ["k"], "ts", "v", step="1 minute", unit="minute", tiebreak="uid",
    ).toPandas()

    want = {}
    for k, grp in pdf.groupby("k"):
        lo = (grp.sec.min() // 60) * 60
        hi = (grp.sec.max() // 60) * 60
        for tick in range(int(lo), int(hi) + 1, 60):
            elig = grp[grp.sec <= tick]
            if len(elig):
                m = elig[elig.sec == elig.sec.max()]
                val = int(m.loc[m.uid.idxmax()].v)
            else:
                val = None
            want[(k, tick)] = val
    got = {
        (r.k, int(r.bucket.timestamp())): (
            None if pd.isna(r.locf_value) else int(r.locf_value)
        )
        for r in out.itertuples()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 8), st.integers(-5, 5)),
        min_size=1,
        max_size=18,
    ),
    width=st.integers(0, 4),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_frame_includes_equal_ts_peers(spark, rows, width):
    """A trailing RANGE frame [sec-width, sec] == the brute-force model
    on ANY (user, sec) multiset with heavy collisions: every peer at
    the SAME sec is in every such row's frame regardless of intra-second
    order or physical partitioning (the semantic q_range_rolling's
    trailing-1h frame relies on; rows-frame windows would disagree here
    whenever duplicates exist). width=0 pins the degenerate
    current-second-only frame."""
    from pyspark.sql import Window

    pdf = pd.DataFrame(rows, columns=["u", "sec", "v"])
    w = (
        Window.partitionBy("u")
        .orderBy("sec")
        .rangeBetween(-width, Window.currentRow)
    )
    out = (
        spark.createDataFrame(pdf)
        .repartition(5)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("v").over(w))
        .toPandas()
    )
    for r in out.itertuples():
        frame = pdf[(pdf.u == r.u) & (pdf.sec >= r.sec - width) & (pdf.sec <= r.sec)]
        assert r.n == len(frame)
        assert r.s == frame.v.sum()


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(0, 3)),
        min_size=0,
        max_size=16,
    ),
    seeds=st.lists(st.integers(0, 7), min_size=1, max_size=3),
    hops=st.integers(0, 3),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sssp_hops_matches_bellman_ford_model(spark, edges, seeds, hops):
    """sssp_hops == hop-bounded Bellman-Ford on ANY small multigraph,
    including ZERO-weight edges (w=0 relaxations produce equal-not-
    better labels, which must NOT re-enter the frontier — the
    frontier-only relaxation's termination argument — yet equal-cost
    paths through them must still resolve to the same min), self-loops,
    parallel edges with different weights, and multi-seed source sets.
    The fixed-seed model test (test_analytics_ops) never generates w=0."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        sssp_hops,
    )

    e = spark.createDataFrame(
        edges or [(0, 0, 0)], "src bigint, dst bigint, wt bigint"
    )
    if not edges:
        e = e.filter("src < 0")  # truly empty edge set, schema kept
    got = {
        r["node"]: r["dist"]
        for r in sssp_hops(
            e,
            spark.createDataFrame([(s,) for s in set(seeds)], "node bigint"),
            hops,
        ).collect()
    }
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    best = {s: 0 for s in set(seeds)}
    for _ in range(hops):
        prev = dict(best)
        for u, du in prev.items():
            for v, w in adj.get(u, ()):
                if du + w < best.get(v, 1 << 60):
                    best[v] = du + w
    assert got == best


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 120), st.integers(0, 9)),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_greedy_model(spark, rows):
    """sessionize (batch face of the built-in session_window) == the
    greedy gap model on ANY (user, ts) multiset with a 30s gap: a new
    session starts when ts - prev_ts > gap, STRICT — an event at EXACTLY
    the gap boundary MERGES into the running session (probed against
    Spark's session_window; this test originally modeled >= and
    hypothesis found the counterexample [(0,0),(0,30)] in r16 — the
    registry's SQL_SESSION_WINDOWS oracle carried the same >= and was
    fixed with it), session_end = last_ts + gap, same-instant duplicates
    land in one session. The tiny ts domain forces boundary-exact and
    duplicate collisions the shipped events table never contains (its
    microsecond timestamps never produce an exact-gap pair, which is how
    >= survived fifteen green rounds)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.streaming.events import (
        sessionize,
    )

    pdf = pd.DataFrame(rows, columns=["user_id", "sec", "v"])
    pdf["ts"] = pd.to_datetime(pdf["sec"], unit="s")
    pdf["value"] = pdf["v"].astype(float)
    out = sessionize(
        spark.createDataFrame(pdf[["user_id", "ts", "value"]]).repartition(5),
        gap="30 seconds",
    ).toPandas()

    GAP = 30
    want = []
    for u, grp in pdf.groupby("user_id"):
        cur = None
        for r in grp.sort_values("sec").itertuples():
            if cur is None or r.sec - cur["last"] > GAP:
                if cur is not None:
                    want.append(cur)
                cur = {"u": u, "start": r.sec, "last": r.sec, "n": 0, "s": 0.0}
            cur["last"] = r.sec
            cur["n"] += 1
            cur["s"] += r.value
        want.append(cur)
    want_set = {
        (c["u"], c["start"], c["last"] + GAP, c["n"], c["s"]) for c in want
    }
    got_set = {
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            int(r.n_events),
            float(r.sum_value),
        )
        for r in out.itertuples()
    }
    assert got_set == want_set


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5)),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_intervals_matches_model(spark, rows):
    """scd2_intervals == the lead model on ANY keyed change stream with
    DUPLICATE change timestamps: per key ordered by (ts, tiebreak), each
    row's valid_to is the next row's ts (equal-ts duplicates produce
    empty [t, t) intervals rather than being merged or dropped — the
    pinned tiebreak convention), exactly one open (is_current) row per
    key, and no input row lost."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        scd2_intervals,
    )

    pdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)], columns=["k", "t", "uid"]
    )
    out = (
        scd2_intervals(
            spark.createDataFrame(pdf).repartition(5), ["k"], "t", tiebreak="uid"
        )
        .toPandas()
        .sort_values("uid")
    )
    want = []
    for k, grp in pdf.groupby("k"):
        ordered = grp.sort_values(["t", "uid"]).reset_index(drop=True)
        for i, r in ordered.iterrows():
            nxt = ordered.t.iloc[i + 1] if i + 1 < len(ordered) else None
            want.append((int(r.uid), int(r.t), nxt, nxt is None))
    want.sort()
    got = [
        (
            int(r.uid),
            int(r.valid_from),
            None if pd.isna(r.valid_to) else int(r.valid_to),
            bool(r.is_current),
        )
        for r in out.itertuples()
    ]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-9, 9)),
        min_size=1,
        max_size=20,
    ),
    salt=st.sampled_from([1, 2, 16]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_aggregate_equals_plain_groupby(spark, rows, salt):
    """salted_aggregate == the plain one-phase groupBy for EVERY
    re-combinable aggregate and ANY salt factor (including the
    degenerate salt=1): salting may only change the exchange shape,
    never the answer. Random values exercise min/max ties and negative
    sums."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        salted_aggregate,
    )

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    df = spark.createDataFrame(pdf).repartition(5)
    got = (
        salted_aggregate(
            df,
            ["k"],
            {
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            salt=salt,
        )
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    exp = pdf.groupby("k").agg(s=("v", "sum"), n=("v", "count"),
                               lo=("v", "min"), hi=("v", "max")).sort_index()
    assert got.s.to_dict() == exp.s.to_dict()
    assert got.n.to_dict() == {k: int(v) for k, v in exp.n.to_dict().items()}
    assert got.lo.to_dict() == exp.lo.to_dict()
    assert got.hi.to_dict() == exp.hi.to_dict()


_span_interval = st.tuples(
    st.sampled_from(["chr1", "chr2"]),
    st.integers(0, 5000),
    st.integers(0, 3000),  # length 0 => zero-length interval (must drop)
)


@given(
    left=st.lists(_span_interval, min_size=1, max_size=8),
    right=st.lists(_span_interval, min_size=1, max_size=8),
    frac=st.sampled_from([None, 0.5]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_bin_width_invariance(spark, left, right, frac):
    """r15 verdict task 5: the bin width is a purely PHYSICAL knob — the
    result set must be identical for any W. The subtle piece is the
    shuffle-free dedup (interval_join.py: keep the pair only in the bin
    holding the overlap start): at W=16 a 3000 bp interval spans ~190
    bins and every spanned bin sees the pair, while at W=1M everything
    lands in one bin and the dedup filter must be a no-op. Zero-length
    intervals (end == start) must vanish identically at every width."""
    g = pd.DataFrame(
        [(i, c, s, s + ln) for i, (c, s, ln) in enumerate(left)],
        columns=["gid", "chrom", "start", "end"],
    )
    s_ = pd.DataFrame(
        [(i, c, st_, st_ + ln) for i, (c, st_, ln) in enumerate(right)],
        columns=["sid", "chrom", "start", "end"],
    )
    results = []
    for w in (16, 1024, 1_000_000, "auto"):
        out = interval_join(
            spark.createDataFrame(g),
            spark.createDataFrame(s_),
            bin_size=w,
            min_overlap_frac=frac,
            left_prefix="g_",
            right_prefix="s_",
        ).toPandas()
        results.append(
            sorted(zip(out.g_gid, out.s_sid, out.overlap_bp))
        )
    assert results[0] == results[1] == results[2] == results[3]


_maf_status = st.sampled_from(["SUCCESS", "FAILED"])
_maf_chrom = st.sampled_from(["chr1", "chr2", "KI270713.1", "chrUn_KI270442v1"])
_maf_barcode = st.sampled_from(["s0", "s1", "s2", None, ""])


@given(
    maf_rows=st.lists(
        st.tuples(_maf_barcode, _maf_status, _maf_chrom), min_size=1, max_size=24
    ),
    ledger_delta=st.lists(st.sampled_from([0, 0, 1, -1, None]), min_size=3, max_size=3),
    gz=st.lists(st.booleans(), min_size=3, max_size=3),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_concat_maf_check_matches_pandas_model(spark, maf_rows, ledger_delta, gz):
    """r15 verdict task 5: concat_maf_check's ledger arithmetic
    (plans/vcf_anno.py, the reference's wc-l reconciliation at
    vcf_anno.py:400-483) vs a pandas model. Covers: per-file counts that
    agree / are off by one / are MISSING (null line_count — eqNullSafe
    semantics: null == null is a match, null vs a count is a mismatch),
    FAILED rows with the KI2* contig exemption, null/empty barcodes
    (misformatted, excluded from cleaned), and the rerun routing being
    the UNION of mismatch samples and FAILED samples."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.vcf_anno import (
        concat_maf_check,
    )

    samples = ["s0", "s1", "s2"]
    maf = pd.DataFrame(
        maf_rows, columns=["Tumor_Sample_Barcode", "Annotation_Status", "Chromosome"]
    )
    manifest = pd.DataFrame(
        {
            "sample": samples,
            "file_url": [
                f"s3://bkt/in/{s}.vcf" + (".gz" if z else "")
                for s, z in zip(samples, gz)
            ],
        }
    )
    true_counts = maf.groupby("Tumor_Sample_Barcode").size()
    pfc_rows = []
    for s, d in zip(samples, ledger_delta):
        if d is None:
            continue  # this file's individual MAF count is missing
        pfc_rows.append((f"{s}_annotated.maf", int(true_counts.get(s, 0)) + d))
    pfc = pd.DataFrame(pfc_rows, columns=["file_name", "line_count"])

    out = concat_maf_check(
        spark.createDataFrame(maf),
        spark.createDataFrame(manifest),
        spark.createDataFrame(
            pfc
            if len(pfc)
            else pd.DataFrame({"file_name": pd.Series(dtype="object"),
                               "line_count": pd.Series(dtype="int64")})
        ),
    )

    # pandas model of vcf_anno.py:400-483
    ind = {r.file_name: r.line_count for r in pfc.itertuples()}
    concat_counts = {
        b: n for b, n in true_counts.items() if b is not None and b != ""
    }
    mismatch_samples = set()
    for s in samples:
        individual = ind.get(f"{s}_annotated.maf")  # None when file missing
        concat = concat_counts.get(s)  # None when sample absent from concat
        if individual != concat:  # eqNullSafe: None == None is a MATCH
            mismatch_samples.add(s)
    # NB: the Spark face does NOT exclude null/"" barcodes from `failed`
    # (they group under their own keys); they just never match a manifest
    # sample downstream, so they can't route anything to rerun
    failed_counts = {}
    for r in maf.itertuples():
        if r.Annotation_Status == "FAILED" and "KI2" not in r.Chromosome:
            failed_counts[r.Tumor_Sample_Barcode] = (
                failed_counts.get(r.Tumor_Sample_Barcode, 0) + 1
            )
    rerun = mismatch_samples | {b for b in failed_counts if b in samples}
    n_misformatted = int(
        (maf.Tumor_Sample_Barcode.isna() | (maf.Tumor_Sample_Barcode == "")).sum()
    )
    cleaned_counts = {
        b: n for b, n in concat_counts.items() if b not in rerun
    }

    ledger = out["ledger"].toPandas().set_index("sample")
    assert set(ledger.index[ledger.mismatch]) == mismatch_samples
    got_failed = {
        r.Tumor_Sample_Barcode: r.failed_annotations
        for r in out["failed"].toPandas().itertuples()
    }
    assert got_failed == failed_counts
    assert out["misformatted"].count() == n_misformatted
    got_cleaned = (
        out["cleaned_maf"].toPandas().groupby("Tumor_Sample_Barcode").size().to_dict()
    )
    assert got_cleaned == cleaned_counts
    assert set(out["rerun_manifest"].toPandas()["sample"]) == rerun
