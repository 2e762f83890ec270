"""Adversarial oracle parity, wave 3 (r16 verdict task 4): the graph,
sketch, and composed-flow families — the ~60-face frontier the r16
boundary suites did not reach. Same discipline as
tests/test_adversarial_parity.py: generate inputs that CLUSTER on the
conventions' boundaries (bin edges, exact-overlap fractions, gate-residue
neighbors, duplicate keys, cliques/chains/isolates, single-value and
all-distinct corpora) and assert face == DuckDB oracle value-exactly,
the driver's own compare.

Family-specific alignments the shipped tables never produce:

* graph — the near-dup pair graph of the shipped documents is whatever
  random text gives; here the corpus is ENGINEERED: sliding 6-token
  windows over one token stream form a path graph (hop-bound truncation
  at max_hops), exact-duplicate texts form cliques (triangles, 2-cores,
  zero... all-tied pagerank mass), sub-3-token and empty texts form
  isolated nodes, and duplicate doc rows stress edge dedup.
* sketches — single-value corpora (one distinct key, estimate floor),
  all-distinct corpora, NULL-masked keys, empty probe sides.
* composed flows — interval endpoints ON the 10 kb bin lattice, segments
  spanning bin edges, overlap exactly == 0.5 * gene length (the >= gate),
  touching-but-disjoint intervals (overlap 0), duplicate (chrom, gene)
  loci with equal lengths (keep-longest tie-break), and somatic gate
  residues at their pass/fail boundaries plus DUPLICATE orderkeys
  (duplicate variant IDs through the merge-by-id chain).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from test_adversarial_parity import (
    _assert_face_matches,
    _write_documents,
    _write_orders,
    _write_lineitem,
    _order_row,
    _li_row,
)

# ---------------------------------------------------------------------------
# graph family: pagerank / bfs / sssp / kcore / triangles / components over
# an ENGINEERED near-dup pair graph (word-bigram shingles, jaccard >= 0.5)
# ---------------------------------------------------------------------------

_STREAM = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10".split()
# consecutive 6-token windows share 4 of their 5 shingles (jaccard 4/6) ->
# edges; windows 2+ apart share 3 (3/7) -> none: a 6-node PATH graph
_WINDOWS = [" ".join(_STREAM[i:i + 6]) for i in range(6)]
_GRAPH_SNIPPETS = tuple(_WINDOWS) + (
    "alpha beta gamma delta epsilon zeta",   # clique seed (duplicate it)
    "one two three",                         # minimal 2-shingle doc
    "solo",                                  # < 3 tokens: no shingles
    "",                                      # empty: isolated
)

_graph_row = st.integers(0, len(_GRAPH_SNIPPETS) - 1)


def _write_graph_documents(rows) -> str:
    pdf = pd.DataFrame({"si": rows})
    pdf["doc_id"] = range(len(pdf))
    pdf["text"] = [_GRAPH_SNIPPETS[i] for i in pdf["si"]]
    pdf["lang"] = "en"
    pdf["source"] = "web"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    d = tempfile.mkdtemp(prefix="adversarial_graph_")
    pdf[["doc_id", "text", "lang", "source", "n_chars"]].to_parquet(
        os.path.join(d, "documents.parquet"), index=False
    )
    return d


@pytest.mark.parametrize(
    "face",
    [
        "pagerank",
        "bfs_hops",
        "sssp_weighted",
        "kcore",
        "triangle_count",
        "dedup_components",
    ],
)
@given(rows=st.lists(_graph_row, min_size=1, max_size=9))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_graph_face_matches_oracle(spark, face, rows):
    d = _write_graph_documents(rows)
    try:
        _assert_face_matches(spark, face, d, ["documents"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_adversarial_graph_clique_chain_isolates(spark):
    """Deterministic worst-case composition: a 4-clique (duplicate
    texts: triangles, a surviving 2-core, tied pagerank mass), the
    6-node path (hop-bound truncation: its far end is > max_hops from
    the seeds only if seeds were restricted — here all ids < 100, so
    this pins full reachability instead), and two isolates."""
    rows = [6, 6, 6, 6, 0, 1, 2, 3, 4, 5, 8, 9]
    d = _write_graph_documents(rows)
    try:
        for face in (
            "pagerank", "bfs_hops", "sssp_weighted", "kcore",
            "triangle_count", "dedup_components",
        ):
            _assert_face_matches(spark, face, d, ["documents"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# sketch family: single-value / all-distinct corpora (r16 verdict task 4)
# hll_grouped_profile + hll_overlap ride the existing orders generator;
# heavy_hitters + jaccard_estimate the documents generator; bloom gets a
# combined lineitem+part fixture (probe hits, misses, and an empty seen
# side).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("face", ["hll_grouped_profile", "hll_overlap"])
@given(rows=st.lists(_order_row, min_size=1, max_size=14))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_orders_sketch_face_matches_oracle(spark, face, rows):
    d = _write_orders(rows)
    try:
        _assert_face_matches(spark, face, d, ["orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_adversarial_orders_sketch_single_value_and_all_distinct(spark):
    """The two corpus shapes the estimators are worst at: every row the
    SAME key (distinct=1 floor; custkey 0 additionally NULL-masks in the
    grouped face) and every row a DISTINCT key (estimate ~= n)."""
    single = [(0, 1, 0, 0, 0)] * 10
    distinct = [(ck, 1, 0, ck % 5, ck % 7) for ck in range(4)]
    for rows in (single, distinct):
        d = _write_orders(rows)
        try:
            for face in ("hll_profile", "hll_grouped_profile", "hll_overlap"):
                _assert_face_matches(spark, face, d, ["orders"])
        finally:
            shutil.rmtree(d, ignore_errors=True)


# text-dedup family over the adversarial documents fixture (hash/
# integer-exact outputs: md5 minhash, simhash bits, shingle counts,
# canonical-rep ids — none float-accumulating). Empty/whitespace/CJK/
# duplicate texts stress the shingle and normalization conventions the
# shipped corpus never does.
@pytest.mark.parametrize(
    "face",
    [
        "minhash_lsh", "minhash_lsh_md5", "simhash_pairs", "ngram_jaccard",
        "ngram_jaccard_prefix", "ngram_jaccard_stoplist", "containment_dedup",
        "substring_dedup", "dedup_canonical", "decontaminate",
        "incremental_dedup", "dedup_weights", "rolling_fingerprint",
        "sorted_neighborhood",
    ],
)
@given(rows=st.lists(st.tuples(
    st.integers(0, 13), st.integers(0, 2), st.integers(0, 2)
), min_size=1, max_size=10))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_text_dedup_face_matches_oracle(spark, face, rows):
    d = _write_documents(rows)
    try:
        _assert_face_matches(spark, face, d, ["documents"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


_SKETCH_DOC_ROWS = [
    # single-value corpus: one token repeated — heavy hitter at 100% mass
    [(3, 0, 0)] * 8,
    # all-distinct languages, disjoint vocabularies (jaccard 0 pairs)
    [(5, 0, 0), (8, 1, 1), (12, 2, 2)],
    # identical token sets across languages (jaccard 1 pairs)
    [(3, 0, 0), (3, 1, 0), (3, 2, 0)],
]


@pytest.mark.parametrize("rows", _SKETCH_DOC_ROWS)
def test_adversarial_docs_sketch_corpora(spark, rows):
    d = _write_documents(rows)
    try:
        for face in ("heavy_hitters", "jaccard_estimate"):
            _assert_face_matches(spark, face, d, ["documents"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(rows=st.lists(_li_row, min_size=1, max_size=10), n_parts=st.integers(0, 4))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_bloom_prefilter_matches_oracle(spark, rows, n_parts):
    """Bloom membership with probes that hit, miss, and (day-pool 0-3 is
    entirely before the 1995-03 cut) a seen-side that can also be the
    WHOLE lineitem — n_false_neg must be zero in every draw."""
    d = _write_lineitem(rows)
    try:
        part = pd.DataFrame(
            {
                "p_partkey": pd.array(range(n_parts), dtype="int64"),
                "p_name": [f"part {i}" for i in range(n_parts)],
                "p_brand": "Brand#1",
                "p_type": "STANDARD",
                "p_size": pd.array([i % 5 for i in range(n_parts)], dtype="int32"),
                "p_retailprice": 1.0,
            }
        )
        part.to_parquet(os.path.join(d, "part.parquet"), index=False)
        _assert_face_matches(spark, "bloom_prefilter", d, ["lineitem", "part"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# ANN / clustering family over adversarial embeddings: ZERO vectors
# (undefined cosine — the r16 embedding-dups crash class), exact
# DUPLICATE vectors (cosine 1.0 top-k ties, cut by the c_id tie-break on
# both engines), sign-flipped pairs (cosine exactly -1), and equidistant
# points (nearest-centroid / nearest-neighbour ties).
# ---------------------------------------------------------------------------

from test_adversarial_parity import _write_embeddings, _emb_row  # noqa: E402


@pytest.mark.parametrize(
    "face", ["cosine_topk", "ann_lsh", "ann_ivf", "kmeans_clusters",
             "random_projection", "semantic_dedup"]
)
@given(rows=st.lists(_emb_row, min_size=1, max_size=6))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_ann_face_matches_oracle(spark, face, rows):
    d = _write_embeddings(rows)
    try:
        _assert_face_matches(spark, face, d, ["embeddings"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_adversarial_ann_zero_duplicate_opposite_vectors(spark):
    """Deterministic worst case: an all-zero vector, three exact
    duplicates (tied cosine 1.0), and a sign-flipped copy (cosine
    exactly -1)."""
    rows = [[0], [3], [3], [3], [4], [1, 2]]
    d = _write_embeddings(rows)
    try:
        for face in ("cosine_topk", "ann_lsh", "ann_ivf",
                     "kmeans_clusters", "random_projection",
                     "semantic_dedup"):
            _assert_face_matches(spark, face, d, ["embeddings"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# composed flows: interval_join / cnv_matrix over ENGINEERED loci. The
# faces derive g_start = (p_partkey*37) % 100000 and s_start =
# (o_orderkey*13) % 100000, so partkeys/orderkeys are chosen as the
# modular INVERSES of boundary-clustered target starts (37^-1 = 72973,
# 13^-1 = 23077 mod 100000). Gene length = 200 + 11*p_size; segment
# length = 600; the interval join bins at 10_000 and gates at
# overlap >= 0.5 * gene length.
# ---------------------------------------------------------------------------

_PK = lambda t: (72973 * t) % 100000  # noqa: E731  (g_start == t)
_OK = lambda s: (23077 * s) % 100000  # noqa: E731  (s_start == s)

# gene starts: ON the bin edge, straddling it, and just inside/outside
_GENE_STARTS = (0, 9400, 9600, 9800, 9999, 10000, 10001, 19400, 99800)
_GENE_SIZES = (0, 2, 4, 36)  # lengths 200, 222, 244, 596
# segment starts: spanning the 10k edge from every side + exact-overlap
# anchors (gene [10000,10200] vs seg [9500,10100]: overlap 100 == 0.5*len)
_SEG_STARTS = (0, 9400, 9500, 9700, 9900, 9999, 10000, 10100, 10200, 99700)

_gene_row = st.tuples(
    st.sampled_from(_GENE_STARTS), st.sampled_from(_GENE_SIZES)
)
_seg_row = st.tuples(st.sampled_from(_SEG_STARTS), st.integers(0, 9))


def _write_loci(gene_rows, seg_rows) -> str:
    p = pd.DataFrame(gene_rows, columns=["t", "size"])
    p["p_partkey"] = [_PK(t) for t in p["t"]]
    p = p.drop_duplicates("p_partkey")
    p["p_name"] = [f"gene {t}" for t in p["t"]]
    p["p_brand"] = "Brand#1"
    p["p_type"] = "STANDARD"
    p["p_size"] = p["size"].astype("int32")
    p["p_retailprice"] = 1.0
    o = pd.DataFrame(seg_rows, columns=["s", "ck"])
    o["o_orderkey"] = [_OK(s) for s in o["s"]]
    o = o.drop_duplicates("o_orderkey")
    o["o_custkey"] = o["ck"].astype("int64")
    o["o_orderstatus"] = "O"
    o["o_totalprice"] = 1.0
    o["o_orderdate"] = pd.to_datetime("1995-01-01")
    o["o_orderpriority"] = "3-MEDIUM"
    d = tempfile.mkdtemp(prefix="adversarial_loci_")
    p[["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
      ].to_parquet(os.path.join(d, "part.parquet"), index=False)
    o[["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
       "o_orderdate", "o_orderpriority"]].to_parquet(
        os.path.join(d, "orders.parquet"), index=False
    )
    return d


@pytest.mark.parametrize("face", ["interval_join", "cnv_matrix"])
@given(
    gene_rows=st.lists(_gene_row, min_size=1, max_size=8),
    seg_rows=st.lists(_seg_row, min_size=1, max_size=8),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_loci_face_matches_oracle(spark, face, gene_rows, seg_rows):
    d = _write_loci(gene_rows, seg_rows)
    try:
        _assert_face_matches(spark, face, d, ["part", "orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_adversarial_loci_exact_boundaries(spark):
    """Deterministic pins: overlap exactly 0.5*gene_len (>= gate keeps
    it), touching intervals (overlap 0 drops), a segment spanning the
    bin edge matched to a gene wholly inside the next bin, and two
    equal-length same-(chrom,gene) loci (keep-longest tie-break by
    start)."""
    genes = [(10000, 0), (9800, 0), (19400, 36), (9400, 0), (9600, 0)]
    segs = [(9500, 1), (9400, 2), (9900, 3), (10000, 4), (0, 5)]
    d = _write_loci(genes, segs)
    try:
        for face in ("interval_join", "cnv_matrix"):
            _assert_face_matches(spark, face, d, ["part", "orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# somatic_calls: the composed pedmatch chain over gate-residue orderkeys.
# Survivor gates are pure modular arithmetic on o_orderkey (see
# SQL_SOMATIC_CALLS); the pool clusters on each gate's pass/fail
# boundary, includes fusion keys (k % 13 == 0) with and without the
# normal-twin subtraction (k % 26) and the 3-breakend odd-row drop
# (k % 39 == 0), and custkey 0 trips the 1-tissue/1-blood pairing guard.
# ---------------------------------------------------------------------------

_SOMATIC_KEYS = st.one_of(
    st.sampled_from(
        [
            78,    # full survivor
            90,    # t_depth boundary pass (k%40 == 10) but n_depth fail
            126,   # t_depth fail (k%40 == 6)
            168,   # k%40=8 fail neighbor
            330,   # %5 == 0: FILTER=FAIL
            390,   # %13 == 0 fusion AND %26 == 0: normal twin subtracts
            39,    # fusion, 3-breakend (%39 == 0), odd row drops
            13,    # fusion survivor (odd multiple of 13)
            65,    # fusion but %5 == 0 (FILTER only gates SNVs, not fusions)
            117,   # fusion + 3-breakend, odd multiple
            234,   # %39==0 and %2==0
            0,     # everything-zero row
        ]
    ),
    st.integers(0, 480),
)

_somatic_row = st.tuples(_SOMATIC_KEYS, st.integers(0, 21))


def _write_somatic_cohort(rows, dup_keys: bool) -> str:
    o = pd.DataFrame(rows, columns=["k", "ck"])
    if dup_keys:
        o = pd.concat([o, o.head(2)], ignore_index=True)
    else:
        o = o.drop_duplicates("k")
    o["o_orderkey"] = o["k"].astype("int64")
    o["o_custkey"] = o["ck"].astype("int64")
    o["o_orderstatus"] = "O"
    o["o_totalprice"] = 1.0
    o["o_orderdate"] = pd.to_datetime("1995-01-01")
    o["o_orderpriority"] = "3-MEDIUM"
    c = pd.DataFrame({"c_custkey": pd.array(sorted({ck for _, ck in rows}), dtype="int64")})
    c["c_name"] = [f"Customer#{k}" for k in c["c_custkey"]]
    c["c_nationkey"] = pd.array(c["c_custkey"] % 5, dtype="int32")
    c["c_acctbal"] = 0.0
    c["c_mktsegment"] = "BUILDING"
    d = tempfile.mkdtemp(prefix="adversarial_somatic_")
    o[["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
       "o_orderdate", "o_orderpriority"]].to_parquet(
        os.path.join(d, "orders.parquet"), index=False
    )
    c.to_parquet(os.path.join(d, "customer.parquet"), index=False)
    return d


@given(rows=st.lists(_somatic_row, min_size=1, max_size=12))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_somatic_calls_matches_oracle(spark, rows):
    d = _write_somatic_cohort(rows, dup_keys=False)
    try:
        _assert_face_matches(spark, "somatic_calls", d, ["customer", "orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_adversarial_somatic_calls_duplicate_variant_keys(spark):
    """Duplicate orderkeys mint duplicate variant IDs into the
    merge-by-id chain — the multiplicity convention both engines must
    share (full-outer by id fans out m x n on each side)."""
    rows = [(78, 1), (78, 1), (13, 2), (39, 3), (90, 4)]
    d = _write_somatic_cohort(rows, dup_keys=True)
    try:
        _assert_face_matches(spark, "somatic_calls", d, ["customer", "orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
