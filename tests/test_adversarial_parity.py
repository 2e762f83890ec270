"""Adversarial oracle parity: registry faces vs their DuckDB oracles on
GENERATED events tables that force the boundary alignments the shipped
testdata happens never to contain.

Motivation (r16): two latent oracle-convention bugs survived fifteen
all-green driver rounds because the disagreement needed a data alignment
the shipped events table never produces — `session_windows` (Spark's
built-in session_window merges an event at EXACTLY start+gap; the oracle
said >=) and `session_paths` (per-side whole-second truncation vs the
oracle's fractional epoch(): any adjacent pair with a true gap in
(1800, 1801) s whose floors difference to exactly 1800 flips the session
split). The driver's gate can only ever be as adversarial as its data;
this suite generates timestamps that CLUSTER on the gap/tolerance
boundaries (exact-second multiples of the 1800 s gap, ±1 µs neighbors,
large fractional parts) and asserts face == oracle value-exactly, the
same compare the driver runs.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import __spark_entry__ as entrymod
from test_oracle_parity import _normalize

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

_EVENT_TYPES = ("view", "click", "purchase", "scroll", "signup")

# second-scale offsets that sit ON the 30 min / 1 h boundaries the
# session/funnel/attribution faces cut at, plus their neighbors
_BOUNDARY_SECS = st.sampled_from(
    [0, 1, 1799, 1800, 1801, 3599, 3600, 3601, 5400, 7200]
)
# microsecond fractions that make per-side truncation and exact
# arithmetic disagree when they can (0 keeps exact-boundary cases alive)
_FRAC_US = st.sampled_from([0, 1, 100_000, 900_000, 999_999])

_event = st.tuples(
    st.integers(0, 1),  # user_id: collisions guaranteed
    _BOUNDARY_SECS,
    _FRAC_US,
    st.integers(0, 4),  # event_type index
)


def _write_events(rows) -> str:
    """Materialize generated rows as an events.parquet shaped exactly like
    the shipped table (micros timestamps; value in exact quarters so
    DECIMAL-summed oracles stay bit-identical)."""
    pdf = pd.DataFrame(rows, columns=["user_id", "sec", "frac", "ti"])
    pdf["event_id"] = range(len(pdf))
    pdf["ts"] = pd.to_datetime(pdf["sec"] * 1_000_000 + pdf["frac"], unit="us")
    pdf["event_type"] = [_EVENT_TYPES[i] for i in pdf["ti"]]
    pdf["value"] = (pdf["sec"] % 8) * 0.25
    pdf["props"] = "{}"
    out = pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    d = tempfile.mkdtemp(prefix="adversarial_events_")
    out.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def _assert_face_matches_oracle(spark, name: str, sf_dir: str) -> None:
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'events.parquet')}'"
    )
    odf = con.sql(ORACLES[name]).df()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), f"{name}: rows {len(s)} vs {len(o)}"
    for c in s.columns:
        eq = (pd.isna(s[c]) & pd.isna(o[c])) | (s[c] == o[c])
        assert eq.all(), f"{name}: column {c} differs\n{s[~eq.to_numpy()]}\n{o[~eq.to_numpy()]}"


# faces whose outputs are exact under value-hash compare (counts, ids,
# timestamps, DECIMAL-summed or merely CARRIED doubles — no float
# accumulation whose ordering could differ between engines); the float-
# accumulating faces (twap, trend_slopes, decayed/trending, anomaly
# z-scores) stay on the shipped-table parity suite where their values are
# pinned, since cross-engine float-sum ordering is not a contract
@pytest.mark.parametrize(
    "face",
    [
        "session_windows",
        "session_paths",
        "funnel_conversion",
        "attribution_lastclick",
        "asof_enrich",
        "asof_nearest",
        "resample_locf",
        "retention_cohorts",
        "cumulative_actives",
        "scd2_intervals",
        "balance_resets",
        "events_hourly",
        "sliding_windows",
    ],
)
@given(rows=st.lists(_event, min_size=1, max_size=14))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_boundary_events_face_matches_oracle(spark, face, rows):
    d = _write_events(rows)
    try:
        _assert_face_matches_oracle(spark, face, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# documents family: tokenization / regex / length / percentile conventions
# on adversarial strings the shipped corpus never contains (empty text,
# whitespace-only, punctuation runs, accented Latin + CJK codepoints,
# duplicate texts, single-char docs). Java regex (Spark) and RE2 (DuckDB)
# agree on the ASCII classes the faces use — this suite pins that the
# oracles' conventions hold OFF the happy path too.
# ---------------------------------------------------------------------------

_SNIPPETS = (
    "",
    " ",
    "\t\n ",
    "the the the",
    "a",
    "Hello, World!",
    "...!!!???",
    "touché naïve café",
    "数据 引擎 测试",
    "email me at a@b.co or call 555-123-4567",
    "UPPER lower MiXeD",
    "word " * 12,
    "1 22 333 4444",
    "no-punct-just-hyphens",
)


def _write_documents(rows) -> str:
    """rows: list of (snippet_idx, lang_idx, source_idx)."""
    pdf = pd.DataFrame(rows, columns=["si", "li", "oi"])
    pdf["doc_id"] = range(len(pdf))
    pdf["text"] = [_SNIPPETS[i] for i in pdf["si"]]
    pdf["lang"] = [("en", "de", "zh")[i] for i in pdf["li"]]
    pdf["source"] = [("web", "wiki", "code")[i] for i in pdf["oi"]]
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    out = pdf[["doc_id", "text", "lang", "source", "n_chars"]]
    d = tempfile.mkdtemp(prefix="adversarial_docs_")
    out.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


_doc_row = st.tuples(
    st.integers(0, len(_SNIPPETS) - 1),
    st.integers(0, 2),
    st.integers(0, 2),
)


def _assert_docs_face_matches_oracle(spark, name: str, sf_dir: str) -> None:
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    odf = con.sql(ORACLES[name]).df()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), f"{name}: rows {len(s)} vs {len(o)}"
    for c in s.columns:
        eq = (pd.isna(s[c]) & pd.isna(o[c])) | (s[c] == o[c])
        assert eq.all(), (
            f"{name}: column {c} differs\n{s[~eq.to_numpy()]}\n{o[~eq.to_numpy()]}"
        )


@pytest.mark.parametrize(
    "face",
    [
        "explode_tokens",
        "token_counts",
        "token_frequency",
        "bigram_top",
        "text_profile",
        "pii_redact",
        "phrase_search",
        "winsorize_lengths",
        "histogram_profile",
        "doc_quality",
        "gopher_quality",
        "repetition_profile",
        # second wave (r16): chunk boundary arithmetic, ntile ties on
        # duplicate quality scores, md5 hash-threshold splits/samples,
        # sketch replication, exact dedup on duplicate texts
        "vocab_build",
        "dataset_split",
        "hash_sample",
        "chunk_documents",
        "curriculum_buckets",
        "bpe_pair_counts",
        "encode_tokens",
        "normalize_dedup",
        "countmin_tokens",
        "boilerplate_ngrams",
        "cooccurrence_top",
        "dedup_exact",
    ],
)
@given(rows=st.lists(_doc_row, min_size=1, max_size=10))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_documents_face_matches_oracle(spark, face, rows):
    d = _write_documents(rows)
    try:
        _assert_docs_face_matches_oracle(spark, face, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# orders family: duplicate-key ties, quantile/median conventions, set-op
# ALL semantics, and DECIMAL aggregation on adversarial prices (exact-tie
# duplicates, half-cent .005 values, zero). The shipped orders table has
# unique-ish prices, so tie-break and rank-walk conventions are never
# stressed by the driver's gate.
# ---------------------------------------------------------------------------

# cents-aligned (the quantile faces' documented 1/100 lattice contract —
# enforced fail-fast by validate=True since r16, when this suite fed a
# half-cent price and exact_quantiles silently quantized it while its
# ROW_NUMBER oracle returned the raw value); heavy exact-tie duplicates
_PRICES = (0.0, 0.01, 0.02, 1.0, 1.0, 100.5, 100.5, 100.5, 250.25, 99999.99)
_STATUSES = ("O", "F", "P")
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _write_orders(rows) -> str:
    """rows: list of (custkey, price_idx, status_idx, prio_idx, day)."""
    pdf = pd.DataFrame(rows, columns=["ck", "pi", "si", "ri", "day"])
    pdf["o_orderkey"] = range(len(pdf))
    pdf["o_custkey"] = pdf["ck"]
    pdf["o_orderstatus"] = [_STATUSES[i] for i in pdf["si"]]
    pdf["o_totalprice"] = [_PRICES[i] for i in pdf["pi"]]
    pdf["o_orderdate"] = pd.to_datetime("1995-01-01") + pd.to_timedelta(
        pdf["day"], unit="D"
    )
    pdf["o_orderpriority"] = [_PRIORITIES[i] for i in pdf["ri"]]
    out = pdf[
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ]
    ]
    d = tempfile.mkdtemp(prefix="adversarial_orders_")
    out.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    return d


_order_row = st.tuples(
    st.integers(0, 3),                      # custkey: collisions guaranteed
    st.integers(0, len(_PRICES) - 1),       # price: exact-tie duplicates
    st.integers(0, 2),
    st.integers(0, 4),
    st.integers(0, 6),                      # orderdate day offset
)


def _assert_orders_face_matches_oracle(spark, name: str, sf_dir: str) -> None:
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'orders.parquet')}'"
    )
    odf = con.sql(ORACLES[name]).df()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), f"{name}: rows {len(s)} vs {len(o)}"
    for c in s.columns:
        eq = (pd.isna(s[c]) & pd.isna(o[c])) | (s[c] == o[c])
        assert eq.all(), (
            f"{name}: column {c} differs\n{s[~eq.to_numpy()]}\n{o[~eq.to_numpy()]}"
        )


@pytest.mark.parametrize(
    "face",
    [
        "topk_per_group",
        "value_counts",
        "reconcile_counts",
        "except_intersect",
        "exact_quantiles",
        "snapshot_diff",
        "running_window",
        "delta_agg_maintenance",
        "pivot_matrix",
        "hll_profile",
    ],
)
@given(rows=st.lists(_order_row, min_size=1, max_size=14))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_orders_face_matches_oracle(spark, face, rows):
    d = _write_orders(rows)
    try:
        _assert_orders_face_matches_oracle(spark, face, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_exact_quantiles_face_fails_fast_off_lattice(spark):
    """The r16 find, pinned at FACE level: an off-lattice price (half a
    cent) must raise LatticeViolation out of q_exact_quantiles instead of
    being silently quantized into disagreement with the ROW_NUMBER
    oracle. (Operator-level coverage lives in test_edge_inputs; this pins
    that the registered face actually passes validate=True.)"""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        LatticeViolation,
    )

    d = _write_orders([(0, 1, 0, 0, 0)])
    try:
        pdf = pd.read_parquet(os.path.join(d, "orders.parquet"))
        pdf.loc[0, "o_totalprice"] = 0.005  # off the cents lattice
        pdf.to_parquet(os.path.join(d, "orders.parquet"), index=False)
        with pytest.raises(LatticeViolation):
            QUERIES["exact_quantiles"](spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_grouped_quantiles_face_fails_fast_off_lattice(spark):
    """The grouped sibling of the r16 find, now with the r18 FUSED guard
    (no pre-scan — the deviation folds ride the compaction aggregate):
    an off-lattice l_extendedprice must raise the in-plan
    USER_RAISED_EXCEPTION at action time instead of silently quantizing
    into disagreement with the lattice-replay oracle."""
    from pyspark.errors import SparkRuntimeException

    d = _write_lineitem([(1, 0, 0, 0, 0, 0, 1, 1), (1, 1, 1, 1, 1, 1, 2, 2)])
    try:
        pdf = pd.read_parquet(os.path.join(d, "lineitem.parquet"))
        pdf.loc[0, "l_extendedprice"] = 10.005  # half a cent off
        pdf.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
        with pytest.raises(SparkRuntimeException, match="off-lattice"):
            QUERIES["grouped_quantiles"](spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# lineitem family: duplicate-key ties in top-1 selection, cube/rollup null
# groups, weighted rank walks with ZERO weights, DECIMAL sums over heavy
# duplicates. customer+orders family: dangling foreign keys both ways
# (customers with no orders, orders whose custkey has no customer row) and
# balances exactly AT the average — the join-quantifier and strict->
# boundaries the shipped referentially-clean tables never exercise.
# ---------------------------------------------------------------------------

_LI_PRICES = (0.0, 0.01, 100.5, 100.5, 100.5, 250.25, 99999.99)
_QTYS = (0.0, 1.0, 1.0, 50.0)
_FLAGS = ("R", "A", "N")
_STATUS = ("O", "F")


def _write_lineitem(rows) -> str:
    """rows: (orderkey, price_idx, qty_idx, flag_idx, status_idx, day,
    linenumber, partkey) — duplicate (orderkey, shipdate, linenumber,
    partkey) combos happen by construction, stressing keep_first ties."""
    pdf = pd.DataFrame(
        rows, columns=["ok", "pi", "qi", "fi", "si", "day", "ln", "pk"]
    )
    pdf["l_orderkey"] = pdf["ok"]
    pdf["l_partkey"] = pdf["pk"]
    pdf["l_suppkey"] = pdf["pk"] % 2
    pdf["l_linenumber"] = pdf["ln"].astype("int32")
    pdf["l_quantity"] = [_QTYS[i] for i in pdf["qi"]]
    pdf["l_extendedprice"] = [_LI_PRICES[i] for i in pdf["pi"]]
    pdf["l_discount"] = (pdf["pk"] % 3) * 0.05
    pdf["l_tax"] = (pdf["ln"] % 2) * 0.02
    pdf["l_returnflag"] = [_FLAGS[i] for i in pdf["fi"]]
    pdf["l_linestatus"] = [_STATUS[i] for i in pdf["si"]]
    pdf["l_shipdate"] = pd.to_datetime("1995-01-01") + pd.to_timedelta(
        pdf["day"], unit="D"
    )
    out = pdf[
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ]
    ]
    d = tempfile.mkdtemp(prefix="adversarial_li_")
    out.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    return d


_li_row = st.tuples(
    st.integers(0, 2),                      # orderkey
    st.integers(0, len(_LI_PRICES) - 1),
    st.integers(0, len(_QTYS) - 1),         # incl. ZERO quantity/weight
    st.integers(0, 2),
    st.integers(0, 1),
    st.integers(0, 3),                      # shipdate day
    st.integers(1, 2),                      # linenumber: collisions
    st.integers(0, 2),                      # partkey: collisions
)


def _assert_face_matches(spark, name, sf_dir, views):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for v in views:
        con.sql(
            f"CREATE VIEW {v} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, v + '.parquet')}'"
        )
    odf = con.sql(ORACLES[name]).df()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), f"{name}: rows {len(s)} vs {len(o)}"
    for c in s.columns:
        eq = (pd.isna(s[c]) & pd.isna(o[c])) | (s[c] == o[c])
        assert eq.all(), (
            f"{name}: column {c} differs\n{s[~eq.to_numpy()]}\n{o[~eq.to_numpy()]}"
        )


@pytest.mark.parametrize(
    "face",
    [
        "tpch_q1_agg",
        "distinct_rows",
        "top1_per_group",
        "salted_agg",
        "cube_agg",
        "union_concat",
        "unpivot_metrics",
        "grouped_quantiles",
        "weighted_quantiles",
    ],
)
@given(rows=st.lists(_li_row, min_size=1, max_size=12))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_lineitem_face_matches_oracle(spark, face, rows):
    d = _write_lineitem(rows)
    try:
        _assert_face_matches(spark, face, d, ["lineitem"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


_BALANCES = (-10.0, 0.0, 0.01, 100.0, 100.0, 100.0, 5000.55)


def _write_cust_orders(cust_rows, order_rows) -> str:
    c = pd.DataFrame(cust_rows, columns=["ck", "bi", "ni"])
    c["c_custkey"] = c["ck"]
    c["c_name"] = [f"Customer#{k}" for k in c["ck"]]
    c["c_nationkey"] = c["ni"].astype("int32")
    c["c_acctbal"] = [_BALANCES[i] for i in c["bi"]]
    c["c_mktsegment"] = [("BUILDING", "MACHINERY")[i % 2] for i in c["ni"]]
    c = c.drop_duplicates("c_custkey")
    o = pd.DataFrame(order_rows, columns=["ck", "pi", "day"])
    o["o_orderkey"] = range(len(o))
    o["o_custkey"] = o["ck"]  # may dangle past the customer range
    o["o_orderstatus"] = "O"
    o["o_totalprice"] = [_PRICES[i] for i in o["pi"]]
    # straddle Q22's 1998-01-01 recency cut
    o["o_orderdate"] = pd.to_datetime("1997-12-30") + pd.to_timedelta(
        o["day"], unit="D"
    )
    o["o_orderpriority"] = "3-MEDIUM"
    d = tempfile.mkdtemp(prefix="adversarial_co_")
    c[["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]].to_parquet(
        os.path.join(d, "customer.parquet"), index=False
    )
    o[
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"]
    ].to_parquet(os.path.join(d, "orders.parquet"), index=False)
    return d


_cust_row = st.tuples(
    st.integers(0, 5),
    st.integers(0, len(_BALANCES) - 1),     # equal balances AT the average
    st.integers(0, 2),
)
_co_order_row = st.tuples(
    st.integers(0, 7),                      # custkeys 6-7 dangle
    st.integers(0, len(_PRICES) - 1),
    st.integers(0, 4),                      # orderdate straddles the cut
)


@pytest.mark.parametrize(
    "face",
    ["left_join_counts", "semi_join", "anti_join", "tpch_q22_idle_balances"],
)
@given(
    cust_rows=st.lists(_cust_row, min_size=1, max_size=8),
    order_rows=st.lists(_co_order_row, min_size=0, max_size=10),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_cust_orders_face_matches_oracle(spark, face, cust_rows, order_rows):
    d = _write_cust_orders(cust_rows, order_rows)
    try:
        _assert_face_matches(spark, face, d, ["customer", "orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# embeddings family (exact faces only): quantization at EXACT rounding
# midpoints — the face pins floor(x/scale*127 + 0.5) precisely because
# Spark round() is HALF_UP while DuckDB double round() is banker's; the
# shipped random floats never land on a midpoint, so that pin is only
# ever exercised here — and exact duplicate-vector detection.
# ---------------------------------------------------------------------------

_VEC_VALS = (0.0, 0.5, -0.5, 1.0, -1.0, 63.5, -63.5, 127.0, -127.0)


def _write_embeddings(rows) -> str:
    """rows: list of lists of value-indices (dim 64, padded cyclically)."""
    import numpy as np

    recs = []
    for i, idxs in enumerate(rows):
        vec = [np.float32(_VEC_VALS[idxs[j % len(idxs)]]) for j in range(64)]
        recs.append((i, vec, i % 8))
    pdf = pd.DataFrame(recs, columns=["vec_id", "embedding", "label"])
    pdf["label"] = pdf["label"].astype("int32")
    d = tempfile.mkdtemp(prefix="adversarial_emb_")
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(
        pdf,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return d


_emb_row = st.lists(st.integers(0, len(_VEC_VALS) - 1), min_size=1, max_size=8)


@pytest.mark.parametrize("face", ["quantize_embeddings", "embedding_dups_exact"])
@given(rows=st.lists(_emb_row, min_size=1, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_embeddings_face_matches_oracle(spark, face, rows):
    d = _write_embeddings(rows)
    try:
        _assert_face_matches(spark, face, d, ["embeddings"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# fuzzy-match family: Levenshtein on adversarial dictionaries — edit pairs
# at and below the q-gram soundness bound, unicode-accented variants
# (Spark's levenshtein counts codepoints; a byte-counting oracle would
# disagree on é), duplicate names, empty and single-char strings. Plus the
# dims broadcast-join family with dangling nation/region keys.
# ---------------------------------------------------------------------------

_NAMES = (
    "", "a", "ab", "IRAN", "IRAQ", "IRAN ", "CHINA", "CHINE", "chine",
    "café", "cafe", "caff", "ALGERIA", "ALGERIA2", "MOZAMBIQUE",
    "MOZAMBIQUE!", "数据", "数掂",
)


def _write_nation_region(n_rows, r_rows) -> str:
    n = pd.DataFrame(n_rows, columns=["nk", "ni", "rk"])
    n["n_nationkey"] = n["nk"].astype("int32")
    n["n_name"] = [_NAMES[i] for i in n["ni"]]
    n["n_regionkey"] = n["rk"].astype("int32")  # may dangle past regions
    n = n.drop_duplicates("n_nationkey")
    r = pd.DataFrame(r_rows, columns=["rk", "ri"])
    r["r_regionkey"] = r["rk"].astype("int32")
    r["r_name"] = [("AMERICA", "ASIA", "EUROPE")[i] for i in r["ri"]]
    r = r.drop_duplicates("r_regionkey")
    d = tempfile.mkdtemp(prefix="adversarial_dims_")
    n[["n_nationkey", "n_name", "n_regionkey"]].to_parquet(
        os.path.join(d, "nation.parquet"), index=False
    )
    r[["r_regionkey", "r_name"]].to_parquet(
        os.path.join(d, "region.parquet"), index=False
    )
    return d


_nation_row = st.tuples(
    st.integers(0, 9),
    st.integers(0, len(_NAMES) - 1),
    st.integers(0, 3),  # regionkey 3 dangles
)
_region_row = st.tuples(st.integers(0, 2), st.integers(0, 2))


@given(rows=st.lists(_nation_row, min_size=1, max_size=10))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adversarial_fuzzy_join_mixed_matches_oracle(spark, rows):
    d = _write_nation_region(rows, [(0, 0), (1, 1), (2, 2)])
    try:
        _assert_face_matches(spark, "fuzzy_join_mixed", d, ["nation"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    cust_rows=st.lists(_cust_row, min_size=1, max_size=8),
    n_rows=st.lists(_nation_row, min_size=1, max_size=6),
    r_rows=st.lists(_region_row, min_size=1, max_size=3),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.parametrize("face", ["join_dims_broadcast", "rollup_agg"])
def test_adversarial_dims_face_matches_oracle(spark, face, cust_rows, n_rows, r_rows):
    d = _write_nation_region(n_rows, r_rows)
    try:
        c = pd.DataFrame(cust_rows, columns=["ck", "bi", "ni"])
        c["c_custkey"] = c["ck"]
        c["c_name"] = [f"Customer#{k}" for k in c["ck"]]
        c["c_nationkey"] = (c["ni"] * 4).astype("int32")  # some dangle
        c["c_acctbal"] = [_BALANCES[i] for i in c["bi"]]
        c["c_mktsegment"] = "BUILDING"
        c = c.drop_duplicates("c_custkey")
        c[["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]].to_parquet(
            os.path.join(d, "customer.parquet"), index=False
        )
        _assert_face_matches(spark, face, d, ["customer", "nation", "region"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
