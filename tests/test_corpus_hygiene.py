"""Corpus-hygiene operators: PII redaction, benchmark decontamination,
vocab token-id encoding. The registered oracles prove engine parity on the
shared testdata (which contains no PII), so the redaction behavior itself
is pinned here on crafted inputs — INCLUDING a DuckDB cross-check of the
same crafted rows, proving the Java/RE2 pattern-parity claim on text that
actually matches."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
    PII_PATTERNS,
    pii_count,
    pii_redact,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
    build_vocab,
    decontaminate,
    encode_tokens,
)

PII_DOCS = [
    (0, "contact alice.smith+work@example-host.co.uk for details"),
    (1, "ssn on file: 123-45-6789 (verified)"),
    (2, "call +1 (555) 123-4567 or 555.987.6543 today"),
    (3, "server at 192.168.0.1 and backup at 10.0.0.254"),
    (4, "mixed: bob@x.io, 987-65-4321, 212-555-0000, 8.8.8.8"),
    (5, "clean text with no sensitive content at all"),
    (6, "not-an-ip 1234.5.6.7890 and not-a-ssn 1234-56-7890"),
]


def test_pii_redact_crafted(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_redact(F.col("text")).alias("clean"),
            pii_count(F.col("text"), "email").alias("emails"),
            pii_count(F.col("text"), "ssn").alias("ssns"),
            pii_count(F.col("text"), "phone").alias("phones"),
            pii_count(F.col("text"), "ipv4").alias("ips"),
        ).collect()
    }
    assert "<EMAIL>" in out[0].clean and "alice" not in out[0].clean
    assert out[0].emails == 1
    assert out[1].clean == "ssn on file: <SSN> (verified)"
    assert out[2].phones == 2 and out[2].clean.count("<PHONE>") == 2
    assert out[3].ips == 2 and "<IP>" in out[3].clean
    # one of each on the mixed doc; placeholders are typed, not generic
    assert out[4].emails == out[4].ssns == out[4].phones == out[4].ips == 1
    for tag in ("<EMAIL>", "<SSN>", "<PHONE>", "<IP>"):
        assert tag in out[4].clean
    assert out[5].clean == PII_DOCS[5][1]  # clean text untouched
    # \b guards: over-long digit runs are NOT ips/ssns
    assert out[6].ips == 0 and out[6].ssns == 0


def test_pii_redact_duckdb_parity_on_matching_text(spark):
    """Same crafted rows through DuckDB's RE2 with the exact patterns —
    redacted text and all counts must agree with Spark's Java regex."""
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = (
        df.select(
            "doc_id",
            pii_redact(F.col("text")).alias("clean"),
            pii_count(F.col("text"), "email").alias("n_e"),
            pii_count(F.col("text"), "ssn").alias("n_s"),
            pii_count(F.col("text"), "phone").alias("n_p"),
            pii_count(F.col("text"), "ipv4").alias("n_i"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pii", pd.DataFrame(PII_DOCS, columns=["doc_id", "text"]))
    clean = "text"
    for _, pat, rep in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{rep}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{k[0]}"
        for k, pat, _ in PII_PATTERNS
    )
    want = con.sql(
        f"SELECT doc_id, {clean} AS clean, {counts} FROM pii ORDER BY doc_id"
    ).df()
    for c in ("clean", "n_e", "n_s", "n_p", "n_i"):
        assert list(got[c]) == list(want[c]), c


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "completely unrelated text about spark shuffles"),
            (2, "ends with the quick brown fox"),
            (3, "too short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "benchmark says the quick brown fox is classic")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in decontaminate(corpus, bench, n=4).collect()}
    assert set(out) == {0, 1, 2, 3}  # every corpus doc labeled
    assert out[0].contaminated and out[0].n_hits >= 1  # 'the quick brown fox'
    assert out[2].contaminated  # overlap at the doc's tail
    assert not out[1].contaminated and out[1].n_hits == 0
    assert not out[3].contaminated  # shorter than n: no shingles, no flag


def test_decontaminate_counts_distinct_doc_shingles(spark):
    """n_hits counts the doc's DISTINCT contaminated n-grams — a shingle
    repeated inside one doc counts once."""
    corpus = spark.createDataFrame(
        [(0, "a b c d x a b c d")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "z a b c d z")], ["doc_id", "text"])
    out = decontaminate(corpus, bench, n=4).collect()[0]
    assert out.n_hits == 1  # 'a b c d' appears twice in the doc, counts once


def test_encode_tokens_roundtrip(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a cat and a dog"),
        (3, "the bird flew over the log"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    vocab = build_vocab(df, min_df=2, max_df_frac=0.9)
    v = dict(vocab.select("token", "vocab_id").collect())
    out = encode_tokens(df, vocab).toPandas()
    for doc_id, text in docs:
        toks = text.lower().split()
        enc = out[out.doc_id == doc_id].sort_values("pos")
        assert list(enc.pos) == list(range(1, len(toks) + 1))
        assert list(enc.token_id) == [v.get(t, 0) for t in toks]
    assert (out.token_id == 0).any()  # OOV tokens present and mapped to 0


def test_hygiene_plan_shapes(spark):
    """100 TB plan contracts for the hygiene ops: decontaminate joins only
    via broadcast (benchmark shingles + tiny hit set — the corpus side
    never sort-merge-joins or cross-joins); encode_tokens probes the vocab
    by broadcast; domain_mix is a pure narrow filter — NO exchange at all,
    the whole mix is one scan."""
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        stratified_hash_sample,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [f"w{i} w{i+1} w{i+2} w{i+3} common words here" for i in range(40)],
                "source": [f"s{i%3}" for i in range(40)],
            }
        )
    )
    dec = decontaminate(docs.limit(30), docs.filter(F.col("doc_id") >= 30), n=3)
    p = dec._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") == 2  # bench-shingle probe + hits join

    enc = encode_tokens(docs, build_vocab(docs, min_df=2))
    p = enc._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p  # vocab rides a broadcast

    mix = stratified_hash_sample(docs, {"s0": 0.5}, "source", default_fraction=0.1)
    p = mix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p  # narrow filter, one scan
