"""Distributed BPE trainer vs a pure-Python Sennrich reference: identical
merge tables (order, pairs, counts) and identical final segmentations,
including the left-to-right overlap rule and the </w> boundary marker."""

from __future__ import annotations

import re
from collections import Counter

from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.bpe import (
    EOW,
    segment_words,
    train_bpe_merges,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
    release_plan_caches,
)


def _ref_bpe(texts, n_merges, min_pair_count=2):
    """Sennrich reference: word-frequency table, argmax pair per round
    (count desc, pair asc), left-to-right merge scan."""
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                words[w] += 1
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, n in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        for w in vocab:
            syms, out = vocab[w], []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_bpe_matches_reference_implementation(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "that hat is flat",
        "aaa aaaa aa",  # overlap stressor for the left-to-right rule
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_merges, vocab_df = train_bpe_merges(df, n_merges=10)
    want_merges, want_vocab = _ref_bpe(texts, n_merges=10)
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab_df.collect()}
    release_plan_caches(vocab_df)
    assert got_merges == want_merges
    assert got_vocab == want_vocab
    # the corpus genuinely learned something: at least one multi-char merge
    assert any(len(a + b) > 2 for a, b, _ in got_merges)


def test_bpe_segmentation_inference_replays_merges(spark):
    texts = ["low lower lowest", "low low lowest"] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, vocab_df = train_bpe_merges(df, n_merges=6)
    release_plan_caches(vocab_df)
    _, want_vocab = _ref_bpe(texts, n_merges=6)
    new = spark.createDataFrame([("low",), ("lowest",)], "word string")
    got = {r["word"]: list(r["pieces"]) for r in segment_words(new, merges).collect()}
    assert got["low"] == want_vocab["low"]
    assert got["lowest"] == want_vocab["lowest"]


def test_bpe_min_pair_count_stops_early(spark):
    # every word unique, every pair count 1 -> zero merges at threshold 2
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges, vocab_df = train_bpe_merges(df, n_merges=5, min_pair_count=2)
    release_plan_caches(vocab_df)
    assert merges == []
