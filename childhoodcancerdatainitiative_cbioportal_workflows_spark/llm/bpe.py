"""Distributed BPE merge training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL'16 — public algorithm).

The reference has no tokenizer training; this is part of the LLM-pipeline
extension surface (``bigram_counts`` documents the word-level merge loop —
this is the real character-level trainer). The Sennrich formulation is the
key to scale: merges are learned over the WORD-FREQUENCY TABLE, not the
corpus. One corpus-wide ``groupBy(word)`` up front reduces 100 TB of text
to a vocabulary-sized table (millions of rows, not trillions), and every
merge round then runs over that small table:

  1. explode each word's adjacent symbol pairs, weighted by word count —
     a narrow transform + ONE map-side-combined aggregation;
  2. pick the most frequent pair with ``TakeOrdered(1)`` (deterministic
     tie-break: count desc, pair asc) — a driver argmax over the pair
     vocabulary, the same bounded-collect pattern as pagerank's
     convergence check;
  3. rewrite symbol arrays with a left-to-right fold (``F.aggregate``) —
     narrow, no shuffle; re-persist, release the previous round's cache.

Per round: one shuffle (the pair count) + one narrow rewrite. State stays
executor-side; only the (pair, count) argmax ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.session import spread
from ..functions.text import ws_tokens

#: end-of-word marker (Sennrich convention) so merges can't cross word
#: boundaries and a final symbol "st</w>" differs from mid-word "st"
EOW = "</w>"


def _initial_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n, syms): corpus word frequencies with each word split into
    character symbols + the end-of-word marker."""
    words = (
        spread(df)
        .select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = F.concat(
        F.split(F.col("word"), ""),  # characters
        F.array(F.lit(EOW)),
    )
    return words.select("word", "n", syms.alias("syms"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + F.lit(1)).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(syms, a: str, b: str):
    """Left-to-right merge fold: adjacent (a, b) becomes the single symbol
    a+b; after a merge the NEW symbol is the left context, so overlapping
    occurrences resolve left-first ('aaa' + merge(a,a) -> ['aa','a']),
    matching the reference implementation's scan order."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        # try_element_at: NULL (condition false) on the empty accumulator
        # instead of an ANSI INVALID_ARRAY_INDEX — `when` branches do not
        # short-circuit sibling conjuncts
        lambda out, x: F.when(
            (F.try_element_at(out, F.lit(-1)) == la) & (x == lb),
            F.concat(F.slice(out, 1, F.size(out) - 1), F.array(merged)),
        ).otherwise(F.concat(out, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the ordered
    merge table ``[(a, b, count), ...]`` (the artifact a tokenizer ships)
    and the final (word, n, syms) vocabulary DataFrame (persisted — caller
    releases via ``release_plan_caches``). Stops early when no pair
    reaches ``min_pair_count`` (merging hapax pairs just memorizes
    words)."""
    from .dedup import _with_caches

    # Job economy (r18): each round's argmax job is ALSO the job that
    # materializes the current vocab's cache (persist is lazy), so the
    # old eager `count()` per generation was a whole extra pass over the
    # cached vocabulary — 7 of the face's 13 jobs. The previous
    # generation is released one round LATE (after the argmax job that
    # read it through the new generation's lineage), holding at most two
    # vocabulary-sized caches at once.
    vocab = _initial_vocab(df, text_col).persist()
    prev: DataFrame | None = None
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        nxt = vocab.select(
            "word", "n", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).persist()
        prev = vocab
        vocab = nxt
    caches = [vocab] if prev is None else [vocab, prev]
    return merges, _with_caches(vocab, caches)


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge table to new words (inference face): replay
    the merges in training order over the character split. Adds a
    ``pieces`` array column. Narrow per-row expression chain — the merge
    table is plan-literal, nothing shuffles."""
    syms = F.concat(F.split(F.col(word_col), ""), F.array(F.lit(EOW)))
    for a, b, _ in merges:
        syms = _apply_merge(syms, a, b)
    return words.withColumn("pieces", syms)
