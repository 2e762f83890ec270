"""Keyword relevance and language-model quality scoring (SURVEY §7 P7).

Two retrieval/quality faces a training-data pipeline needs over the
``documents`` table:

* :func:`bm25_topk` — classic BM25 keyword search. The 100 TB shape: the
  corpus is NEVER exploded or shuffled — per-query-term term frequencies
  are narrow array folds per row, the corpus statistics (N, avgdl, per-term
  document frequencies) reduce to ONE row that rides a broadcast, and the
  final top-k is a TakeOrderedAndProject (no global sort). Scoring 100 TB
  is two narrow scans: one for the stats row, one map-side score pass.
* :func:`unigram_logprob_profile` — per-document mean unigram log
  probability under the corpus's own Laplace-smoothed unigram LM (the
  cheap KenLM-ish quality signal: gibberish/rare-token documents score
  low). The unigram table is vocabulary-sized, built with one shuffle and
  broadcast back; the per-document reduction micro-batches via map-side
  combine (a document's tokens are co-located in its input split, so the
  partial aggregation collapses to ~1 row per doc before the exchange).

Determinism contract (both engines must agree bit-for-bit for the DuckDB
oracle): every transcendental result is floor-scaled immediately
(``floor(ln(x)*1e6)`` as BIGINT), sums of per-token values are integer
sums of those scaled BIGINTs (order-independent — double sums are not),
and each final score performs at most ONE double division of exact
integers. BM25's per-document score is a fixed-order ``+`` chain over the
query terms, not an aggregation, so no ordering ambiguity exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.session import spread
from ..functions.text import ws_tokens

#: fixed-point scale for log-probability / idf values; 1e-6 granularity
#: keeps 15 significant digits of headroom inside BIGINT for corpus sums
LOG_SCALE = 1_000_000


def _scaled_ln(x) -> F.Column:
    """floor(ln(x) * 1e6) as BIGINT — the only transcendental in this
    module, truncated to fixed point the moment it is computed so both
    engines carry identical integers from there on."""
    return F.floor(F.log(x) * LOG_SCALE).cast("bigint")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for one keyword query.

    Parity surface: the reference filters cohorts by keyword membership
    (pandas ``str.contains`` chains); this is the ranked-retrieval
    generalization a corpus-scale pipeline needs (e.g. "pull the 10k most
    on-topic documents for a domain mix").

    Plan shape (the part that must survive 100 TB):

    * per-term tf = ``size(filter(tokens, t -> t = term))`` — a narrow
      per-row fold; the corpus is never exploded into a token table.
    * corpus stats (N, total token count, per-term df) aggregate to ONE
      row (partial aggregation makes the exchange carry one row per input
      partition) and re-enter via ``crossJoin(broadcast(stats))``.
    * idf uses the standard Robertson/Sparck-Jones+1 form
      ``ln(1 + (N - df + 0.5)/(df + 0.5))``, floor-scaled to fixed point.
    * score = sum over terms of ``idf_t * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``
      written as a literal ``+`` chain in query-term order.
    * top-k = ``orderBy(score desc, id).limit(k)`` — physical
      TakeOrderedAndProject, never a global sort.

    Returns (doc_id, score, matched_terms); ``score`` is floor-scaled to
    4 decimals, ties broken by ascending id.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = ws_tokens(F.lower(F.col(text_col)))

    def _tf(term: str):
        # one-arg lambda via factory: a default-arg capture would make the
        # lambda two-arg, which PySpark reads as (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("bigint")

    def _stage(df):
        return spread(df).select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("bigint").alias("dl"),
            *[_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
        )

    # corpus statistics come from the FULL corpus (BM25's N/avgdl/df are
    # corpus constants, not candidate-set constants)...
    stats = _stage(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("bigint")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    # ...while scoring runs only over candidate documents. The guard is ONE
    # cheap arrays_overlap (≡ matched_terms > 0) applied BEFORE staging: a
    # post-hoc `matched > 0` filter gets pushed below the spread exchange
    # and re-evaluates every per-term tf fold serially on the unspread scan
    # (the has_min_tokens lesson; observed 4 s -> sub-second at sf0.1).
    guard = F.arrays_overlap(toks, F.array(*[F.lit(t) for t in terms]))
    scored = _stage(docs.filter(guard)).crossJoin(F.broadcast(stats))
    # idf in fixed point (BIGINT); back to double only inside the final
    # fixed-order chain where each term contributes ONE double product
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    norm_len = F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        df_t = F.col(f"_df_{i}").cast("double")
        idf6 = _scaled_ln(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        tf_part = tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm_len)
        contribs.append((idf6.cast("double") / F.lit(float(LOG_SCALE))) * tf_part)
    score_raw = contribs[0]
    for c in contribs[1:]:
        score_raw = score_raw + c
    matched = sum(
        ((F.col(f"_tf_{i}") > 0).cast("int") for i in range(len(terms))),
        start=F.lit(0),
    )
    return (
        scored.select(
            "doc_id",
            (F.floor(score_raw * 10000) / 10000).alias("score"),
            # the arrays_overlap guard already enforces matched > 0; a
            # post-hoc filter here would be pushed below the exchange and
            # re-run every tf fold on the unspread scan
            matched.cast("int").alias("matched_terms"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def tfidf_features(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF document features: (doc_id, token_id, tf, tfidf) for
    every in-vocabulary token occurrence — the standard featurization for
    classical retrieval/classification over the corpus.

    ``vocab`` is a :func:`..llm.sampling.build_vocab` frame
    (token, df, vocab_id); idf uses the smooth form
    ``ln((1 + N) / (1 + df))`` floor-scaled to 1e-6 fixed point, so the
    weight is ONE exact product ``tf * (idf6 / 1e6)`` (determinism
    contract of the module docstring).

    Scale: per-(doc, token) counts aggregate with map-side combine (a
    document is co-located in its input split → the exchange carries
    ~distinct-tokens-per-doc, not token occurrences); the vocab and the
    1-row corpus count ride broadcasts. OOV tokens drop (inner probe) —
    encode_tokens is the face that keeps them."""
    tok = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    joined = tf.join(F.broadcast(vocab), "token").crossJoin(F.broadcast(n_docs))
    idf6 = _scaled_ln(
        (F.lit(1) + F.col("n_docs")).cast("double")
        / (F.lit(1) + F.col("df")).cast("double")
    )
    return joined.select(
        "doc_id",
        F.col("vocab_id").cast("bigint").alias("token_id"),
        "tf",
        (F.col("tf").cast("double") * (idf6.cast("double") / F.lit(float(LOG_SCALE))))
        .alias("tfidf"),
    )


def unigram_logprob_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean log probability under the corpus's own
    Laplace-smoothed unigram LM — the cheap LM-quality signal quality
    filters threshold on (documents full of rare/garbage tokens get a low
    mean; boilerplate of frequent tokens a high one).

    ``lp(t) = ln((c_t + 1) / (T + V))`` with corpus token count ``T`` and
    vocabulary size ``V``; each ``lp`` is floor-scaled to 1e-6 fixed point
    at birth, so the per-document sum is an exact BIGINT sum (order
    independent) and the mean is one double division at the end.

    Scale: the unigram table is vocabulary-sized (one shuffle to build,
    broadcast back); the corpus-side explode feeds a doc_id aggregation
    whose map-side combine collapses each document inside its own input
    split — the exchange carries O(docs), not O(tokens).

    Returns (doc_id, n_tokens, sum_lp6, mean_logprob).
    """
    tok = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("t_tokens"), F.count(F.lit(1)).alias("v_size")
    )
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        _scaled_ln(
            (F.col("c") + F.lit(1)).cast("double")
            / (F.col("t_tokens") + F.col("v_size")).cast("double")
        ).alias("lp6"),
    )
    return (
        tok.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp6").alias("sum_lp6"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_lp6",
            (
                (F.col("sum_lp6").cast("double") / F.col("n_tokens").cast("double"))
                / F.lit(float(LOG_SCALE))
            ).alias("mean_logprob"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search through a distributed POSITIONAL inverted
    index: postings (doc, position, term) from one posexplode, one
    pruned postings slice per phrase token (the filter pushes into the
    scan — only the phrase's terms survive), then a k-way equi-join on
    (doc, position - token_offset): every row of the joined anchor set
    is one occurrence of the whole phrase. Returns (id, n_hits) per
    matching document.

    Scale shape: this is the index plan — no document is re-scanned at
    query time once postings are materialized; candidate size after the
    FIRST join is bounded by the rarest token's postings. The registered
    face's oracle is the naive token-window SCAN, certifying that index
    plan == scan semantics (tokenization included)."""
    from functools import reduce

    assert len(phrase) >= 2, "phrase search needs at least two tokens"
    postings = spread(df).select(
        F.col(id_col).alias("_id"),
        F.posexplode(ws_tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
    )
    slices = [
        postings.filter(F.col("term") == w).select(
            "_id", (F.col("pos") - F.lit(i)).alias("anchor")
        )
        for i, w in enumerate(phrase)
    ]
    hits = reduce(lambda a, b: a.join(b, ["_id", "anchor"]), slices)
    return hits.groupBy("_id").agg(F.count(F.lit(1)).alias("n_hits")).select(
        F.col("_id").alias(id_col), "n_hits"
    )
