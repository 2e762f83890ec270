"""Text-analysis column expressions for large-scale training-data pipelines.

North-star extensions (SURVEY §7 P7) on the ``documents`` table: language ID,
quality scoring, token counting, fingerprinting, shingling for MinHash /
Jaccard dedup. All built-in-function compositions — JVM-side, codegen'd —
so they hold up on 100 TB text. Deliberately deterministic so a DuckDB
oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny embedded stopword lists — heuristic language ID, not a model
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "un", "en", "que", "est", "pour", "qui"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "zu", "mit", "den"),
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word runs and individual punctuation marks
    count separately (a cheap proxy for BPE token counts used to budget
    training data). Extraction regex avoids lookarounds so the DuckDB
    oracle (RE2) can reproduce it."""
    pieces = F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"), 0)
    return F.size(pieces)


def _match_count(tokens: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, F.lower(t))))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_tokens(text)
    n = F.size(toks)
    return F.when(n > 0, _match_count(toks, STOPWORDS[lang]) / n).otherwise(F.lit(0.0))


def lang_id(text: Column) -> Column:
    """Pick the language whose stopword hit-count is highest; ties and
    zero-hit texts -> 'und'. Deterministic tie-break by language order."""
    toks = ws_tokens(text)
    counts = {lg: _match_count(toks, ws) for lg, ws in STOPWORDS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (when-chain precedence)
    for lg in reversed(list(STOPWORDS)):
        expr = F.when((counts[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


# ASCII punctuation as explicit ranges — identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle), unlike \p{Punct} which differs
PUNCT_CLASS = "!-/:-@\\[-`{-~"


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs, word
    diversity and stopword presence; penalizes punctuation walls. The exact
    blend is arbitrary but fixed — it exists to rank/filter at scale."""
    toks = ws_tokens(text)
    n = F.size(toks).cast("double")
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    punct = F.length(F.regexp_replace(text, f"[^{PUNCT_CLASS}]", "")).cast("double")
    punct_ratio = F.when(F.length(text) > 0, punct / F.length(text)).otherwise(F.lit(1.0))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    raw = F.greatest(
        F.least(
            F.lit(0.25) * len_score
            + F.lit(0.25) * distinct_ratio
            + F.lit(0.35) * F.least(sw * 5, F.lit(1.0))
            + F.lit(0.15) * (1 - F.least(punct_ratio * 4, F.lit(1.0))),
            F.lit(1.0),
        ),
        F.lit(0.0),
    )
    # floor-scale, not round: Spark's round() goes through the SHORTEST
    # decimal repr (BigDecimal.valueOf) while other engines round the binary
    # value, so terminating decimals like 0.53375 round apart. floor(x*1e4)
    # is identical wherever the double bits are identical.
    return F.floor(raw * 10000) / 10000


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: lowercase, collapse whitespace, md5.
    md5 (not xxhash) so external engines (DuckDB oracle) reproduce it."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(norm)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined) for Jaccard/MinHash. Docs
    shorter than n words yield an empty array (sequence(1,0) would count
    DOWN, so the short case needs an explicit guard)."""
    toks = ws_tokens(F.lower(text))
    k = F.size(toks)
    idx = F.sequence(F.lit(1), k - F.lit(n - 1))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(k >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Array of character n-grams over the normalized text; shorter texts
    yield an empty array."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    k = F.length(norm)
    idx = F.sequence(F.lit(1), k - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.substring(norm, i, F.lit(n)))
    return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))
