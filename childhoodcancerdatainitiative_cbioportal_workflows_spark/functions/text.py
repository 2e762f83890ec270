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
    DOWN, so the short case needs an explicit guard).

    r19 shape (guide §1.2 per-task work): a zip_with LADDER — level j
    zips the running prefix-join with the tokens shifted by j, so the
    whole shingle array is built in n-1 linear passes. The previous
    ``transform(idx, i -> array_join(slice(toks, i, n)))`` allocated an
    O(n) slice COPY per shingle position (O(k·n) copies per doc, all in
    interpreted HOF machinery — array lambdas never codegen); measured
    4x the CPU of the ladder on the sf0.1 corpus explode (5.4 -> 1.25
    CPU-s) at identical output. The shifted side is ``slice(toks, j+1,
    k)`` — length k is safely past the end (slice truncates) without the
    int32 start+length overflow a MaxInt literal hits; zip_with pads the
    tail with NULL and ``concat_ws`` skips NULLs, so trailing entries
    hold shorter joins until the final slice drops them. Output strings
    are bit-identical to the old form for every n (pinned by test)."""
    toks = ws_tokens(F.lower(text))
    k = F.size(toks)
    shingles = toks
    for j in range(1, n):
        shingles = F.zip_with(
            shingles,
            F.slice(toks, j + 1, k),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(k >= n, F.slice(shingles, 1, k - F.lit(n - 1))).otherwise(
        F.array().cast("array<string>")
    )


def has_min_tokens(text: Column, n: int) -> Column:
    """True when the doc has >= n whitespace tokens — equivalent to
    ``size(word_shingles(text, n)) > 0`` but WITHOUT materializing shingles:
    use it as the empty-doc guard in hash pipelines. Catalyst pushes filters
    below repartitions, so a guard written over the shingle/md5 expression
    re-runs the whole expensive pipeline serially on the unspread input
    (observed in the minhash plan: the md5 fold appeared inside a Filter
    under the round-robin exchange)."""
    return F.size(ws_tokens(F.lower(text))) >= n


ROLLING_MOD = 2147483647  # 2^31 - 1
ROLLING_BASE = 257


def _normalized(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def char_codes(text: Column) -> Column:
    """Per-character codepoints of the normalized text (array<bigint>).
    STAGE THIS IN ITS OWN PROJECTION before folding windows over it: HOF
    arguments are inlined, so referencing this expression inside a per-gram
    lambda re-evaluates the whole array per gram — O(len^2 * window),
    measured in minutes on kilobyte documents."""
    norm = _normalized(text)
    return F.transform(
        F.sequence(F.lit(1), F.length(norm)),
        lambda i: F.ascii(F.substr(norm, i, F.lit(1))).cast("bigint"),
    )


def rolling_hashes_from_codes(codes: Column, window: int = 8) -> Column:
    """Rabin-Karp rolling fingerprint stream over a STAGED ``char_codes``
    column: polynomial hash (Horner fold, base 257 mod 2^31-1) of every
    ``window``-char gram. Integer-only, so external engines reproduce it
    bit-for-bit. Empty array when the text is shorter than the window
    (sequence() counts down otherwise — guarded)."""
    n_grams = F.size(codes) - F.lit(window - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.aggregate(
            F.slice(codes, i, window),
            F.lit(0).cast("bigint"),
            lambda acc, c: (acc * ROLLING_BASE + c) % F.lit(ROLLING_MOD),
        ),
    )
    return F.when(n_grams >= 1, hashes).otherwise(F.array().cast("array<bigint>"))


def selected_from_hashes(hashes: Column, keep_mod: int = 64) -> Column:
    """Content-defined fingerprint sample over a STAGED hash-stream column:
    keep hashes ≡ 0 mod ``keep_mod`` (deterministic ~1/keep_mod sampling
    that survives insertions/deletions elsewhere in the document — the
    property winnowing schemes rely on). Distinct + sorted -> canonical."""
    return F.array_sort(F.array_distinct(F.filter(hashes, lambda h: h % keep_mod == 0)))


def with_rolling_fingerprints(
    df,
    text_col: str = "text",
    window: int = 8,
    keep_mod: int = 64,
    hashes_col: str = "rolling_hashes",
    kept_col: str = "fingerprints",
):
    """DataFrame-level fingerprinting with each derivation staged in its own
    projection (codes -> hash stream -> kept sample), the shape that keeps
    the work O(len * window) per document."""
    from ..core.session import spread

    staged = spread(df).withColumn("_rk_codes", char_codes(F.col(text_col)))
    staged = staged.withColumn(
        hashes_col, rolling_hashes_from_codes(F.col("_rk_codes"), window)
    ).drop("_rk_codes")
    return staged.withColumn(kept_col, selected_from_hashes(F.col(hashes_col), keep_mod))


def char_shingles(text: Column, n: int = 5) -> Column:
    """Array of character n-grams over the normalized text; shorter texts
    yield an empty array."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    k = F.length(norm)
    idx = F.sequence(F.lit(1), k - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.substring(norm, i, F.lit(n)))
    return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Intra-document repetition: 1 - distinct/total n-gram shingles — the
    boilerplate/loop detector quality filters use (heavily repeated
    passages score near 1, diverse prose near 0). Docs too short to have
    an n-gram score 0.0. Pure codegen'd built-ins; floor-scaled to 4
    decimals like quality_score so every engine agrees on the bits."""
    sh = word_shingles(text, n=n)
    total = F.size(sh).cast("double")
    ratio = F.when(
        total > 0, F.lit(1.0) - F.size(F.array_distinct(sh)) / total
    ).otherwise(F.lit(0.0))
    return F.floor(ratio * 10000) / 10000


# ------------------------------------------------------- Gopher quality rules
#
# The rule family from Rae et al.'s Gopher data pipeline (mean word
# length bounds, symbol-to-word ratio, alphabetic-word fraction, stopword
# floor) — the standard pre-training heuristic filter. Every metric is a
# narrow per-row built-in composition (no shuffle, no UDF); divisions are
# single ops over exact integers so every engine agrees on the bits.

GOPHER_DEFAULTS = {
    "min_words": 20,
    "max_words": 80,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "min_alpha_frac": 0.8,
    "min_stopwords": 1,
}


def gopher_metrics(text: Column) -> dict[str, Column]:
    """Per-document Gopher rule metrics as named column expressions:

    * ``n_words`` — whitespace token count
    * ``mean_word_len`` — total word chars / n_words (one exact division)
    * ``symbol_ratio`` — ('#' + '…' + '...') occurrences / n_words
    * ``alpha_frac`` — fraction of words containing an ASCII letter
    * ``n_stopwords`` — English stopword hits
    """
    toks = ws_tokens(text)
    n = F.size(toks).cast("bigint")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n_sym = (
        F.size(F.regexp_extract_all(text, F.lit(r"#|…|\.\.\."), 0)).cast("bigint")
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("bigint")
    zero_guard = lambda num: F.when(  # noqa: E731
        n > 0, num.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    return {
        "n_words": n,
        "mean_word_len": zero_guard(word_chars),
        "symbol_ratio": zero_guard(n_sym),
        "alpha_frac": zero_guard(n_alpha),
        "n_stopwords": _match_count(toks, STOPWORDS["en"]).cast("bigint"),
    }


def gopher_keep(metrics: dict[str, Column], **overrides) -> Column:
    """Boolean keep decision from :func:`gopher_metrics` under
    :data:`GOPHER_DEFAULTS` (override any threshold by keyword)."""
    th = {**GOPHER_DEFAULTS, **overrides}
    return (
        (metrics["n_words"] >= th["min_words"])
        & (metrics["n_words"] <= th["max_words"])
        & (metrics["mean_word_len"] >= th["min_mean_word_len"])
        & (metrics["mean_word_len"] <= th["max_mean_word_len"])
        & (metrics["symbol_ratio"] <= th["max_symbol_ratio"])
        & (metrics["alpha_frac"] >= th["min_alpha_frac"])
        & (metrics["n_stopwords"] >= th["min_stopwords"])
    )


# ---------------------------------------------------------------- PII redaction
#
# Pattern order matters (SSN before phone: an SSN also matches loose phone
# shapes) and is fixed. Patterns use only constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB oracle): explicit
# classes, bounded repetition, \d, \b — no lookarounds, no backrefs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\b(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_count(text: Column, kind: str) -> Column:
    """Occurrence count of one PII pattern (pre-redaction)."""
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its typed placeholder, applying the
    patterns in :data:`PII_PATTERNS` order (email → ssn → phone → ipv4;
    each pass sees the previous pass's output, so an email's digits can't
    be re-matched as a phone). The standard pre-training scrub shape —
    pure codegen'd regexp_replace chain, no shuffle, no UDF."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def normalize_text(text: Column) -> Column:
    """Canonical form for normalization-robust exact dedup: lowercase,
    every non-alphanumeric run collapsed to one space, trimmed. Catches
    the re-encoded/re-punctuated near-copies that byte-exact
    ``fingerprint`` misses while staying a pure per-row projection
    (no shuffle; the dedup groupBy downstream is the only exchange)."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
