"""Text analysis: token/quality/repetition profiling, fingerprints, n-gram stats, distribution profiles.

Each q_* returns a DataFrame; each SQL_* is its DuckDB oracle
(value-exact at any SF). Split out of __spark_entry__.py (round 6)."""

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _DUCK_NIBFOLD,
    _NIBFOLD_SPLIT,
    _PAIRS_CTE_BODY,
    _dsum,
    _duck_bucket_expr,
    _duck_plane_lit,
    _duck_shingle_cte,
    _ivf_centroid_ids,
    _projection_sql,
    _register_tables,
    _sql_ann_ivf,
    _sql_ann_ivf_trained,
    _sql_ann_lsh,
    _sql_bm25,
    _sql_embedding_dups_lsh,
    _sql_ivf_body,
    _sql_kmeans_clusters,
    _sql_minhash_universal,
    _sql_pagerank,
    _sql_semantic_dedup,
    _sql_simhash_md5,
)


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting (functions/text.token_count + bpe_ish_token_count):
    whitespace tokens vs sub-word-ish pieces (word runs and individual
    punctuation marks counted separately) per document. Proves the bpe-ish
    regex's Java/RE2 parity claim against the DuckDB oracle
    (r4 verdict #8)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
         AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]'))::BIGINT
         AS bpe_tokens
FROM documents
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (functions/text.pii_redact): typed-placeholder redaction
    of emails / SSNs / phones / IPv4s plus per-type pre-redaction counts —
    the standard pre-training privacy pass, a pure codegen'd
    regexp_replace chain (patterns restricted to Java/RE2-common
    constructs so the oracle reproduces them)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        pii_count,
        pii_redact,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        pii_redact(F.col("text")).alias("clean_text"),
        pii_count(F.col("text"), "email").alias("n_emails"),
        pii_count(F.col("text"), "ssn").alias("n_ssns"),
        pii_count(F.col("text"), "phone").alias("n_phones"),
        pii_count(F.col("text"), "ipv4").alias("n_ips"),
    )


SQL_PII_REDACT = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
           '\b(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean_text,
       len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT AS n_ssns,
       len(regexp_extract_all(text,
         '\b(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b'))::BIGINT AS n_phones,
       len(regexp_extract_all(text,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips
FROM documents
"""


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition quality filter (functions/text.
    repetition_ratio): 1 - distinct/total trigram shingles, floor-scaled."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import spread
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        repetition_ratio,
    )

    # spread: the testdata parquet is one row group; without fanning out,
    # the whole shingle+distinct pass runs as ONE task (measured 10.5 s
    # serial vs ~0.5 s spread at sf0.1)
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", repetition_ratio(F.col("text"), n=3).alias("rep_ratio"))


SQL_REPETITION_PROFILE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END AS shingles
  FROM t
)
SELECT doc_id,
       CASE WHEN len(shingles) > 0
         THEN FLOOR((1.0 - len(list_distinct(shingles)) / CAST(len(shingles) AS DOUBLE)) * 10000) / 10000
         ELSE 0.0 END AS rep_ratio
FROM sh
"""


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest (explode) — the CNV segments[] unnest (cnv.py:207-217) shape,
    applied to document tokens; plus token frequencies."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EXPLODE_TOKENS = """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
) GROUP BY token
"""


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis ops (north star): token count, stopword ratio, heuristic
    language ID, md5 content fingerprint."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(stopword_ratio(F.col("text")), 4).alias("sw_ratio"),
        lang_id(F.col("text")).alias("lang_guess"),
        fingerprint(F.col("text")).alias("fp"),
    )


SQL_TEXT_PROFILE = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tokens
  FROM documents
), counts AS (
  SELECT doc_id, text, tokens,
    len(list_filter(tokens, x -> lower(x) IN ('the','a','of','and','to','in','is','that','it','for'))) AS c_en,
    len(list_filter(tokens, x -> lower(x) IN ('el','la','de','que','y','en','un','es','se','no'))) AS c_es,
    len(list_filter(tokens, x -> lower(x) IN ('le','la','de','et','un','en','que','est','pour','qui'))) AS c_fr,
    len(list_filter(tokens, x -> lower(x) IN ('der','die','das','und','ist','von','ein','zu','mit','den'))) AS c_de
  FROM toks
)
SELECT doc_id,
       CAST(len(tokens) AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN len(tokens) > 0 THEN CAST(c_en AS DOUBLE) / len(tokens) ELSE 0.0 END, 4) AS sw_ratio,
       CASE WHEN GREATEST(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
            WHEN c_en = GREATEST(c_en, c_es, c_fr, c_de) THEN 'en'
            WHEN c_es = GREATEST(c_en, c_es, c_fr, c_de) THEN 'es'
            WHEN c_fr = GREATEST(c_en, c_es, c_fr, c_de) THEN 'fr'
            ELSE 'de' END AS lang_guess,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
FROM counts
"""


def q_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-100 token frequencies (explode ->
    count), the classic first pass of tokenizer/vocab budgeting. Total
    order (count desc, token asc) makes the LIMIT deterministic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(100)
    )


SQL_TOKEN_FREQUENCY = """
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
  FROM documents
)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 100
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprinting with content-defined
    (mod-p) sampling — integer-only Horner folds, reproduced bit-for-bit by
    the oracle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        ROLLING_MOD,
        with_rolling_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    staged = with_rolling_fingerprints(d, hashes_col="_hashes", kept_col="_kept")
    checksum = (
        F.aggregate(F.col("_kept"), F.lit(0).cast("bigint"), lambda a, x: a + x)
        % ROLLING_MOD
    )
    return staged.select(
        "doc_id",
        F.size("_hashes").cast("bigint").alias("n_grams"),
        F.size("_kept").cast("bigint").alias("n_kept"),
        checksum.alias("fp_checksum"),
        # try_element_at: ANSI mode makes element_at THROW on empty arrays
        F.coalesce(F.try_element_at("_kept", F.lit(1)), F.lit(-1)).alias("fp_min"),
    )


SQL_ROLLING_FINGERPRINT = """
WITH nrm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents WHERE doc_id < 500
), cd AS (
  SELECT doc_id, s,
         list_transform(range(1, length(s) + 1), i -> ascii(s[i])::BIGINT) AS codes
  FROM nrm
), hs AS (
  SELECT doc_id,
         CASE WHEN length(s) >= 8
           THEN list_transform(range(1, length(s) - 6),
                  i -> list_reduce(codes[i:i+7], (a,b) -> (a*257 + b) % 2147483647))
           ELSE [] END AS hashes
  FROM cd
), k AS (
  SELECT doc_id, hashes,
         list_sort(list_distinct(list_filter(hashes, h -> h % 64 = 0))) AS kept
  FROM hs
)
SELECT doc_id,
       len(hashes)::BIGINT AS n_grams,
       len(kept)::BIGINT AS n_kept,
       (COALESCE(list_sum(kept), 0) % 2147483647)::BIGINT AS fp_checksum,
       COALESCE(kept[1], -1)::BIGINT AS fp_min
FROM k
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + sub-word token counting (north star)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        bpe_ish_token_count,
        quality_score,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


SQL_DOC_QUALITY = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
)
SELECT doc_id,
       FLOOR(GREATEST(LEAST(
           0.25 * LEAST(n / 100.0, 1.0)
         + 0.25 * distinct_ratio
         + 0.35 * LEAST(sw * 5, 1.0)
         + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
         1.0), 0.0) * 10000) / 10000 AS quality,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]')) AS BIGINT) AS n_bpe_tokens
FROM m
"""


def q_quality_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (llm/relevance.unigram_logprob_profile):
    per-document mean log probability under the corpus's Laplace-smoothed
    unigram model. Log-probs are 1e-6 fixed point at birth, so document
    sums are exact BIGINT sums (order-independent) and the mean is one
    double division."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        unigram_logprob_profile,
    )

    return unigram_logprob_profile(load_table(spark, sf_dir, "documents"))


SQL_QUALITY_LM = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), counts AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_tokens, CAST(COUNT(*) AS BIGINT) AS v_size
  FROM counts
), lm AS (
  SELECT token,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(t_tokens + v_size AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp6
  FROM counts, tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lp6) AS BIGINT) AS sum_lp6,
       (CAST(SUM(lp6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0
         AS mean_logprob
FROM tok JOIN lm USING (token)
GROUP BY doc_id
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter (functions/text.gopher_metrics): the
    standard pre-training heuristic battery (word-count bounds, mean word
    length, symbol ratio, alphabetic fraction, stopword floor) as narrow
    per-row built-ins plus the combined keep decision."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        gopher_keep,
        gopher_metrics,
    )

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["symbol_ratio"].alias("symbol_ratio"),
        m["alpha_frac"].alias("alpha_frac"),
        m["n_stopwords"].alias("n_stopwords"),
        gopher_keep(m).alias("keep"),
    )


SQL_GOPHER_QUALITY = """
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_words,
         COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0)
           AS word_chars,
         CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
           AS n_alpha,
         CAST(len(list_filter(tk, x -> list_contains(
              ['the','a','of','and','to','in','is','that','it','for'], lower(x))))
           AS BIGINT) AS n_stopwords
  FROM d
), r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0
              THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN n_words > 0
              THEN CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS symbol_ratio,
         CASE WHEN n_words > 0
              THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS alpha_frac,
         n_stopwords
  FROM m
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
       (n_words >= 20 AND n_words <= 80
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        AND n_stopwords >= 1) AS keep
FROM r
"""


def q_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocation counts (llm/sampling.bigram_counts) —
    the counting step of a BPE/WordPiece merge round: narrow per-doc pair
    transform, one map-side-combined aggregation, TakeOrdered top-100."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bigram_counts

    return bigram_counts(load_table(spark, sf_dir, "documents"), top_k=100)


SQL_BIGRAM_TOP = """
WITH d AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), p AS (
  SELECT tk[i] AS token_a, tk[i + 1] AS token_b
  FROM d, unnest(range(1, len(tk))) AS r(i)
)
SELECT token_a, token_b, COUNT(*) AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, token_a ASC, token_b ASC
LIMIT 100
"""


def q_percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (corpus length profiling
    per source): single mergeable aggregate, no second pass. Values are
    rounded to 4 decimals in both engines (interpolation arithmetic
    order is engine-internal)."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars").cast("double"), F.array(
        F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)
    ))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pct.alias("_p"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.element_at("_p", 1), 4).alias("p25"),
            F.round(F.element_at("_p", 2), 4).alias("p50"),
            F.round(F.element_at("_p", 3), 4).alias("p75"),
            F.round(F.element_at("_p", 4), 4).alias("p95"),
        )
    )


SQL_PERCENTILE_PROFILE = """
WITH q AS (
  SELECT source, COUNT(*) AS n_docs,
         quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75, 0.95]) AS p
  FROM documents GROUP BY source
)
SELECT source, n_docs,
       ROUND(p[1], 4) AS p25, ROUND(p[2], 4) AS p50,
       ROUND(p[3], 4) AS p75, ROUND(p[4], 4) AS p95
FROM q
"""


def q_histogram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group (corpus length distribution per
    source): a single map-side-combinable groupBy on (source, bucket) —
    the profiling face a 100 TB curation run reports per shard."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.lit(19), F.floor(F.col("n_chars") / 200.0)).cast("int")
    return (
        d.groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


SQL_HISTOGRAM_PROFILE = """
SELECT source,
       CAST(LEAST(19, FLOOR(n_chars / 200.0)) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY 1, 2
"""


def q_cooccurrence_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts (llm/sampling.cooccurrence_counts),
    window 2 — the word2vec/GloVe statistic: narrow per-doc pair
    transforms (one per distance), single map-side-combined aggregation,
    TakeOrdered top-100."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        cooccurrence_counts,
    )

    return cooccurrence_counts(
        load_table(spark, sf_dir, "documents"), window=2, top_k=100
    )


SQL_COOCCURRENCE_TOP = """
WITH d AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), p AS (
  SELECT tk[i] AS token_a, tk[i + 1] AS token_b, 1 AS dist
  FROM d, unnest(range(1, len(tk))) AS r(i)
  UNION ALL
  SELECT tk[i] AS token_a, tk[i + 2] AS token_b, 2 AS dist
  FROM d, unnest(range(1, len(tk) - 1)) AS r(i)
)
SELECT token_a, token_b, CAST(dist AS INT) AS dist, COUNT(*) AS n
FROM p GROUP BY 1, 2, 3
ORDER BY n DESC, token_a ASC, token_b ASC, dist ASC
LIMIT 100
"""


def q_winsorize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp document lengths to each source's
    [p05, p95] — outlier taming before length-weighted sampling. Two
    stages: a tiny per-source percentile aggregate broadcast back over
    the corpus; the corpus itself is touched once, narrow."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars").cast("double"), F.array(F.lit(0.05), F.lit(0.95)))
    stats = d.groupBy("source").agg(
        F.round(F.element_at(pct, 1), 4).alias("p05"),
        F.round(F.element_at(pct, 2), 4).alias("p95"),
    )
    return (
        d.join(F.broadcast(stats), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.least(
                F.greatest(F.col("n_chars").cast("double"), F.col("p05")),
                F.col("p95"),
            ).alias("clamped"),
        )
    )


SQL_WINSORIZE_LENGTHS = """
WITH stats AS (
  SELECT source,
         ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.05), 4) AS p05,
         ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 4) AS p95
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars,
       LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), s.p05), s.p95) AS clamped
FROM documents d JOIN stats s USING (source)
"""


def q_contingency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table profiling (source x lang): observed counts,
    expected-under-independence, and per-cell chi-square contribution.
    Expected values come from integer marginal products, so the doubles
    are exact; only the final contribution is rounded. Per-CELL output
    (no global chi2 sum) keeps everything order-independent."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    rows = d.groupBy("source").agg(F.count(F.lit(1)).alias("_row_n"))
    colsm = d.groupBy("lang").agg(F.count(F.lit(1)).alias("_col_n"))
    total = d.agg(F.count(F.lit(1)).alias("_total"))
    j = (
        cells.join(F.broadcast(rows), "source")
        .join(F.broadcast(colsm), "lang")
        .crossJoin(F.broadcast(total))
    )
    expected = (F.col("_row_n") * F.col("_col_n")).cast("double") / F.col("_total")
    contrib = (F.col("n") - expected) * (F.col("n") - expected) / expected
    return j.select(
        "source",
        "lang",
        "n",
        F.round(expected, 4).alias("expected"),
        F.round(contrib, 4).alias("chi2_contrib"),
    )


SQL_CONTINGENCY_PROFILE = """
WITH cells AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
), r AS (SELECT source, COUNT(*) AS row_n FROM documents GROUP BY 1),
   c AS (SELECT lang, COUNT(*) AS col_n FROM documents GROUP BY 1),
   t AS (SELECT COUNT(*) AS total FROM documents)
SELECT cells.source, cells.lang, cells.n,
       ROUND(CAST(r.row_n * c.col_n AS DOUBLE) / t.total, 4) AS expected,
       ROUND((cells.n - CAST(r.row_n * c.col_n AS DOUBLE) / t.total)
             * (cells.n - CAST(r.row_n * c.col_n AS DOUBLE) / t.total)
             / (CAST(r.row_n * c.col_n AS DOUBLE) / t.total), 4)
         AS chi2_contrib
FROM cells JOIN r USING (source) JOIN c USING (lang), t
"""


def q_correlation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group in EXACT arithmetic: value has two
    decimals (x100 -> bigint) and hour-of-day is a small int, so every
    sufficient statistic (S_x, S_y, S_xx, S_yy, S_xy) is an exact
    integer sum; only the final r assembles doubles from exact ints —
    order-independent where a naive corr() aggregation is not. Per
    event_type: does spend correlate with time of day."""
    e = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100, 0).cast("long")
    h = F.hour(F.col("ts")).cast("long")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sx"),
        F.sum(h).alias("sy"),
        F.sum(v * v).alias("sxx"),
        F.sum(h * h).alias("syy"),
        F.sum(v * h).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return stats.select(
        "event_type",
        "n",
        F.round(num / den, 6).alias("pearson_r"),
    )


SQL_CORRELATION_PROFILE = """
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT))
              AS BIGINT) AS syy,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS pearson_r
FROM s
"""


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-token phrase search via the distributed positional
    inverted index (llm/relevance.phrase_search): pruned postings
    slices k-way-joined on (doc, pos - offset). The oracle is the naive
    token-window SCAN over the same whitespace tokenization — the query
    certifies index plan == scan semantics, occurrence counts included."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        phrase_search,
    )

    d = load_table(spark, sf_dir, "documents")
    return phrase_search(d, ["stream", "table", "hash"])


SQL_PHRASE_SEARCH = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), hits AS (
  SELECT doc_id
  FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
  WHERE toks[i] = 'stream' AND toks[i + 1] = 'table'
    AND toks[i + 2] = 'hash'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM hits GROUP BY doc_id
"""


def q_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch certified BIT-EXACTLY (operators/sketches
    countmin_sketch/estimate): md5-derived hash rows make the sketch
    itself engine-reproducible — unlike HLL/KLL internals — so the
    oracle rebuilds the identical 4x1024 counter table and must agree on
    every estimate. Face: the exact top-20 tokens with their true
    counts AND their CMS estimates (est >= exact always; the gap IS the
    collision error, certified rather than hand-waved)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = spread(d).select(
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("token")
    )
    # One token-frequency aggregation feeds BOTH the exact top-20 and
    # the sketch (r18): the sketch hashes each DISTINCT token once,
    # weighted by its count — identical counters, md5 work divided by
    # the mean token frequency, and the cached frame shrinks from every
    # token instance to the vocabulary.
    freq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .persist()
    )
    exact = freq.orderBy(F.col("exact_n").desc(), F.col("token").asc()).limit(20)
    sketch = countmin_sketch(freq, "token", weight_col="exact_n")
    est = countmin_estimate(sketch, exact.select("token"), "token")
    out = exact.join(est, "token").select("token", "exact_n", "est_n")
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    return _with_caches(out, [freq])


_CMS_FOLD = (
    "list_reduce(list_transform(range(1,9), i -> "
    "(CASE WHEN ascii(h[i]) >= 97 THEN ascii(h[i])-87 "
    "ELSE ascii(h[i])-48 END)::BIGINT), (a,b) -> a*16+b)"
)

SQL_COUNTMIN_TOKENS = f"""
WITH t AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
), e AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM t GROUP BY token
  ORDER BY exact_n DESC, token ASC LIMIT 20
), hb AS (
  SELECT token, r, md5(CAST(r AS VARCHAR) || ':' || token) AS h
  FROM t CROSS JOIN range(0, 4) AS rr(r)
), c AS (
  SELECT r, {_CMS_FOLD} % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM hb GROUP BY r, bucket
), pb AS (
  SELECT e.token, e.exact_n, rr.r,
         md5(CAST(rr.r AS VARCHAR) || ':' || e.token) AS h
  FROM e CROSS JOIN range(0, 4) AS rr(r)
), p AS (
  SELECT token, exact_n, r, {_CMS_FOLD} % 1024 AS bucket FROM pb
)
SELECT p.token, p.exact_n,
       CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est_n
FROM p LEFT JOIN c ON c.r = p.r AND c.bucket = p.bucket
GROUP BY p.token, p.exact_n
"""


def _duck_hexfold(start: int, n: int) -> str:
    """DuckDB expression folding md5 hex nibbles [start, start+n) of a
    column ``h`` into a BIGINT — the generalized _CMS_FOLD (n <= 15
    keeps the fold inside int64)."""
    return (
        f"list_reduce(list_transform(range({start},{start + n}), i -> "
        "(CASE WHEN ascii(h[i]) >= 97 THEN ascii(h[i])-87 "
        "ELSE ascii(h[i])-48 END)::BIGINT), (a,b) -> a*16+b)"
    )


def q_hll_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog certified BIT-EXACTLY (operators/sketches
    hll_sketch/hll_estimate): md5-derived registers + the integer-lattice
    harmonic sum S = sum 2^(49-rho) make the whole sketch — registers,
    sum, and estimate — engine-reproducible, unlike approx_count_distinct
    internals. Face: one row with the EXACT distinct o_orderkey count
    next to the HLL estimate (p=9, m=512 — the raw-estimator regime:
    cardinality >> 2.5m, where no float linear-counting branch applies)
    and the sketch internals (n_zero, s_sum); the est-vs-exact gap IS
    the certified approximation error, and the sketch shuffles at most
    512 register rows per partition where exact COUNT(DISTINCT)
    shuffles every key."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k")
    )
    est = hll_estimate(hll_sketch(o, "k", p=9), p=9).select(
        "est_n", "n_zero", "s_sum"
    )
    exact = o.agg(F.countDistinct("k").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est))


from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (  # noqa: E402
    _hll_alpha_num as _hll_a,
)

SQL_HLL_PROFILE = f"""
WITH t AS (
  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS token FROM orders
), hx AS (
  SELECT md5(token) AS h FROM t
), parts AS (
  SELECT {_duck_hexfold(1, 4)} % 512 AS idx,
         {_duck_hexfold(5, 12)} AS v
  FROM hx
), regs AS (
  SELECT idx,
         MAX(CASE WHEN v = 0 THEN 49
                  ELSE CAST(49 - length(bin(v)) AS INT) END) AS rho
  FROM parts GROUP BY idx
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_present,
         CAST(SUM(1::BIGINT << (49 - rho)) AS BIGINT) AS present_sum
  FROM regs
), s AS (
  SELECT CAST(512 - n_present AS BIGINT) AS n_zero,
         CAST(present_sum + (512 - n_present) * (1::BIGINT << 49)
              AS BIGINT) AS s_sum
  FROM agg
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n_exact,
       CAST({_hll_a(9)}::HUGEINT // s_sum AS BIGINT) AS est_n,
       n_zero, s_sum
FROM s
"""


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter certified BIT-EXACTLY (operators/sketches
    bloom_build/bloom_probe): the dedup pre-filter shape — membership of
    part keys against the set of parts shipped before 1995-03, where
    "definitely new" rows may skip the exact seen-store check entirely.
    md5-derived bit positions make the present-bit table itself
    engine-reproducible; the face emits the full confusion summary and
    n_false_neg is CERTIFIED ZERO (the Bloom guarantee), with the FP
    count as the measured price of k=4, m=16384."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    li = load_table(spark, sf_dir, "lineitem")
    seen = li.filter(
        F.col("l_shipdate") < F.lit("1995-03-01").cast("date")
    ).select(F.col("l_partkey").alias("key"))
    bloom = bloom_build(seen, "key", k=4, m=16384)
    probes = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key")
    )
    probed = bloom_probe(bloom, probes, "key", k=4, m=16384)
    truth = probes.join(seen.distinct(), "key", "left_semi").select(
        "key", F.lit(True).alias("is_member")
    )
    j = probed.join(truth, "key", "left").withColumn(
        "is_member", F.coalesce("is_member", F.lit(False))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).alias("n_true"),
        F.sum(F.col("maybe_member").cast("long")).alias("n_maybe"),
        F.sum(
            (F.col("maybe_member") & ~F.col("is_member")).cast("long")
        ).alias("n_false_pos"),
        F.sum(
            (F.col("is_member") & ~F.col("maybe_member")).cast("long")
        ).alias("n_false_neg"),
    )


SQL_BLOOM_PREFILTER = f"""
WITH seen AS (
  SELECT l_partkey AS key FROM lineitem
  WHERE l_shipdate < DATE '1995-03-01'
), bits AS (
  SELECT DISTINCT r, {_duck_hexfold(1, 8)} % 16384 AS bit
  FROM (SELECT key, r, md5(r || ':' || key) AS h
        FROM seen CROSS JOIN range(0, 4) AS rr(r))
), pb AS (
  SELECT key, r, {_duck_hexfold(1, 8)} % 16384 AS bit
  FROM (SELECT key, r, md5(r || ':' || key) AS h
        FROM (SELECT p_partkey AS key FROM part)
        CROSS JOIN range(0, 4) AS rr(r))
), flags AS (
  SELECT pb.key, BOOL_AND(b.bit IS NOT NULL) AS maybe
  FROM pb LEFT JOIN bits b ON b.r = pb.r AND b.bit = pb.bit
  GROUP BY pb.key
), truth AS (
  SELECT DISTINCT key FROM seen
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN t.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true,
       CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       CAST(SUM(CASE WHEN maybe AND t.key IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN t.key IS NOT NULL AND NOT maybe THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_neg
FROM flags f LEFT JOIN truth t USING (key)
"""


def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL inclusion–exclusion overlap (operators/sketches.hll_overlap):
    how many customers place orders in BOTH the even- and odd-keyed
    halves of the order stream — the corpus-vs-corpus dedup triage
    estimate, one scan, register-table shuffles only. The face sets the
    EXACT intersection count beside the estimate, so the driver row
    certifies both the bit-exact integer sketch math and the
    approximation's measured error."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_overlap,
    )

    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.expr("o_orderkey % 2 = 0")).select(
        F.col("o_custkey").cast("string").alias("k")
    )
    b = o.filter(F.expr("o_orderkey % 2 = 1")).select(
        F.col("o_custkey").cast("string").alias("k")
    )
    exact = a.intersect(b).agg(F.count(F.lit(1)).alias("n_exact_overlap"))
    return exact.crossJoin(F.broadcast(hll_overlap(a, b, "k", p=9)))


SQL_HLL_OVERLAP = f"""
WITH tagged AS (
  SELECT CAST(o_custkey AS VARCHAR) AS token, o_orderkey % 2 = 0 AS sa
  FROM orders
), hx AS (
  SELECT md5(token) AS h, sa FROM tagged
), parts AS (
  SELECT {_duck_hexfold(1, 4)} % 512 AS idx,
         {_duck_hexfold(5, 12)} AS v, sa
  FROM hx
), regs AS (
  SELECT idx, sa,
         MAX(CASE WHEN v = 0 THEN 49
                  ELSE CAST(49 - length(bin(v)) AS INT) END) AS rho
  FROM parts GROUP BY idx, sa
), per_idx AS (
  SELECT idx,
         MAX(CASE WHEN sa THEN rho END) AS ra,
         MAX(CASE WHEN NOT sa THEN rho END) AS rb,
         MAX(rho) AS ru
  FROM regs GROUP BY idx
), agg AS (
  SELECT COUNT(ra) AS na,
         COALESCE(SUM(1::BIGINT << (49 - ra)), 0) AS pa,
         COUNT(rb) AS nb,
         COALESCE(SUM(1::BIGINT << (49 - rb)), 0) AS pb,
         COUNT(ru) AS nu,
         COALESCE(SUM(1::BIGINT << (49 - ru)), 0) AS pu
  FROM per_idx
), est AS (
  SELECT CAST({_hll_a(9)}::HUGEINT
              // (pa + (512 - na) * (1::BIGINT << 49)) AS BIGINT) AS est_a,
         CAST({_hll_a(9)}::HUGEINT
              // (pb + (512 - nb) * (1::BIGINT << 49)) AS BIGINT) AS est_b,
         CAST({_hll_a(9)}::HUGEINT
              // (pu + (512 - nu) * (1::BIGINT << 49)) AS BIGINT) AS est_union
  FROM agg
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT token FROM tagged WHERE sa
           INTERSECT
           SELECT token FROM tagged WHERE NOT sa)) AS n_exact_overlap,
       est_a, est_b, est_union,
       GREATEST(CAST(0 AS BIGINT),
                est_a + est_b - est_union) AS est_overlap
FROM est
"""
