"""LLM corpus pipeline: sampling/splits, chunk/encode/pack, vocab, BM25/TF-IDF, end-to-end curation.

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


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: md5-nibble hash
    bucket of doc_id (llm/sampling.py) — stable across reruns and
    re-partitioning, reproducible in any engine (vs rand()/df.sample).
    Returns the full per-document assignment so the oracle checks every
    bucket and label."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import dataset_split
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        dataset_split(d)
        .select(
            "doc_id",
            hash_bucket(F.col("doc_id")).alias("bucket"),
            "split",
        )
    )


SQL_DATASET_SPLIT = f"""
WITH hx AS (
  SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fraction sampling (llm/sampling.hash_sample):
    membership is a pure function of md5(doc_id) — stable across reruns
    and re-partitioning, unlike rand()/df.sample — and the filter is a
    narrow per-row projection (no shuffle; Catalyst pushes it into the
    scan). Registered face for the one LLM-sampling operator that lacked
    a CORRECTNESS row (r4 verdict #6)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import hash_sample
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, 0.25).select(
        "doc_id", hash_bucket(F.col("doc_id")).alias("bucket")
    )


SQL_HASH_SAMPLE = f"""
WITH hx AS (
  SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, bucket FROM b WHERE bucket < 2500
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-prep chunking (llm/sampling.chunk_documents): 64-token
    chunks with 16-token overlap (stride 48), chunk counts integer-exact —
    one scan, one explode, no shuffle; the exploded rows are the
    downstream embedding/indexing parallelism unit."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        chunk_documents,
    )

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=64, overlap=16)


SQL_CHUNK_DOCUMENTS = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         (GREATEST(len(toks) - 16, 1) + 47) // 48 AS n_chunks
  FROM t WHERE len(toks) > 0
), c AS (
  SELECT doc_id, UNNEST(range(0, n_chunks)) AS chunk_id, toks, n FROM s
)
SELECT doc_id,
       chunk_id::BIGINT AS chunk_id,
       (LEAST(chunk_id * 48 + 64, n) - chunk_id * 48)::BIGINT AS n_tokens,
       array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
         AS chunk_text
FROM c
"""


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing (llm/sampling.stratified_hash_sample): per-source
    deterministic sampling fractions in ONE narrow pass — up-weight two
    curated sources, keep a floor elsewhere; membership reads the same md5
    bucket as hash_sample/dataset_split so mixes nest and compose."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        stratified_hash_sample,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        d,
        {"src13": 0.9, "src8": 0.6},
        strata_col="source",
        default_fraction=0.25,
    )
    return out.select(
        "doc_id", "source", hash_bucket(F.col("doc_id")).alias("bucket")
    )


SQL_DOMAIN_MIX = f"""
WITH hx AS (
  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, source, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, source, bucket
FROM b
WHERE bucket < CASE source WHEN 'src13' THEN 9000
                           WHEN 'src8' THEN 6000
                           ELSE 2500 END
"""


def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding (llm/sampling.encode_tokens): documents to
    (doc_id, pos, token_id) through the df-bounded vocab (min_df=5,
    max_df=50%), OOV -> 0. Vocab broadcasts (~1e5-1e6 rows at any scale);
    the corpus pass is posexplode + broadcast probe, zero corpus-side
    shuffle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        encode_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(d, min_df=5, max_df_frac=0.5)
    return encode_tokens(d, vocab)


SQL_ENCODE_TOKENS = """
WITH toks AS (
  SELECT DISTINCT doc_id AS doc, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY token
), vocab AS (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token) AS BIGINT) AS vocab_id
  FROM dfreq, n
  WHERE df >= 5 AND df <= n.n_docs * 0.5
), seq AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), pos AS (
  SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS pos, tk FROM seq
), tokpos AS (
  SELECT doc_id, pos::BIGINT AS pos, tk[pos] AS token FROM pos
)
SELECT tp.doc_id, tp.pos, COALESCE(v.vocab_id, 0)::BIGINT AS token_id
FROM tokpos tp LEFT JOIN vocab v USING (token)
"""


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency-bounded vocabulary build (llm/sampling.py
    build_vocab): distinct (doc, token) -> one-shuffle df count -> band
    filter (min_df=5, max_df=50%) -> contiguous vocab ids by (df desc,
    token)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import build_vocab

    d = load_table(spark, sf_dir, "documents")
    return build_vocab(d, min_df=5, max_df_frac=0.5)


SQL_VOCAB_BUILD = """
WITH toks AS (
  SELECT DISTINCT doc_id AS doc, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY token
)
SELECT token, df,
       CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token) AS INTEGER) AS vocab_id
FROM dfreq, n
WHERE df >= 5 AND df <= n.n_docs * 0.5
"""


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (llm/sampling.pack_sequences):
    hash-sharded document streams, per-shard window cumsum offsets,
    budget-floor pack ids — the pretraining row layout, num_shards-way
    parallel with no global window."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=2048, num_shards=8)


SQL_SEQUENCE_PACK = f"""
WITH hx AS (
  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
), t AS (
  SELECT doc_id,
         {_NIBFOLD_SPLIT} % 10000 % 8 AS shard,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT
           AS n_tokens
  FROM hx
), o AS (
  SELECT doc_id, shard, n_tokens,
         -- DuckDB SUM(BIGINT) widens to HUGEINT -> pandas float64; pin BIGINT
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS "offset"
  FROM t
)
SELECT doc_id, shard, n_tokens, "offset",
       CAST(FLOOR("offset" / 2048) AS BIGINT) AS pack_id
FROM o
"""


def q_llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus pipeline composition — the LLM-surface
    analogue of cnv_matrix's composition proof: quality scoring + language
    ID → filter (quality >= 0.3, lang = 'en') → exact dedup by normalized
    fingerprint (keep min doc_id) → deterministic train split (md5-bucket
    80%) → token-budget sequence packing. One lazy DAG over five operator
    families, one oracle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import spread
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dataset_split,
        pack_sequences,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    profiled = d.select(
        "doc_id",
        "text",
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    )
    filtered = profiled.filter((F.col("quality") >= 0.3) & (F.col("lang") == "en"))
    deduped = keep_first(filtered, ["fp"], [F.col("doc_id").asc()])
    train = dataset_split(deduped).filter(F.col("split") == "train")
    return pack_sequences(train, budget=2048, num_shards=8)


SQL_LLM_CORPUS_PIPELINE = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks, CAST(len(toks) AS DOUBLE) AS n,
    CASE WHEN len(toks) > 0
         THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS distinct_ratio,
    CASE WHEN len(toks) > 0
         THEN len(list_filter(toks, x -> lower(x) IN
              ('the','a','of','and','to','in','is','that','it','for')))
              / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS sw,
    len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to','in','is','that','it','for'))) AS c_en,
    len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y','en','un','es','se','no'))) AS c_es,
    len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','un','en','que','est','pour','qui'))) AS c_fr,
    len(list_filter(toks, x -> lower(x) IN ('der','die','das','und','ist','von','ein','zu','mit','den'))) AS c_de,
    CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), prof AS (
  SELECT doc_id, text, toks,
    FLOOR(GREATEST(LEAST(
        0.25 * LEAST(n / 100.0, 1.0)
      + 0.25 * distinct_ratio
      + 0.35 * LEAST(sw * 5, 1.0)
      + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
      1.0), 0.0) * 10000) / 10000 AS quality,
    CASE WHEN GREATEST(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
         WHEN c_en = GREATEST(c_en, c_es, c_fr, c_de) THEN 'en'
         WHEN c_es = GREATEST(c_en, c_es, c_fr, c_de) THEN 'es'
         WHEN c_fr = GREATEST(c_en, c_es, c_fr, c_de) THEN 'fr'
         ELSE 'de' END AS lang,
    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM m
), ded AS (
  SELECT doc_id, toks FROM prof
  WHERE quality >= 0.3 AND lang = 'en'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
), hx AS (
  SELECT doc_id, toks, md5(doc_id::VARCHAR) AS h FROM ded
), tr0 AS (
  SELECT doc_id, toks, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
), tr AS (
  SELECT * FROM tr0 WHERE bucket < 8000
), o AS (
  SELECT doc_id, bucket % 8 AS shard, len(toks)::BIGINT AS n_tokens,
         -- DuckDB SUM(BIGINT) widens to HUGEINT -> pandas float64; pin BIGINT
         CAST(SUM(len(toks)::BIGINT) OVER (PARTITION BY bucket % 8 ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - len(toks)::BIGINT AS BIGINT) AS "offset"
  FROM tr
)
SELECT doc_id, shard, n_tokens, "offset",
       CAST(FLOOR("offset" / 2048) AS BIGINT) AS pack_id
FROM o
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (llm/relevance.bm25_topk): ranked retrieval over
    the corpus for a fixed query. The corpus is never exploded — per-term
    tf is a narrow array fold, stats reduce to ONE broadcast row, top-k is
    TakeOrderedAndProject. idf is floor-scaled fixed point and the score
    chain is fixed-order, so the oracle reproduces every bit."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, list(_BM25_TERMS), k=20)


SQL_BM25_SEARCH = _sql_bm25(_BM25_TERMS, k=20)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5-family composition proof (like cnv_matrix / llm_corpus_
    pipeline): Gopher rule battery -> unigram-LM floor (LM built on the
    FULL corpus, the realistic order) -> quality-weighted sampling, as ONE
    lazy DAG with one oracle. The corpus stays narrow until the single
    doc_id join against the vocabulary-derived LM profile."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        gopher_keep,
        gopher_metrics,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        unigram_logprob_profile,
        weighted_hash_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    kept = d.filter(gopher_keep(m))
    lm = unigram_logprob_profile(d)
    joined = kept.join(lm, "doc_id").filter(F.col("mean_logprob") >= F.lit(-3.41))
    q = quality_score(F.col("text"))
    return weighted_hash_sample(joined, q).select(
        "doc_id", "n_tokens", "mean_logprob", q.alias("quality")
    )


SQL_CURATION_PIPELINE = f"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), gm AS (
  SELECT doc_id, text,
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
), kept AS (
  SELECT doc_id, text FROM gm
  WHERE n_words >= 20 AND n_words <= 80
    AND (CASE WHEN n_words > 0
              THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) >= 3.0
    AND (CASE WHEN n_words > 0
              THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) <= 10.0
    AND (CASE WHEN n_words > 0
              THEN CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) <= 0.1
    AND (CASE WHEN n_words > 0
              THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END) >= 0.8
    AND n_stopwords >= 1
), tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), counts AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_tokens, CAST(COUNT(*) AS BIGINT) AS v_size
  FROM counts
), lmt AS (
  SELECT token,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(t_tokens + v_size AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp6
  FROM counts, tot
), perdoc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         (CAST(SUM(lp6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0
           AS mean_logprob
  FROM tok JOIN lmt USING (token)
  GROUP BY doc_id
), qm AS (
  SELECT doc_id, text, tk AS toks,
         CAST(len(tk) AS DOUBLE) AS n,
         CASE WHEN len(tk) > 0
              THEN len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(tk) > 0
              THEN len(list_filter(tk, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM d
), qual AS (
  SELECT doc_id,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality
  FROM qm
), bk AS (
  SELECT doc_id, {_NIBFOLD_SPLIT} % 10000 AS bucket
  FROM (SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents)
)
SELECT k.doc_id, p.n_tokens, p.mean_logprob, q.quality
FROM kept k
JOIN perdoc p ON p.doc_id = k.doc_id
JOIN qual q ON q.doc_id = k.doc_id
JOIN bk b ON b.doc_id = k.doc_id
WHERE p.mean_logprob >= -3.41
  AND b.bucket < CAST(FLOOR(q.quality * 10000) AS BIGINT)
"""


def q_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF featurization (llm/relevance.tfidf_features) over the
    df-bounded vocab (min_df=5, max_df=50%): map-side-combined tf counts,
    broadcast vocab probe, fixed-point smooth idf — one exact product per
    weight."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        tfidf_features,
    )

    d = load_table(spark, sf_dir, "documents")
    return tfidf_features(d, build_vocab(d, min_df=5, max_df_frac=0.5))


SQL_TFIDF_FEATURES = """
WITH toksd AS (
  SELECT DISTINCT doc_id AS doc, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM toksd GROUP BY token
), vocab AS (
  SELECT token, df,
         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token) AS BIGINT) AS vocab_id
  FROM dfreq, n
  WHERE df >= 5 AND df <= n.n_docs * 0.5
), tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
         AS t(token)
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT tf.doc_id, v.vocab_id AS token_id, tf.tf,
       CAST(tf.tf AS DOUBLE) *
       (CAST(CAST(floor(ln(CAST(1 + nn.n_docs AS DOUBLE)
                            / CAST(1 + v.df AS DOUBLE)) * 1000000) AS BIGINT) AS DOUBLE)
        / 1000000.0) AS tfidf
FROM tf JOIN vocab v USING (token), nn
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard: doc/token volume, mean quality
    (exact — quality is 4-decimal fixed point, summed through DECIMAL),
    Gopher keep-rate. The grouped-aggregation face of the quality family;
    one shuffle keyed by source with map-side combine."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
        gopher_keep,
        gopher_metrics,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
        _dsum(quality_score(F.col("text")), "sum_quality"),
        F.sum(gopher_keep(m).cast("bigint")).alias("n_keep"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        (F.col("sum_quality") / F.col("n_docs").cast("double")).alias("avg_quality"),
        (F.col("n_keep").cast("double") / F.col("n_docs").cast("double")).alias(
            "keep_rate"
        ),
    )


SQL_CORPUS_REPORT = """
WITH d AS (
  SELECT doc_id, text, source,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), per AS (
  SELECT source,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
           + 0.25 * (CASE WHEN len(tk) > 0
                          THEN len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
                          ELSE 0.0 END)
           + 0.35 * LEAST((CASE WHEN len(tk) > 0
                          THEN len(list_filter(tk, x -> lower(x) IN
                               ('the','a','of','and','to','in','is','that','it','for')))
                               / CAST(len(tk) AS DOUBLE)
                          ELSE 0.0 END) * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0
                          THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
                               / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality,
         CASE WHEN CAST(len(tk) AS BIGINT) >= 20 AND CAST(len(tk) AS BIGINT) <= 80
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) >= 3.0
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(COALESCE(CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT), 0) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) <= 10.0
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) <= 0.1
               AND (CASE WHEN len(tk) > 0
                    THEN CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) ELSE 0.0 END) >= 0.8
               AND CAST(len(list_filter(tk, x -> list_contains(
                    ['the','a','of','and','to','in','is','that','it','for'], lower(x))))
                    AS BIGINT) >= 1
              THEN 1 ELSE 0 END AS keep
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_quality,
       CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS keep_rate
FROM per GROUP BY source
"""


def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling (llm/sampling.
    weighted_hash_sample): per-document acceptance probability equals the
    quality score — the quality-proportional subsampling step of
    pre-training data mixes, as one narrow pushdown-safe filter (the
    md5 bucket and the score are both per-row expressions)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        weighted_hash_sample,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    return weighted_hash_sample(d, q).select(
        "doc_id",
        q.alias("quality"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    )


SQL_QUALITY_WEIGHTED_SAMPLE = f"""
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
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), q AS (
  SELECT doc_id,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 AS quality
  FROM m
), hx AS (
  SELECT doc_id, quality, md5(doc_id::VARCHAR) AS h FROM q
), b AS (
  SELECT doc_id, quality, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT doc_id, quality, bucket
FROM b WHERE bucket < CAST(FLOOR(quality * 10000) AS BIGINT)
"""


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sampling: 2 documents per source by md5
    hash order (keep_topk over the hash) — the per-stratum quota sampler
    that composes with domain_mix's fractional sampler."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        keep_topk,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    return keep_topk(
        d, ["source"], [F.col("h").asc(), F.col("doc_id").asc()], k=2,
        rank_col="rnk",
    ).drop("h")


SQL_GROUP_SAMPLE = """
SELECT doc_id, source, rnk FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS INT) AS rnk
  FROM documents
) WHERE rnk <= 2
"""


def q_weighted_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size-k weighted sampling (llm/sampling.weighted_sample_k,
    Efraimidis-Spirakis exponential keys): 100 documents drawn without
    replacement with probability proportional to quality — guarantees
    the sample size that Bernoulli quality_weighted_sample only hits in
    expectation. TakeOrderedAndProject; the ln key is fixed-point at
    birth."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        quality_score,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        weighted_sample_k,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    w = quality_score(F.col("text")) + F.lit(0.01)
    return weighted_sample_k(d, w, k=100).select("doc_id", "source", "logkey_fp")


SQL_WEIGHTED_SAMPLE_K = f"""
WITH t AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, source, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> lower(x) IN
                   ('the','a','of','and','to','in','is','that','it','for')))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sw,
         CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct
  FROM t
), q AS (
  SELECT doc_id, source,
         FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 + 0.01 AS w
  FROM m
), hx AS (
  SELECT doc_id, source, w, md5(doc_id::VARCHAR) AS h FROM q
), b AS (
  SELECT doc_id, source, w,
         ({_NIBFOLD_SPLIT} % 10000 + 1) / 10001.0 AS u
  FROM hx
)
SELECT doc_id, source,
       CAST(FLOOR(ln(u) / w * 1000000) AS BIGINT) AS logkey_fp
FROM b
ORDER BY logkey_fp DESC, doc_id ASC
LIMIT 100
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (llm/sampling.
    temperature_sample): sample source d at rate ∝ n_d^(alpha-1)
    (alpha=0.3, the multilingual-corpus standard) with total budget 20%
    of the corpus — small sources up-weighted, huge ones down-weighted.
    One tiny per-source aggregate, broadcast rate table, narrow md5
    filter; the corpus is never shuffled."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        temperature_sample,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_sample(d, domain_col="source", alpha=0.3, budget_frac=0.2)


SQL_TEMPERATURE_MIX = f"""
WITH c AS (
  SELECT source AS dom, CAST(COUNT(*) AS BIGINT) AS nd
  FROM documents GROUP BY source
), pf AS (
  SELECT dom, nd,
         CAST(ROUND(pow(CAST(nd AS DOUBLE), 0.3) * 1000000000.0) AS BIGINT) AS pa_fp,
         CAST(ROUND(pow(CAST(nd AS DOUBLE), -0.7) * 1000000000000.0) AS BIGINT) AS pr_fp
  FROM c
), tot AS (
  SELECT CAST(SUM(nd) AS BIGINT) AS n,
         CAST(SUM(pa_fp) AS BIGINT) AS z_fp
  FROM pf
), r AS (
  SELECT dom,
         CAST(LEAST(10000.0, ROUND(
             0.2 * n / (z_fp / 1000000000.0) * (pr_fp / 1000000000000.0) * 10000
         )) AS INT) AS rate_bound
  FROM pf, tot
), hx AS (
  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, source, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
)
SELECT b.doc_id, b.source, r.rate_bound
FROM b JOIN r ON r.dom = b.source
WHERE b.bucket < r.rate_bound
"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-style collocation mining (llm/sampling.collocations): adjacent
    pairs ranked by the pointwise likelihood ratio n_ab*T/(n_a*n_b) in
    EXACT integer arithmetic (bigint mul + floor div — monotone in PMI,
    zero log/pow ULP hazard), min_count=5 against the hapax pathology.
    Two map-side-combined aggregates; the filtered bigram side broadcasts
    into both unigram-stat joins."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        collocations,
    )

    d = load_table(spark, sf_dir, "documents")
    return collocations(d, min_count=5, top_k=20)


SQL_PMI_COLLOCATIONS = """
WITH d AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), p AS (
  SELECT tk[i] AS token_a, tk[i + 1] AS token_b
  FROM d, unnest(range(1, len(tk))) AS r(i)
), bc AS (
  SELECT token_a, token_b, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM bc
), u AS (
  SELECT unnest(tk) AS token FROM d
), uc AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS nu FROM u GROUP BY token
)
SELECT bc.token_a, bc.token_b, bc.n AS n_pair,
       CAST((CAST(bc.n AS HUGEINT) * tot.t * 1000000)
            // (ua.nu * ub.nu) AS BIGINT) AS lr_fp
FROM bc, tot
JOIN uc ua ON ua.token = bc.token_a
JOIN uc ub ON ub.token = bc.token_b
WHERE bc.n >= 5
ORDER BY lr_fp DESC, token_a ASC, token_b ASC
LIMIT 20
"""


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum schedule (llm/sampling.curriculum_buckets):
    rank the corpus by fixed-point quality (ties broken by doc_id — a
    total order, so ntile is deterministic) and cut into 10 equal-count
    phases with per-phase doc and token budgets."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        curriculum_buckets,
    )

    d = load_table(spark, sf_dir, "documents")
    return curriculum_buckets(d, n_buckets=10)


SQL_CURRICULUM_BUCKETS = """
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
), s AS (
  SELECT doc_id,
         CAST(ROUND(FLOOR(GREATEST(LEAST(
             0.25 * LEAST(n / 100.0, 1.0)
           + 0.25 * distinct_ratio
           + 0.35 * LEAST(sw * 5, 1.0)
           + 0.15 * (1 - LEAST(CASE WHEN length(text) > 0 THEN punct / length(text) ELSE 1.0 END * 4, 1.0)),
           1.0), 0.0) * 10000) / 10000 * 10000) AS BIGINT) AS q_fp,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM m
), r AS (
  SELECT doc_id, q_fp, n_tokens,
         CAST(ntile(10) OVER (ORDER BY q_fp DESC, doc_id ASC) AS INT) AS phase
  FROM s
)
SELECT phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MAX(q_fp) AS q_max,
       MIN(q_fp) AS q_min
FROM r GROUP BY phase
"""


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE round-1 statistics (llm/bpe): adjacent character-symbol pairs
    over the word-frequency vocabulary, weighted by word count, with the
    Sennrich </w> end-of-word marker — the aggregation every merge round
    of the distributed trainer runs (the full iterative loop is
    reference-cross-checked in tests/test_bpe.py; this face pins its
    per-round statistic bit-exactly). Deterministic top-50 by
    (count desc, pair asc)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.bpe import (
        _initial_vocab,
        _pair_counts,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        _pair_counts(_initial_vocab(d, "text"))
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(50)
    )


SQL_BPE_PAIR_COUNTS = """
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word
), v AS (
  SELECT n, list_append(string_split(word, ''), '</w>') AS syms FROM wc
), p AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, n
  FROM v, unnest(range(1, len(syms))) AS r(i)
)
SELECT a, b, CAST(SUM(n) AS BIGINT) AS cnt
FROM p GROUP BY a, b
ORDER BY cnt DESC, a ASC, b ASC
LIMIT 50
"""


_BPE_MERGE_ROUNDS = 6


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer's ITERATIVE LOOP itself (llm/bpe.train_bpe_merges),
    driver-certified: the first 6 merge decisions (round, a, b, cnt) the
    distributed Sennrich loop takes over the documents corpus. Each round
    is one map-side-combined pair aggregation + a driver argmax (one
    (pair,count) row — the pagerank bounded-collect pattern) + a narrow
    F.aggregate fold rewrite of the word vocabulary; the merge table
    returned IS the tiny artifact a tokenizer ships, so materializing it
    on the driver is the semantics, not a shortcut. Oracle: the same k
    rounds unrolled as chained CTEs (the pagerank pattern), with the
    merge fold expressed as a left-to-right non-overlapping string
    replace over marker-wrapped symbols — equivalent to the engine's
    fold because a merged symbol can only re-match as LEFT context when
    a+b == a, impossible for non-empty b."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.bpe import (
        train_bpe_merges,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        release_plan_caches,
    )

    d = load_table(spark, sf_dir, "documents")
    merges, vocab = train_bpe_merges(d, n_merges=_BPE_MERGE_ROUNDS)
    release_plan_caches(vocab)
    return spark.createDataFrame(
        [(i + 1, a, b, cnt) for i, (a, b, cnt) in enumerate(merges)],
        "round int, a string, b string, cnt long",
    )


def _sql_bpe_merges(k: int = _BPE_MERGE_ROUNDS) -> str:
    """Unrolled k-round BPE oracle. Symbols ride as a marker-wrapped
    string chr(2)||sym||chr(3)... so replace() (non-overlapping,
    left-to-right) implements the merge fold exactly; pairs re-split per
    round for the weighted count; argmax tie-break (cnt desc, a, b)
    matches the trainer. Assumes no early stop (every round's top pair
    has count >= min_pair_count) — true on the shared documents corpus."""
    sep = "chr(3) || chr(2)"
    rounds = []
    for r in range(1, k + 1):
        prev = f"v{r - 1}"
        rounds.append(f"""p{r} AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, string_split(trim(s, chr(2) || chr(3)), {sep}) AS syms
        FROM {prev}),
       unnest(range(1, len(syms))) AS r(i)
  GROUP BY 1, 2
), m{r} AS (
  SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
), v{r} AS (
  SELECT n, replace(s,
                    chr(2) || m{r}.a || chr(3) || chr(2) || m{r}.b || chr(3),
                    chr(2) || m{r}.a || m{r}.b || chr(3)) AS s
  FROM {prev}, m{r}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a, b, cnt FROM m{r}" for r in range(1, k + 1)
    )
    return f"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word
), v0 AS (
  SELECT n,
         chr(2) ||
         array_to_string(list_append(string_split(word, ''), '</w>'),
                         {sep}) ||
         chr(3) AS s
  FROM wc
), {", ".join(rounds)}
SELECT CAST(round AS INT) AS round, a, b, cnt FROM ({unions})
ORDER BY round
"""


SQL_BPE_MERGES = _sql_bpe_merges()
