"""Deduplication families: exact/normalized, MinHash-LSH, SimHash, n-gram Jaccard, components, embedding near-dup.

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


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llm/dedup.decontaminate): flag corpus
    docs sharing any 4-gram with the held-out 'benchmark' set (here: the
    hash-bucket test split, bucket >= 9000). Benchmark shingles broadcast;
    the corpus pass is a narrow shingle probe — no corpus-side shuffle,
    the training-set leakage guard at 100 TB."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import decontaminate
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    corpus = d.filter(bucket < 9000)
    bench = d.filter(bucket >= 9000)
    return decontaminate(corpus, bench, n=4)


SQL_DECONTAMINATE = f"""
WITH hx AS (
  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, text, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
), t AS (
  SELECT doc_id, bucket,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM b
), sh AS (
  SELECT doc_id, bucket,
         CASE WHEN len(toks) >= 4
           THEN list_distinct(list_transform(range(1, len(toks) - 2),
                                             i -> array_to_string(toks[i:i+3], ' ')))
           ELSE [] END AS shingles
  FROM t
), bench AS (
  SELECT DISTINCT UNNEST(shingles) AS shingle FROM sh WHERE bucket >= 9000
), corp AS (
  SELECT doc_id, UNNEST(shingles) AS shingle FROM sh WHERE bucket < 9000
), hits AS (
  SELECT doc_id, COUNT(*) AS n_hits FROM corp JOIN bench USING (shingle)
  GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM sh WHERE bucket < 9000) c
LEFT JOIN hits h USING (doc_id)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (north star): one row per normalized content fingerprint,
    keeper = min doc_id."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs (north star). Bounded to the
    first 1000 docs so the shingle self-join stays proportionate in bench."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return ngram_jaccard_pairs(d, n=3, threshold=0.5)


SQL_NGRAM_JACCARD = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
"""


def q_ngram_jaccard_stoplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard near-dup pairs with the doc-frequency stoplist ON —
    the skew-bounded production shape: shingles appearing in more than
    max_doc_freq documents are dropped BEFORE the self-join, so every join
    key is bounded to max_doc_freq^2 pairs (without it one boilerplate
    shingle shared by k docs lands k^2 rows on a single reducer). Jaccard
    is computed over the filtered shingle space on both sides of the
    ratio; the DuckDB oracle mirrors the doc-freq filter."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return ngram_jaccard_pairs(d, n=3, threshold=0.5, max_doc_freq=5)


SQL_NGRAM_JACCARD_STOPLIST = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), hot AS (  -- doc-freq stoplist, mirrors ngram_jaccard_pairs(max_doc_freq=5)
  SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 5
), sh AS (
  -- NOT EXISTS, not NOT IN (r9-advice NULL class): shingles here are
  -- never NULL, but the anti-join form matches Spark's left_anti on
  -- every input, so the oracle cannot silently diverge if they were
  SELECT doc_id, shingle FROM sh0
  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.shingle = sh0.shingle)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
"""


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs routed through random-hyperplane LSH
    buckets — no cross product anywhere in the plan (the r1 brute-force form
    was the designated scale-killer; see q_embedding_dups_exact for the
    bounded exact variant). Oracle SQL embeds the identical plane literals."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        embedding_dup_pairs_lsh,
    )

    return embedding_dup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.45,
        dim=64,
        num_planes=8,
        num_tables=12,
        seed=29,
    )


SQL_EMBEDDING_DUPS = _sql_embedding_dups_lsh(
    dim=64, threshold=0.45, num_planes=8, num_tables=12, seed=29
)


def q_embedding_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs on a bounded slice — the verify-stage /
    ground-truth face of q_embedding_dups (brute force is O(n^2); keep it
    bounded)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        embedding_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_dup_pairs(emb, threshold=0.45)


SQL_EMBEDDING_DUPS_EXACT = """
WITH v AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                          (a, b) -> a + b)) AS nrm
  FROM embeddings WHERE vec_id < 300
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(list_reduce(list_transform(list_zip(a.vec, b.vec), x -> x[1] * x[2]),
                         (p, q) -> p + q) / (a.nrm * b.nrm), 4) AS cos_sim
FROM v a, v b
WHERE a.id < b.id
  -- zero-norm vectors excluded on both engines: cosine is undefined for
  -- them (Spark side filters norm > 0; r16 adversarial embeddings sweep)
  AND a.nrm > 0 AND b.nrm > 0
  AND ROUND(list_reduce(list_transform(list_zip(a.vec, b.vec), x -> x[1] * x[2]),
                        (p, q) -> p + q) / (a.nrm * b.nrm), 4) >= 0.45
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates verified by estimated Jaccard, using
    classic universal hashing (md5 base hash + affine maps mod 2^31-1) —
    integer-only, so the DuckDB oracle reproduces signatures, bands,
    candidates and est_jaccard bit-for-bit at full production sizing
    (64 hashes x 16 bands). The JVM-only xxhash64 family
    (llm.dedup.minhash_dedup_pairs) keeps its semantics pinned by
    tests/test_llm_ops.py against true Jaccard."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_dedup_pairs_universal,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return minhash_dedup_pairs_universal(
        d, threshold=0.5, num_hashes=64, bands=16, seed=29
    )


SQL_MINHASH_LSH = _sql_minhash_universal(
    doc_bound=1000, num_hashes=64, bands=16, threshold=0.5, seed=29
)


def q_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with md5 string-min hashing: the oracle-checkable variant
    — DuckDB reproduces the identical signatures, bands, candidates and
    estimated Jaccard. Bounded to 200 docs (md5 string hashing is the slow
    family; the xxhash64 variant is the production path)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_dedup_pairs_md5,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_dedup_pairs_md5(d, threshold=0.5, num_hashes=32, bands=8)


SQL_MINHASH_LSH_MD5 = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 200
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END AS shingles
  FROM t  -- doc bound + 32x8 sizing mirror the Spark side exactly
), sigs AS (
  SELECT doc_id,
         list_transform(range(0, 32),
           j -> list_aggregate(
                  list_transform(shingles, s -> md5(j::VARCHAR || '|' || s)),
                  'min')) AS sig
  FROM sh WHERE len(shingles) > 0
), banded AS (
  SELECT doc_id,
         b AS band,
         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
  FROM sigs, unnest(range(0, 8)) AS u(b)
), cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
             / CAST(len(sa.sig) AS DOUBLE), 4) AS est_jaccard
FROM cands
JOIN sigs sa ON sa.doc_id = id_a
JOIN sigs sb ON sb.doc_id = id_b
WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
      / CAST(len(sa.sig) AS DOUBLE) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs by multi-index Hamming pigeonhole blocks
    (combinations of combo_m=2 chunks as join keys — a 2^16 key space per
    combo instead of the old fixed 2^8, so random-collision candidates
    shrink ~256x), bits derived from md5 hex nibbles packed into two 32-bit
    halves — integer-only, so the DuckDB oracle reproduces every bit vote,
    combo key and bit_count(xor) Hamming distance. combo_m is pinned here
    so the generated oracle shares the constants; the library auto-derives
    it from corpus size when unset. The JVM-only xxhash64 variant
    (llm.dedup.simhash_dedup_pairs) stays pinned by tests/test_llm_ops.py."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        simhash_dedup_pairs_md5,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return simhash_dedup_pairs_md5(d, max_hamming=6, blocks=8, combo_m=2)


SQL_SIMHASH_PAIRS = _sql_simhash_md5(doc_bound=1000, max_hamming=6, blocks=8, combo_m=2)


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components (min-label
    propagation, an iterative driver loop of join+agg rounds) over the
    n-gram Jaccard near-dup pairs. The DuckDB oracle walks the same graph
    with a recursive CTE — component labels are canonical (min id), so the
    results are engine-comparable."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dedup_components,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return dedup_components(ngram_jaccard_pairs(d, threshold=0.5))


SQL_DEDUP_COMPONENTS = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), walk AS (
  SELECT s AS id, s AS comp FROM e
  UNION
  SELECT e.s AS id, walk.comp FROM e JOIN walk ON e.d = walk.id
)
SELECT id, MIN(comp) AS component FROM walk GROUP BY id
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus incremental dedup (llm/dedup.incremental_dedup): a new
    ingest batch (tail split of the corpus, plus a simulated re-crawl of
    old documents and a duplicated slice of itself) dedups against the
    seen-corpus fingerprint snapshot without re-reading old text: narrow
    fingerprinting, one groupBy(fp) for intra-batch min-id dedup, LEFT
    ANTI against the store."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        exact_dedup,
        incremental_dedup,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.sampling import (
        hash_bucket,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    seen = exact_dedup(d.filter(bucket < 8000)).select("fp")
    new = d.filter(bucket >= 8000).select("doc_id", "text")
    dup_new = (
        d.filter(bucket >= 9500)
        .select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
    )
    recrawl = (
        d.filter(bucket < 1000)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    batch = new.unionByName(dup_new).unionByName(recrawl)
    return incremental_dedup(batch, seen)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pairs (llm/clustering.
    semantic_dup_pairs): bucket by nearest trained k-means centroid,
    pairwise cosine only within a cluster — the density-adaptive
    counterpart of the hyperplane-LSH bucketing in embedding_dups. Same
    0.45 threshold as the LSH face so the two candidate generators are
    directly comparable."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        semantic_dup_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dup_pairs(emb, TRAINED_CENTROIDS, threshold=0.45)


SQL_SEMANTIC_DEDUP = _sql_semantic_dedup(threshold=0.45)


SQL_INCREMENTAL_DEDUP = f"""
WITH hx AS (
  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
), b AS (
  SELECT doc_id, text, {_NIBFOLD_SPLIT} % 10000 AS bucket FROM hx
), seen AS (
  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM b WHERE bucket < 8000
), batch AS (
  SELECT doc_id, text FROM b WHERE bucket >= 8000
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM b WHERE bucket >= 9500
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM b WHERE bucket < 1000
), fresh AS (
  SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
         MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM batch GROUP BY 1
)
SELECT doc_id, fp, n_copies
FROM fresh WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp = fresh.fp)
"""
# NOT EXISTS, not NOT IN (r9 advice on bloom_pruned_dedup, same latent
# class): md5(NULL text) = NULL, and one NULL in the NOT-IN subquery
# empties the result under three-valued logic while Spark's left_anti
# KEEPS null-fp rows — NOT EXISTS matches the anti-join on that slice.


def q_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup (functions/text.normalize_text):
    lowercase + non-alphanumeric collapse before fingerprinting, catching
    re-punctuated near-copies byte-exact dedup misses. One shuffle on the
    16-byte fingerprint, same as dedup_exact."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(normalize_text(F.col("text"))).alias("fp"),
            "doc_id",
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


SQL_NORMALIZE_DEDUP = r"""
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection over duplicate clusters: the
    near-dup components (dedup_components over n-gram Jaccard pairs)
    joined back to the corpus, one representative per cluster by
    (max n_chars, min doc_id) — the keep/drop decision that turns a
    dup graph into a dedup action list. The argmax is a map-side
    combinable max_by, not a window over the full corpus."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        dedup_components,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    comp = dedup_components(ngram_jaccard_pairs(d, threshold=0.5))
    m = comp.join(
        d.select(F.col("doc_id").alias("id"), "n_chars"), on="id", how="inner"
    )
    canon = m.groupBy("component").agg(
        F.max_by(
            "id", F.struct(F.col("n_chars"), (-F.col("id")).alias("neg_id"))
        ).alias("canonical_id")
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    # propagate the component/shingle cache handles past the joins (r18:
    # the composition dropped them — two caches leaked per bench rep)
    return _with_caches(
        m.join(canon, on="component")
        .select(
            "id",
            "component",
            "canonical_id",
            (F.col("id") == F.col("canonical_id")).alias("is_canonical"),
        ),
        getattr(comp, "_spark_graft_caches", []),
    )


SQL_DEDUP_CANONICAL = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), walk AS (
  SELECT s AS id, s AS comp FROM e
  UNION
  SELECT e.s AS id, walk.comp FROM e JOIN walk ON e.d = walk.id
), comp AS (
  SELECT id, MIN(comp) AS component FROM walk GROUP BY id
), m AS (
  SELECT c.id, c.component, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.id
), ranked AS (
  SELECT id, component,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, id ASC) AS rn
  FROM m
), canon AS (
  SELECT component, id AS canonical_id FROM ranked WHERE rn = 1
)
SELECT m.id, m.component, canon.canonical_id,
       m.id = canon.canonical_id AS is_canonical
FROM m JOIN canon ON m.component = canon.component
"""


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram containment pairs (llm/dedup.containment_pairs):
    |A∩B| / min(|A|,|B|) — surfaces subset-duplicates (doc embedded in a
    longer doc) that union-normalized Jaccard under-scores. Same bounded
    shingle self-join plan as ngram_jaccard."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        containment_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return containment_pairs(d, n=3, threshold=0.8)


SQL_CONTAINMENT_DEDUP = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 4) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(n_common / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 4) >= 0.8
"""


def q_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional prefix-filtered Jaccard join (llm/dedup.
    ngram_jaccard_pairs_prefix, ppjoin-family pruning): IDENTICAL result
    to ngram_jaccard — same oracle — but candidates join only on each
    document's rarest ``m - ceil(t*m) + 1`` shingles, so the hot
    stopword keys never reach a reducer. This is the 100-TB plan for the
    exact-Jaccard family."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs_prefix,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return ngram_jaccard_pairs_prefix(d, n=3, threshold=0.5)


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage detection (llm/dedup.
    boilerplate_ngrams): the 5-gram spans appearing in the most DISTINCT
    documents — boilerplate / license blocks / templated text that
    doc-level dedup never sees. Per-doc distinct shingles, one map-side-
    combined aggregate keyed by the shingle, deterministic top-20."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        boilerplate_ngrams,
    )

    d = load_table(spark, sf_dir, "documents")
    return boilerplate_ngrams(d, n=5, min_docs=2, top_k=20)


SQL_BOILERPLATE_NGRAMS = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 5
           THEN list_transform(range(1, len(toks) - 3),
                               i -> array_to_string(toks[i:i+4], ' '))
           ELSE [] END)) AS shingle
  FROM t
)
SELECT shingle, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM sh GROUP BY shingle
HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, shingle ASC
LIMIT 20
"""


def q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (llm/dedup.soft_dedup_weights): every document
    weighted by the inverse size of its near-dup cluster (connected
    components over the n-gram Jaccard pairs; weight_fp =
    floor(1e6/cluster_size)) — the keep-and-downweight alternative to
    hard dedup. Docs in no pair keep weight 1e6 exactly; the weight table
    is pair-graph-sized and broadcasts onto the corpus."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        soft_dedup_weights,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    # cache=False (r18): this face's downstream work (driver union-find +
    # two tiny joins) is light enough that the shingle cache's columnar
    # encode cost exceeded the two fused re-derivations it saves — the one
    # face of the jaccard family where the cache measured net-negative
    # (wall 0.99 -> ~2.2 s, CPU 12.8 -> ~26 across three replicates)
    return soft_dedup_weights(d, ngram_jaccard_pairs(d, threshold=0.5, cache=False))


SQL_DEDUP_WEIGHTS = SQL_DEDUP_COMPONENTS.replace(
    "SELECT id, MIN(comp) AS component FROM walk GROUP BY id",
    """SELECT d.doc_id,
       COALESCE(w.weight_fp, CAST(1000000 AS BIGINT)) AS weight_fp
FROM (SELECT doc_id FROM documents WHERE doc_id < 1000) d
LEFT JOIN (
  SELECT comp.id,
         CAST(FLOOR(1000000.0 / s.csize) AS BIGINT) AS weight_fp
  FROM (SELECT id, MIN(comp) AS component FROM walk GROUP BY id) comp
  JOIN (SELECT component, COUNT(*) AS csize
        FROM (SELECT id, MIN(comp) AS component FROM walk GROUP BY id)
        GROUP BY component) s USING (component)
) w ON w.id = d.doc_id""",
)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring span map (llm/dedup.
    exact_substring_spans, 8-token grams, >=2 docs): per-document island
    count and duplicated-token coverage — the RefinedWeb exact-substring
    shape as one declarative plan (vocabulary-bounded gram count,
    left-semi position marking, per-doc gaps-and-islands window)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        exact_substring_spans,
    )

    d = load_table(spark, sf_dir, "documents")
    return exact_substring_spans(d, gram_words=8, min_docs=2)


SQL_SUBSTRING_DEDUP = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, len(toks) AS n_tokens, i AS pos,
         array_to_string(toks[i:i+7], ' ') AS gram
  FROM t, unnest(range(1, len(toks) - 7 + 1)) AS r(i)
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), p AS (
  SELECT g.doc_id, g.n_tokens, g.pos
  FROM g JOIN d USING (gram)
), isl AS (
  SELECT doc_id, n_tokens, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (SELECT doc_id, n_tokens, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM p)
), cov AS (
  SELECT doc_id, n_tokens, island,
         MAX(pos) - MIN(pos) + 8 AS covered
  FROM isl GROUP BY doc_id, n_tokens, island
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(covered) AS BIGINT) AS dup_tokens,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       (CAST(SUM(covered) AS BIGINT) * 1000000) // CAST(n_tokens AS BIGINT)
         AS dup_frac_fp
FROM cov GROUP BY doc_id, n_tokens
"""
