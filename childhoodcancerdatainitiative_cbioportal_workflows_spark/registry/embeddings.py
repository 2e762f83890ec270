"""Embedding-space operators: cosine top-k, ANN (LSH/IVF), k-means, random projection, quantization.

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


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search (north star): for the first
    10 vectors, the 5 nearest neighbours by cosine. Dot products computed as
    sequential double folds in BOTH engines for bit-identical results.
    Zero-norm vectors excluded on both engines (cosine undefined; ANSI
    DIVIDE_BY_ZERO otherwise — r17 ANN adversarial sweep)."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.col("embedding").cast("array<double>")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    nrm = lambda v: F.sqrt(dot(v, v))  # noqa: E731
    q = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("q_id"), as_double.alias("q_emb"))
        .withColumn("_qnrm", nrm(F.col("q_emb")))
        .filter(F.col("_qnrm") > 0)
    )
    c = (
        emb.select(F.col("vec_id").alias("c_id"), as_double.alias("c_emb"))
        .withColumn("_cnrm", nrm(F.col("c_emb")))
        .filter(F.col("_cnrm") > 0)
    )

    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("_qnrm") * F.col("_cnrm")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


SQL_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb,
         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                          (a, b) -> a + b)) AS qnrm
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_emb,
         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                          (a, b) -> a + b)) AS cnrm
  FROM embeddings
), pairs AS (
  SELECT q_id, c_id,
    list_reduce(list_transform(list_zip(q_emb, c_emb), x -> x[1] * x[2]), (a, b) -> a + b)
      / (qnrm * cnrm) AS cos_sim
  -- zero-norm vectors excluded on both engines (cosine undefined)
  FROM c, q WHERE q_id <> c_id AND qnrm > 0 AND cnrm > 0
)
SELECT q_id, c_id, ROUND(cos_sim, 4) AS cos_sim, rank FROM (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
  FROM pairs
) WHERE rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbours. The hyperplanes are a
    seeded deterministic matrix, so the generated oracle SQL embeds the
    identical plane literals and reproduces bucketing, candidate pairs and
    the ranked top-k; recall vs the exact top-k is additionally pinned by
    tests/test_llm_ops.py."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        k=5,
        dim=64,
        num_planes=10,
        num_tables=4,
        seed=13,
    )


SQL_ANN_LSH = _sql_ann_lsh(
    dim=64, k=5, num_planes=10, num_tables=4, seed=13, q_bound=50
)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate nearest neighbours: inverted lists under a
    deterministic sampled coarse quantizer, nprobe-list probing. The
    centroid id sample is seeded, so the oracle rebuilds the identical
    index."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import ivf_flat_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_flat_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        centroid_ids=_ivf_centroid_ids(),
        k=5,
        nprobe=4,
    )


SQL_ANN_IVF = _sql_ann_ivf(k=5, nprobe=4, q_bound=50)


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat under the TRAINED coarse quantizer: k-means|| centroids
    checked in as literals (llm/ivf_centroids.py, trained offline by
    scripts/train_ivf_centroids.py on the SF-stable vec_id<500 pool), so
    the index follows corpus density instead of a uniform id sample. The
    same literals inline into the oracle SQL — identical assignment,
    probing and ranking in both engines."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ivf_flat_topk_trained,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_flat_topk_trained(
        emb,
        emb.filter(F.col("vec_id") < 50),
        centroids=TRAINED_CENTROIDS,
        k=5,
        nprobe=4,
    )


SQL_ANN_IVF_TRAINED = _sql_ann_ivf_trained(k=5, nprobe=4, q_bound=50)


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus clustering profile (llm/clustering.cluster_profile):
    every vector assigned to its nearest trained k-means centroid via the
    shuffle-free array fold, then ONE per-cluster aggregation (size + mean
    member-to-centroid cosine, fixed-point summed). The same centroid
    literals inline into the oracle."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        cluster_profile,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_profile(emb, TRAINED_CENTROIDS)


SQL_KMEANS_CLUSTERS = _sql_kmeans_clusters()


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric embedding quantization (llm/quantize): 4x narrower
    vectors for the ANN index families, plus the per-vector max
    reconstruction-error audit. Pure per-row HOF projection — zero
    shuffles; rounding pinned to floor(x/scale*127 + 0.5) so both
    engines bit-match. The face serializes the code array to a CSV
    string (qvec_csv): the driver's canonicalizer sorts result columns
    with pandas, which cannot order array cells (CORRECTNESS_r06 err) —
    the operator itself still returns the typed array<tinyint>."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        quantize_embeddings,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e)
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
        "max_err",
    )


SQL_QUANTIZE_EMBEDDINGS = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, scale, embedding,
         list_transform(embedding, x -> CAST(
             CASE WHEN scale = 0 THEN 0
                  ELSE GREATEST(-127.0, LEAST(127.0,
                       FLOOR(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)))
             END AS INT)) AS qvec
  FROM s
)
SELECT vec_id, scale,
       array_to_string(list_transform(qvec, x -> CAST(x AS VARCHAR)),
                       ',') AS qvec_csv,
       list_max(list_transform(range(1, len(embedding) + 1),
           i -> abs(CAST(embedding[i] AS DOUBLE)
                    - qvec[i] * scale / 127.0))) AS max_err
FROM q
"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sparse sign projection (llm/projection):
    64-dim embeddings onto 8 random +/-1 planes, fixed-point bigint sums
    so the result is exact and order-free in any engine. Zero shuffles —
    the matrix is a plan literal."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        random_projection,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return random_projection(e, k=8, dim=64, seed=42)


SQL_RANDOM_PROJECTION = _projection_sql(k=8, dim=64, seed=42)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k certification for the IVF index (llm/similarity
    ann_recall): the sampled-quantizer ann_ivf result (k=5, nprobe=4)
    scored against the exact cosine top-5 on the same vec_id<50 query
    set. Both sides are deterministic constructions, so the recall
    number itself — what the approximation actually costs — is
    oracle-checkable to the last digit instead of asserted in prose.
    recall_fp = 1e6 * hits div exact, exact integer arithmetic."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ann_recall,
        cosine_topk,
        ivf_flat_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_flat_topk(
        emb, queries, centroid_ids=_ivf_centroid_ids(), k=5, nprobe=4
    )
    return ann_recall(exact, approx, k=5, nprobe=4)


def _sql_exact_topk(k: int, q_bound: int) -> str:
    """Exact brute-force cosine top-k oracle body, parametrized on the
    query-id bound (the SQL_COSINE_TOPK shape)."""
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb,
         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                          (a, b) -> a + b)) AS qnrm
  FROM embeddings WHERE vec_id < {q_bound}
), c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_emb,
         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                          (a, b) -> a + b)) AS cnrm
  FROM embeddings
), pairs AS (
  SELECT q_id, c_id,
    list_reduce(list_transform(list_zip(q_emb, c_emb), x -> x[1] * x[2]), (a, b) -> a + b)
      / (qnrm * cnrm) AS cos_sim
  -- zero-norm vectors excluded on both engines (cosine undefined)
  FROM c, q WHERE q_id <> c_id AND qnrm > 0 AND cnrm > 0
)
SELECT q_id, c_id FROM (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


SQL_ANN_RECALL = f"""
WITH approx AS ({_sql_ann_ivf(k=5, nprobe=4, q_bound=50)}),
exact AS ({_sql_exact_topk(k=5, q_bound=50)}),
hits AS (
  SELECT e.q_id, e.c_id
  FROM exact e JOIN approx a ON a.q_id = e.q_id AND a.c_id = e.c_id
)
SELECT 5 AS k, 4 AS nprobe,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits,
       CAST((1000000 * (SELECT COUNT(*) FROM hits))
            // (SELECT COUNT(*) FROM exact) AS BIGINT) AS recall_fp
"""
