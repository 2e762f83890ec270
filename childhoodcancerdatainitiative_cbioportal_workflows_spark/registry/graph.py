"""Graph + fuzzy-string operators: triangle counting, fixed-point PageRank, q-gram Levenshtein join.

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


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q-gram blocked Levenshtein self-join (operators/fuzzy) over the
    DISTINCT part-name dictionary (min partkey as representative) —
    entity resolution matches name VARIANTS, so the dictionary is the
    right input; joining raw rows would just emit every dup-class
    quadratically (3.9M pairs at sf0.1 from 64 names). Exact result;
    candidates from a trigram equi-join + length prefilter, never the
    n² cross product.

    Contract pin (r17): the face compares SINGLE-BYTE text only
    (``octet_length = length``, a no-op on the shipped ASCII names) —
    Spark's levenshtein counts codepoints, DuckDB's counts UTF-8 bytes
    ('café'→'cafe': 1 vs 2), so the cross-engine oracle is only defined
    where byte == codepoint. The operator keeps codepoint semantics,
    certified against a pure-Python model (test_resample_projection)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.octet_length("p_name") == F.length("p_name"))
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("rep_id"))
    )
    return fuzzy_self_join(p, "rep_id", "p_name", max_dist=1, q=3)


SQL_FUZZY_JOIN = """
WITH d AS (
  SELECT p_name, MIN(p_partkey) AS rep_id FROM part
  WHERE strlen(p_name) = length(p_name)
  GROUP BY p_name
)
SELECT a.rep_id AS id_a, b.rep_id AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM d a JOIN d b ON a.rep_id < b.rep_id
WHERE levenshtein(a.p_name, b.p_name) <= 1
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-dup pair graph (a<b<c edge-join
    ordering, each triangle counted once) — the density statistic that
    distinguishes tight duplicate cliques from chains before
    canonicalization. The pair list is persisted before the triple
    self-join (same lineage lesson as pagerank's edge list,
    operators/graph.py): unpersisted, the whole shingle->jaccard
    derivation would execute once per join branch."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    p0 = ngram_jaccard_pairs(d, threshold=0.5)
    e = p0.select("id_a", "id_b").persist()
    e1 = e.toDF("a", "b")
    e2 = e.toDF("b", "c")
    e3 = e.toDF("a", "c")
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return _with_caches(
        tri.agg(F.count(F.lit(1)).alias("n_triangles")),
        [e, *getattr(p0, "_spark_graft_caches", [])],
    )


SQL_TRIANGLE_COUNT = """
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
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
)
SELECT COUNT(*) AS n_triangles
FROM pairs e1
JOIN pairs e2 ON e2.id_a = e1.id_b
JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank, 3 iterations, over the near-dup pair graph
    (operators/graph.pagerank_fixed): every rank is an integer in 1e-9
    units and every step is floor division + integer sums, so the
    iterative recurrence is BIT-comparable across engines — the
    oracle-checkable face of iterative graph algorithms (components'
    star contraction being the other)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        pagerank_fixed,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    p0 = ngram_jaccard_pairs(d, threshold=0.5)
    out = pagerank_fixed(p0.select("id_a", "id_b"), iters=3)
    # .select() drops the builder's cache attribute — re-attach the shingle
    # cache so release_plan_caches frees it (r18)
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    return _with_caches(
        out,
        [
            *getattr(out, "_spark_graft_caches", []),
            *getattr(p0, "_spark_graft_caches", []),
        ],
    )


SQL_PAGERANK = _sql_pagerank()


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel (operators/graph.kcore_peel, k=2, 3 rounds)
    over the near-dup pair graph — the subgraph-density face of the
    iterative-graph family (pagerank = weights, components = membership,
    k-core = cohesion): chains and pendant nodes peel away, duplicate
    cliques survive. Three rounds converge on this corpus (verified in
    tests), so the bounded peel equals the true 2-core here; the oracle
    unrolls the identical rounds as chained CTEs."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    p0 = ngram_jaccard_pairs(d, threshold=0.5)
    out = kcore_peel(p0.select("id_a", "id_b"), k=2, iters=3)
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    # re-attach the jaccard builder's shingle cache past the .select (r18)
    return _with_caches(
        out,
        [
            *getattr(out, "_spark_graft_caches", []),
            *getattr(p0, "_spark_graft_caches", []),
        ],
    )


def _sql_kcore() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel_sql,
    )

    return kcore_peel_sql(_PAIRS_CTE_BODY, k=2, iters=3)


SQL_KCORE = _sql_kcore()


def q_fuzzy_join_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totalized fuzzy self-join over a MIXED-length dictionary
    (operators/fuzzy, r6): nation names run 4-18 chars, so several sit
    BELOW the q-gram soundness bound (len < 6 at q=3, k=1) and route
    through the length-bucket short stratum — IRAN/IRAQ is a genuine
    short-stratum edit pair — while the long names stay trigram-blocked.
    The pre-r6 operator raised on this input; the oracle is plain brute
    force, so the union of both strata is certified exact.

    Contract pin (r17): single-byte guard on both engines (see
    q_fuzzy_join); no-op on the shipped ASCII nation names."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
    )

    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.octet_length("n_name") == F.length("n_name"))
        .select("n_nationkey", "n_name")
    )
    return fuzzy_self_join(n, "n_nationkey", "n_name", max_dist=1, q=3)


SQL_FUZZY_JOIN_MIXED = """
WITH n AS (
  SELECT n_nationkey, n_name FROM nation
  WHERE strlen(n_name) = length(n_name)
)
SELECT a.n_nationkey AS id_a, b.n_nationkey AS id_b,
       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
FROM n a JOIN n b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 1
"""
