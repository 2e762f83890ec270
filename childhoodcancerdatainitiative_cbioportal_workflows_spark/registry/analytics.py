"""Round-8b analytics faces: heavy hitters, BFS, exact decay, robust
MAD anomalies, sorted-neighborhood blocking, reciprocal-rank fusion.

Each q_* returns a DataFrame; each SQL_* is its DuckDB oracle
(value-exact at any SF). All operators live in new modules
(operators/heavyhitters, bfs, decay, robust, neighborhood, llm/fusion)
so no certified face's content fingerprint flips (REGISTRY_FPR rule).
"""

from pyspark.sql import Window

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401
    _BM25_TERMS,
    _PAIRS_CTE_BODY,
    _sql_bm25,
)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase exact heavy hitters (operators/heavyhitters): every
    token holding ≥ 1/200 of the corpus token mass, with exact counts.
    The Misra-Gries candidate pass bounds the shuffle to candidate rows
    (≤ 2·200/partition) instead of the vocabulary; the broadcast-
    filtered recount makes the result exact and partitioning-
    independent — the oracle is therefore plain GROUP BY."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        heavy_hitters,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
    return heavy_hitters(toks, "token", support_inv=200)


SQL_HEAVY_HITTERS = """
WITH t AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
  FROM documents
), n AS (
  SELECT COUNT(*) AS n FROM t
), c AS (
  SELECT token, COUNT(*) AS freq FROM t GROUP BY token
)
SELECT token, freq FROM c, n WHERE freq >= (n + 199) // 200
"""


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS (operators/bfs) over the near-dup pair
    graph: hop distance from the doc_id<100 seed nodes, 4 rounds. The
    iterative frontier loop is certified by a recursive-CTE oracle —
    the traversal member of the iterative-graph family (pagerank /
    kcore / components)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        bfs_hops,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    p0 = ngram_jaccard_pairs(d, threshold=0.5)
    pairs = p0.select("id_a", "id_b").persist()
    seeds = (
        pairs.select(F.col("id_a").alias("node"))
        .union(pairs.select(F.col("id_b").alias("node")))
        .filter(F.col("node") < 100)
        .distinct()
    )
    out = bfs_hops(pairs, seeds, max_hops=4, src="id_a", dst="id_b")
    pairs.unpersist()  # bfs_hops localCheckpoints eagerly, cache is spent
    for c in getattr(p0, "_spark_graft_caches", []):
        c.unpersist()  # the jaccard shingle cache is spent too (r18)
    return out


SQL_BFS_HOPS = f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({_PAIRS_CTE_BODY})
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), seeds AS (
  SELECT DISTINCT s AS node FROM edges WHERE s < 100
), walk(node, hop) AS (
  SELECT node, 0 AS hop FROM seeds
  UNION
  SELECT e.d AS node, w.hop + 1 AS hop
  FROM walk w JOIN edges e ON e.s = w.node
  WHERE w.hop < 4
)
SELECT node, CAST(MIN(hop) AS INT) AS hops FROM walk GROUP BY node
"""


def q_decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact exponential-decay trending (operators/decay): per event
    type, the half-life-2-days decayed activity score over the trailing
    30 days, in integer fixed point (weights are powers of two, the sum
    is DECIMAL-routed) — rank-identical to the float formula, bit-
    identical across engines."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        decayed_scores,
    )

    e = load_table(spark, sf_dir, "events")
    return decayed_scores(
        e, "event_type", "ts", half_life_days=2, horizon_days=30
    )


SQL_DECAYED_TRENDING = """
WITH ref AS (
  SELECT MAX(CAST(ts AS DATE)) AS ref_d FROM events
), aged AS (
  SELECT event_type,
         date_diff('day', CAST(ts AS DATE), ref_d) AS age
  FROM events, ref
)
SELECT event_type,
       CAST(SUM(CAST((CAST(1 AS BIGINT) << (14 - CAST(age // 2 AS INT))) AS HUGEINT)) AS BIGINT) AS score_fp
FROM aged WHERE age >= 0 AND age < 30
GROUP BY event_type
"""


def q_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group anomaly profile (operators/robust): median and
    MAD of order totals (cents) per order priority, and how many orders
    sit outside median ± 3·MAD. Exact order statistics via the grouped
    rank-walk — the heavy-tail-safe sibling of anomaly_flags' 3σ rule.
    Low-median convention pinned by a brute-force model test
    (tests/test_analytics_ops.py)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        mad_anomalies,
    )

    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderpriority",
        # round-then-cast: DOUBLE cents land within 1e-9 of an integer,
        # and CAST alone truncates in Spark but rounds in DuckDB
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    return mad_anomalies(v, "o_orderpriority", "price_c", mult=3)


SQL_MAD_ANOMALIES = """
WITH v AS (
  SELECT o_orderpriority AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders WHERE o_totalprice IS NOT NULL
), c AS (
  SELECT k, x, COUNT(*) AS cnt FROM v GROUP BY k, x
), cum AS (
  SELECT k, x, cnt,
         SUM(cnt) OVER (PARTITION BY k ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM c
), tot AS (
  SELECT k, SUM(cnt) AS n FROM c GROUP BY k
), med AS (
  SELECT k, MIN(x) AS med FROM cum JOIN tot USING (k)
  WHERE cum >= (n + 1) // 2 GROUP BY k
), d AS (
  SELECT v.k, abs(x - med) AS dx, med FROM v JOIN med USING (k)
), dc AS (
  SELECT k, dx, COUNT(*) AS cnt FROM d GROUP BY k, dx
), dcum AS (
  SELECT k, dx, cnt,
         SUM(cnt) OVER (PARTITION BY k ORDER BY dx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM dc
), mad AS (
  SELECT k, MIN(dx) AS mad FROM dcum JOIN tot USING (k)
  WHERE cum >= (n + 1) // 2 GROUP BY k
)
SELECT d.k AS o_orderpriority,
       MIN(d.med) AS med_fp,
       MIN(mad.mad) AS mad_fp,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN d.dx > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM d JOIN mad USING (k)
GROUP BY d.k
"""


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (operators/neighborhood): candidate
    pairs within a 3-row window of the normalized-text sort order, kept
    at ≥ 40% distinct-token Jaccard — the structurally-bounded third
    member of the near-dup blocking family (LSH probabilistic, q-gram
    length-guarded, sorted-neighborhood windowed)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        sorted_neighborhood_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        d, "doc_id", "text", window=3, block_prefix=2, key_prefix=16, min_pct=40
    )


SQL_SORTED_NEIGHBORHOOD = """
WITH t AS (
  SELECT doc_id AS id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 2) AS blk,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 16) AS key,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS toks
  FROM documents
), r AS (
  SELECT id, blk, key, toks,
         ROW_NUMBER() OVER (PARTITION BY blk ORDER BY key, id) AS rn
  FROM t
), cand AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS INT) AS n_inter,
         CAST(len(a.toks) AS INT) + CAST(len(b.toks) AS INT) AS n_tot
  FROM r a JOIN r b
    ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
)
SELECT id_a, id_b, n_inter, n_tot - n_inter AS n_union
FROM cand
WHERE n_tot - n_inter > 0 AND 100 * n_inter >= 40 * (n_tot - n_inter)
"""


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion (llm/fusion.rrf_fuse): reciprocal-rank
    fusion of the BM25 top-100 (lexical, llm/relevance) and the cosine
    top-100 for query vector 0 (dense, embeddings table; doc_id and
    vec_id share an id space in the testdata) — integer fixed-point RRF,
    final top-20 by fused score."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        bm25_topk,
        rrf_fuse,
    )

    d = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(d, list(_BM25_TERMS), k=100)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bmr = bm.select("doc_id", F.row_number().over(wb).alias("rank"))

    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(as_double.alias("q_emb"))
    c = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"), as_double.alias("c_emb")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    cos = c.crossJoin(F.broadcast(q)).withColumn(
        "cs",
        dot(F.col("q_emb"), F.col("c_emb"))
        / (
            F.sqrt(dot(F.col("q_emb"), F.col("q_emb")))
            * F.sqrt(dot(F.col("c_emb"), F.col("c_emb")))
        ),
    )
    # TakeOrderedAndProject first (never a global sort), THEN rank the
    # bounded 100-row result — a row_number window over the full
    # candidate set would drag everything to one partition
    cos_top = cos.orderBy(F.col("cs").desc(), F.col("doc_id").asc()).limit(100)
    wc = Window.orderBy(F.col("cs").desc(), F.col("doc_id").asc())
    cosr = cos_top.withColumn("rank", F.row_number().over(wc)).select(
        "doc_id", "rank"
    )
    return rrf_fuse([bmr, cosr], id_col="doc_id", topn=20)


SQL_RRF_FUSION = f"""
WITH bm AS (
  SELECT doc_id, score FROM ({_sql_bm25(_BM25_TERMS, 100)})
), bmr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM bm
), q AS (
  SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS c_emb FROM embeddings
  WHERE vec_id <> 0
), cos AS (
  SELECT doc_id,
    list_reduce(list_transform(list_zip(q_emb, c_emb), x -> x[1] * x[2]), (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(q_emb, x -> x * x), (a, b) -> a + b))
         * sqrt(list_reduce(list_transform(c_emb, x -> x * x), (a, b) -> a + b))) AS cs
  FROM c, q
), cos_top AS (
  SELECT doc_id, cs FROM cos ORDER BY cs DESC, doc_id LIMIT 100
), cosr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS r FROM cos_top
), u AS (
  SELECT doc_id, r FROM bmr UNION ALL SELECT doc_id, r FROM cosr
)
SELECT doc_id,
       CAST(SUM(1000000000 // (60 + r)) AS BIGINT) AS rrf_fp,
       COUNT(*) AS n_lists
FROM u GROUP BY doc_id
ORDER BY rrf_fp DESC, doc_id
LIMIT 20
"""


def q_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame (the frame variant running_window's
    rowsBetween does not cover): per user, the trailing-1-hour event
    count and value sum at every event. The frame is keyed on exact
    integer epoch SECONDS (unix_micros div — TIMESTAMP_NTZ must be cast
    to TIMESTAMP first, and truncation is identical in both engines for
    positive epochs), peers at the same second are included by RANGE
    semantics regardless of intra-second order, and the windowed SUM
    rides DECIMAL(18,4) (DuckDB's segment-tree double addition order
    differs from Spark's — the running_window lesson)."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    return (
        e.select("user_id", "event_id", sec.alias("sec"), "value")
        .withColumn("n_1h", F.count(F.lit(1)).over(w))
        .withColumn(
            "sum_1h",
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"),
        )
        .select("user_id", "event_id", "sec", "n_1h", "sum_1h")
    )


SQL_RANGE_ROLLING = """
SELECT user_id, event_id, sec,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
FROM (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec, value FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded weighted shortest paths (operators/bfs.sssp_hops):
    Bellman-Ford relaxation over the near-dup pair graph with
    deterministic integer weights ((id_a+id_b)%7+1), 3 rounds from the
    doc_id<100 seeds — the weighted member of the traversal family,
    certified against a path-enumerating recursive-CTE oracle (finite
    because (node, dist, hop) triples are bounded by the weight range)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        sssp_hops,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    p0 = ngram_jaccard_pairs(d, threshold=0.5)
    pairs = (
        p0.select(
            "id_a",
            "id_b",
            ((F.col("id_a") + F.col("id_b")) % 7 + 1).alias("wt"),
        )
        .persist()
    )
    seeds = (
        pairs.select(F.col("id_a").alias("node"))
        .union(pairs.select(F.col("id_b").alias("node")))
        .filter(F.col("node") < 100)
        .distinct()
    )
    out = sssp_hops(pairs, seeds, max_hops=3, src="id_a", dst="id_b", weight="wt")
    pairs.unpersist()  # sssp_hops localCheckpoints eagerly, cache is spent
    for c in getattr(p0, "_spark_graft_caches", []):
        c.unpersist()  # the jaccard shingle cache is spent too (r18)
    return out


SQL_SSSP_WEIGHTED = f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({_PAIRS_CTE_BODY})
), edges AS (
  SELECT id_a AS s, id_b AS d, (id_a + id_b) % 7 + 1 AS w FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d, (id_a + id_b) % 7 + 1 AS w FROM pairs
), seeds AS (
  SELECT DISTINCT s AS node FROM edges WHERE s < 100
), walk(node, dist, hop) AS (
  SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hop FROM seeds
  UNION
  SELECT e.d AS node, w.dist + e.w AS dist, w.hop + 1 AS hop
  FROM walk w JOIN edges e ON e.s = w.node
  WHERE w.hop < 3
)
SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
"""


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forest rollup by pointer doubling (operators/hierarchy): a
    synthetic order hierarchy (parent = orderkey div 10; keys < 100 are
    self-parented roots, giving ~100 trees of depth ≤ 4) flattened in 3
    doubling rounds — O(log depth) self-joins instead of O(depth) parent
    chases — then per-tree node counts and DECIMAL-routed cent totals.
    Sparse orderkeys leave many parents dangling (orderkey div 10 absent
    from orders); tree_roots heals those as self-rooted, so every order
    appears in exactly one tree and SUM(n_nodes) == COUNT(orders). The
    recursive-CTE oracle climbs one edge at a time over the same healed
    parent map; agreement certifies the doubling arithmetic."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        hierarchy_rollup,
    )

    o = load_table(spark, sf_dir, "orders")
    nodes = o.select(
        F.col("o_orderkey").alias("node"),
        F.when(F.col("o_orderkey") < 100, F.col("o_orderkey"))
        .otherwise(F.expr("o_orderkey div 10"))
        .alias("parent"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return hierarchy_rollup(nodes, "node", "parent", "cents", rounds=3)


SQL_HIERARCHY_ROLLUP = """
WITH RECURSIVE raw AS (
  SELECT o_orderkey AS node,
         CASE WHEN o_orderkey < 100 THEN o_orderkey ELSE o_orderkey // 10 END AS parent,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), nodes AS (
  SELECT r.node,
         CASE WHEN p.node IS NULL THEN r.node ELSE r.parent END AS parent,
         r.cents
  FROM raw r LEFT JOIN (SELECT node FROM raw) p ON p.node = r.parent
), climb(node, cur) AS (
  SELECT node, node FROM nodes
  UNION ALL
  SELECT c.node, n.parent
  FROM climb c JOIN nodes n ON n.node = c.cur
  WHERE n.parent <> n.node
), roots AS (
  SELECT c.node, c.cur AS root
  FROM climb c JOIN nodes n ON n.node = c.cur
  WHERE n.parent = n.node
)
SELECT r.root, COUNT(*) AS n_nodes,
       CAST(SUM(CAST(v.cents AS HUGEINT)) AS BIGINT) AS total
FROM roots r JOIN nodes v ON v.node = r.node
GROUP BY r.root
"""


def q_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides
    (brand × size-range × quantity-range clauses) over part ⋈ lineitem,
    reduced to one DECIMAL-routed revenue row. Exercises disjunctive
    predicate handling: the per-side conjuncts Catalyst can factor out
    (p_size ≥ 1, quantity bounds) push to the scans while the cross-side
    disjunction evaluates post-join."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISJUNCTIVE_FILTER = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall certification — the dedup-family sibling of
    ann_recall: how much of the EXACT 3-gram-Jaccard≥0.5 pair set does
    the production MinHash+LSH configuration (64 hashes × 16 bands,
    est-Jaccard verified) actually recover? Both sides are
    deterministic integer constructions, so the recall measurement
    itself is oracle-exact: (n_truth, n_candidates, n_hits, recall_bp)
    in basis points via integer div."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_dedup_pairs_universal,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    # Both pair sets are (id_a, id_b)-unique by construction, so ONE
    # full-outer join carries all three counts in a single aggregation —
    # the old join + three separate count aggs referenced each derivation
    # twice (truth in hits + n_truth, cand in hits + n_candidates),
    # re-executing the shingle-join and signature stages per reference
    # (r18: two full derivation passes dropped from the executed plan).
    cand0 = minhash_dedup_pairs_universal(
        d, threshold=0.5, num_hashes=64, bands=16, seed=29
    )
    cand = cand0.select("id_a", "id_b", F.lit(1).alias("_c"))
    truth0 = ngram_jaccard_pairs(d, threshold=0.5)
    truth = truth0.select("id_a", "id_b", F.lit(1).alias("_t"))
    both = truth.join(cand, ["id_a", "id_b"], "full_outer")
    agg = both.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(
            F.sum(F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1)),
            F.lit(0),
        ).cast("long").alias("n_hits"),
    )
    out = agg.select(
        "n_truth",
        "n_candidates",
        "n_hits",
        F.expr("(n_hits * 10000) div GREATEST(n_truth, 1)").alias("recall_bp"),
    )
    # propagate the minhash signature cache handle: .select() above drops
    # the attribute, so without this the bench's release_plan_caches leaks
    # one sigs cache per rep (r18 fix)
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    return _with_caches(
        out,
        [
            *getattr(cand0, "_spark_graft_caches", []),
            *getattr(truth0, "_spark_graft_caches", []),
        ],
    )


SQL_LSH_RECALL = f"""
WITH cand AS (
  SELECT id_a, id_b FROM ({_sql_minhash_universal(doc_bound=1000, num_hashes=64, bands=16, threshold=0.5, seed=29)})
), truth AS (
  SELECT id_a, id_b FROM ({_PAIRS_CTE_BODY})
), hits AS (
  SELECT t.id_a, t.id_b FROM truth t JOIN cand c USING (id_a, id_b)
)
SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       CAST(((SELECT COUNT(*) FROM hits) * 10000)
            // greatest((SELECT COUNT(*) FROM truth), 1) AS BIGINT) AS recall_bp
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/snapshot): orders vs a deterministically
    perturbed next-day snapshot (every 97th key removed, every 101st
    surviving key repriced, 50 keys added) — per-status row counts plus
    a key checksum so the driver hash pins WHICH rows moved, not just
    how many."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        snapshot_diff,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    surviving = o.filter(F.col("o_orderkey") % 97 != 0)
    repriced = surviving.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    added = o.filter(F.col("o_orderkey") < 50).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    new = repriced.unionByName(added)
    d = snapshot_diff(
        o, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderkey").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("key_sum"),
    )


SQL_SNAPSHOT_DIFF = """
WITH o AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM o WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, o_orderstatus
  FROM o WHERE o_orderkey < 50
), j AS (
  SELECT COALESCE(o.o_orderkey, new.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice IS NOT DISTINCT FROM new.o_totalprice
               AND o.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
                THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM o FULL OUTER JOIN new ON o.o_orderkey = new.o_orderkey
)
SELECT status, COUNT(*) AS n,
       CAST(SUM(CAST(k AS HUGEINT)) AS BIGINT) AS key_sum
FROM j GROUP BY status
"""


def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join, certified INVISIBLE (the salted_join
    discipline: the optimization must not change one bit of output).
    The dim side's keys build a portable Bloom filter
    (operators/sketches.bloom_build, ≤ k·m present-bit rows regardless
    of dim size); the fact side is pre-filtered by membership BEFORE
    the join shuffle — the classic 100 TB join-pruning pre-pass
    (false positives are removed by the exact join; false negatives
    cannot exist, certified by the bloom test suite). The oracle is the
    PLAIN join — agreement proves the prune dropped only non-matching
    rows."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        bloom_build,
        bloom_probe,
    )

    cust = load_table(spark, sf_dir, "customer")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom = bloom_build(bld, "c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cand = (
        bloom_probe(bloom, o.select("o_custkey").distinct(), "o_custkey")
        .filter(F.col("maybe_member"))
        .select("o_custkey")
    )
    pruned = o.join(cand, "o_custkey", "left_semi")
    return pruned.join(
        bld, pruned["o_custkey"] == bld["c_custkey"]
    ).agg(
        _dsum(F.col("o_totalprice"), "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_BLOOM_JOIN_PRUNE = """
SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
"""
