"""Round-9 sketch-composition faces: the exact→sketch handoff certified
END TO END (r8 verdict task 3), plus the grouped-HLL face the r8 advice
pass showed was an evidence gap (both grouped-HLL bugs it found lived in
the path no registered face exercised).

Each q_* returns a DataFrame; each SQL_* is its DuckDB oracle. New faces
live in this NEW module so no certified face's content fingerprint flips
(REGISTRY_FPR rule).
"""

from ._common import *  # noqa: F401,F403
from .textops import _duck_hexfold


def q_bloom_pruned_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB dedup handoff: sketch-prune THEN exact operator, in one
    certified plan. An incremental document dedup against a seen-store
    snapshot (docs with doc_id % 3 == 0, fingerprinted md5(text)) where
    the snapshot's portable Bloom filter (operators/sketches.bloom_build,
    ≤ k·m = 64k present-bit rows regardless of store size) splits the
    batch BEFORE any join shuffle: NOT maybe_member rows are definitely
    new (the zero-false-negative guarantee, certified by the
    bloom_prefilter face) and bypass the anti-join entirely; only the
    maybe slice pays the exact left-anti against the store. The oracle is
    the PLAIN unpruned anti-join — agreement proves the sketch handoff is
    output-invisible, mirroring what bloom_join_prune certifies for
    joins. Reference parity: the reference dedups incremental study
    uploads by full pandas isin() against the prior manifest
    (workflows/pedmatch-clinical-vcf-workflow.py manifest reconcile);
    this is that check with the 100 TB pre-filter in front."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    snap = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    batch = docs.select("doc_id", "source", F.md5("text").alias("fp"))
    bloom = bloom_build(snap, "fp", k=4, m=16384)
    maybe_fps = (
        bloom_probe(bloom, batch.select("fp").distinct(), "fp")
        .filter(F.col("maybe_member"))
        .select("fp")
    )
    fresh = batch.join(maybe_fps, "fp", "left_anti")  # certainly unseen
    survivors = batch.join(maybe_fps, "fp", "left_semi").join(
        snap, "fp", "left_anti"
    )  # exact check only on the maybe slice
    new = fresh.unionByName(survivors)
    return new.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum(F.col("doc_id").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("id_sum"),
    )


SQL_BLOOM_PRUNED_DEDUP = """
WITH snap AS (
  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 = 0
), batch AS (
  SELECT doc_id, source, md5(text) AS fp FROM documents
)
SELECT source, COUNT(*) AS n_new,
       CAST(SUM(CAST(doc_id AS HUGEINT)) AS BIGINT) AS id_sum
FROM batch
WHERE NOT EXISTS (SELECT 1 FROM snap WHERE snap.fp = batch.fp)
GROUP BY source
"""
# NOT EXISTS, not NOT IN (r9 advice): md5(NULL) = NULL, and a NULL in the
# NOT-IN subquery would empty the whole result in SQL three-valued logic,
# while Spark's left_anti KEEPS null-fp rows — NOT EXISTS matches the
# anti-join on that slice.


def q_hll_grouped_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group portable HLL certified BIT-EXACTLY, NULLs included
    (operators/sketches.hll_sketch_grouped/hll_estimate_grouped): distinct
    customers per order priority, with every tenth custkey masked to NULL
    so the 'a NULL is not a set member' rule (the r8 advice fix) is
    certified cross-engine, not just unit-tested. Emits per group the
    exact distinct count next to the sketch internals and the raw
    integer estimate — the grouped sibling of hll_profile, closing the
    registered-face gap both r8-advice HLL bugs hid in. Shuffle payload
    is ≤ m = 512 register rows per (group, partition), never the keys."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_sketch_grouped,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.when(F.col("o_custkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("k"),
    )
    est = hll_estimate_grouped(hll_sketch_grouped(o, "g", "k", p=9), "g", p=9)
    exact = o.groupBy("g").agg(F.countDistinct("k").alias("n_exact"))
    return exact.join(
        est.select("g", "n_present", "n_zero", "s_sum", "est_n"), "g"
    )


from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.sketches import (  # noqa: E402
    _hll_alpha_num as _hll_a9,
)


def q_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-signature set similarity with CERTIFIED estimation error
    (operators/setsketch): per-language token-set signatures (64
    universal-hash planes over md5 token ids — the llm.dedup hash family)
    estimate all-pairs Jaccard as matches/k, emitted next to the exact
    intersection/union counts so the estimate-vs-truth gap is the
    certified approximation error (the ann_recall / lsh_recall discipline
    applied to the resemblance sketch). The signature join is
    corpus-size-independent: G·64 rows per side regardless of vocabulary;
    the exact pair costs a full vocabulary self-join — the gap this
    sketch exists to close at 100 TB."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.setsketch import (
        jaccard_estimate_pairs,
        minhash_group_signature,
    )

    docs = load_table(spark, sf_dir, "documents")
    # NOTE (r18): a persist of this 4x-consumed distinct was tried and
    # measured net-SLOWER across three replicates (CPU 3.8 -> ~11): the
    # re-derivations are fused, column-pruned aggregation pipelines,
    # cheaper than the columnar cache encode + eager fill they were
    # replaced with. Reverted; the ks_drift lesson applies verbatim.
    toks = docs.select(
        F.col("lang").alias("g"),
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok"),
    ).distinct()
    est = jaccard_estimate_pairs(
        minhash_group_signature(toks, "g", "tok", num_hashes=64, seed=7)
    )
    sizes = toks.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    ta = toks.select(F.col("g").alias("g_a"), "tok")
    tb = toks.select(F.col("g").alias("g_b"), "tok")
    inter = (
        ta.join(tb, "tok")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("g").alias("g_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col("g").alias("g_b"), F.col("n").alias("_nb"))
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    # propagate the signature cache past the joins and attach toks (r18:
    # the wrap dropped the handle — one cache leaked per bench rep)
    return _with_caches(
        est.join(inter, ["g_a", "g_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .join(sa, "g_a")
        .join(sb, "g_b")
        .select(
            "g_a",
            "g_b",
            "matches",
            "k",
            "n_inter",
            (F.col("_na") + F.col("_nb") - F.col("n_inter")).alias("n_union"),
        ),
        getattr(est, "_spark_graft_caches", []),
    )


def _sql_jaccard_estimate() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_universal_coeffs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.setsketch import (
        MERSENNE31,
    )

    a_co, b_co = minhash_universal_coeffs(64, 7)
    a_sql = "[" + ",".join(str(v) for v in a_co) + "]::BIGINT[]"
    b_sql = "[" + ",".join(str(v) for v in b_co) + "]::BIGINT[]"
    return f"""
WITH t AS (
  SELECT DISTINCT lang AS g,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), hx AS (
  SELECT g, md5(tok) AS h FROM t
), xs AS (
  SELECT g, {_duck_hexfold(1, 8)} % {MERSENNE31} AS x FROM hx
), coeff AS (
  SELECT {a_sql} AS a, {b_sql} AS b
), planes AS (
  SELECT g, j, (a[j + 1] * x + b[j + 1]) % {MERSENNE31} AS h2
  FROM xs, coeff, (SELECT unnest(range(0, 64)) AS j)
), sig AS (
  SELECT g, j, MIN(h2) AS h FROM planes GROUP BY g, j
), est AS (
  SELECT a.g AS g_a, b.g AS g_b,
         CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
           AS matches,
         COUNT(*) AS k
  FROM sig a JOIN sig b ON a.j = b.j AND a.g < b.g
  GROUP BY 1, 2
), sizes AS (
  SELECT g, COUNT(*) AS n FROM t GROUP BY g
), inter AS (
  SELECT a.g AS g_a, b.g AS g_b, COUNT(*) AS n_inter
  FROM t a JOIN t b ON a.tok = b.tok AND a.g < b.g
  GROUP BY 1, 2
)
SELECT est.g_a, est.g_b, est.matches, est.k,
       CAST(COALESCE(inter.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - COALESCE(inter.n_inter, 0) AS BIGINT) AS n_union
FROM est
LEFT JOIN inter ON est.g_a = inter.g_a AND est.g_b = inter.g_b
JOIN sizes sa ON sa.g = est.g_a
JOIN sizes sb ON sb.g = est.g_b
"""


SQL_JACCARD_ESTIMATE = _sql_jaccard_estimate()

SQL_HLL_GROUPED_PROFILE = f"""
WITH t AS (
  SELECT DISTINCT o_orderpriority AS g, CAST(o_custkey AS VARCHAR) AS token
  FROM orders WHERE o_custkey % 10 <> 0
), hx AS (
  SELECT g, md5(token) AS h FROM t
), parts AS (
  SELECT g, {_duck_hexfold(1, 4)} % 512 AS idx,
         {_duck_hexfold(5, 12)} AS v
  FROM hx
), regs AS (
  SELECT g, idx,
         MAX(CASE WHEN v = 0 THEN 49
                  ELSE CAST(49 - length(bin(v)) AS INT) END) AS rho
  FROM parts GROUP BY g, idx
), agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_present,
         CAST(SUM(1::BIGINT << (49 - rho)) AS BIGINT) AS present_sum
  FROM regs GROUP BY g
), s AS (
  SELECT g, n_present,
         CAST(512 - n_present AS BIGINT) AS n_zero,
         CAST(present_sum + (512 - n_present) * (1::BIGINT << 49)
              AS BIGINT) AS s_sum
  FROM agg
), ex AS (
  SELECT o_orderpriority AS g,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders WHERE o_custkey % 10 <> 0
  GROUP BY o_orderpriority
)
SELECT ex.g, ex.n_exact, s.n_present, s.n_zero, s.s_sum,
       CAST({_hll_a9(9)}::HUGEINT // s.s_sum AS BIGINT) AS est_n
FROM ex JOIN s USING (g)
"""
