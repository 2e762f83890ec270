"""Genomic-shaped operators: binned interval join, CNV matrix, GISTIC scalar pipeline, regex extraction.

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


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join == bedtools intersect -wo -f 0.5 (cnv.py:413-436).
    Interval tables derived deterministically from part (genes) and orders
    (segments); overlap must cover >= 50% of the gene."""
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    genes = p.select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 5).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 37) % 100000).alias("start"),
        (((F.col("p_partkey") * 37) % 100000) + 200 + F.col("p_size") * 11).alias("end"),
    )
    segs = o.select(
        F.col("o_orderkey").alias("seg_id"),
        F.concat(F.lit("c"), (F.col("o_orderkey") % 5).cast("string")).alias("chrom"),
        ((F.col("o_orderkey") * 13) % 100000).alias("start"),
        (((F.col("o_orderkey") * 13) % 100000) + 600).alias("end"),
    )
    # auto-derived bin width (derive_bin_size): the result is width-
    # invariant, so the oracle stays exact while the driver certifies the
    # auto path; cnv_matrix keeps a pinned width to cover the other path.
    j = interval_join(
        genes, segs, bin_size="auto", min_overlap_frac=0.5,
        left_prefix="g_", right_prefix="s_",
    )
    return j.select(
        F.col("g_gene_id").alias("gene_id"),
        F.col("s_seg_id").alias("seg_id"),
        F.col("overlap_bp").cast("long").alias("overlap_bp"),
    )


SQL_INTERVAL_JOIN = """
WITH genes AS (
  SELECT p_partkey AS gene_id,
         'c' || CAST(p_partkey % 5 AS VARCHAR) AS chrom,
         (p_partkey * 37) % 100000 AS g_start,
         (p_partkey * 37) % 100000 + 200 + p_size * 11 AS g_end
  FROM part
), segs AS (
  SELECT o_orderkey AS seg_id,
         'c' || CAST(o_orderkey % 5 AS VARCHAR) AS chrom,
         (o_orderkey * 13) % 100000 AS s_start,
         (o_orderkey * 13) % 100000 + 600 AS s_end
  FROM orders
)
SELECT gene_id, seg_id,
       CAST(LEAST(g_end, s_end) - GREATEST(g_start, s_start) AS BIGINT) AS overlap_bp
FROM genes JOIN segs USING (chrom)
WHERE LEAST(g_end, s_end) - GREATEST(g_start, s_start) > 0
  AND LEAST(g_end, s_end) - GREATEST(g_start, s_start) >= 0.5 * (g_end - g_start)
"""


def q_cnv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CNV pipeline composition (the cnv_flow DAG shape of
    plans/cnv.py:181 cnv_pipeline, re-expressed over the shared testdata):
    gene-locus window-dedup (gene_list_format keep-longest, cnv.py:376) →
    binned interval join at 50% overlap (bedtools intersect -f 0.5,
    cnv.py:413-436) → per-(gene,sample) window-dedup → GISTIC scalar
    binning (cnv.py:465-481) → fixed-column wide pivot (data_cna,
    cnv.py:668-684). One lazy DAG, one oracle — proves the operators
    compose, not just pass unit checks."""
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    genes_raw = p.select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("g"), (F.col("p_partkey") % 200).cast("string")).alias("gene"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 5).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 37) % 100000).alias("start"),
        (((F.col("p_partkey") * 37) % 100000) + 200 + F.col("p_size") * 11).alias("end"),
    )
    # multi-locus genes: keep the longest transcript per (chrom, gene)
    genes = keep_first(
        genes_raw.withColumn("length", F.col("end") - F.col("start")),
        ["chrom", "gene"],
        [F.col("length").desc(), F.col("start").asc(), F.col("gene_id").asc()],
    ).drop("length")
    segs = o.select(
        F.col("o_orderkey").alias("seg_id"),
        F.concat(F.lit("s"), (F.col("o_custkey") % 10).cast("string")).alias("sample_id"),
        F.concat(F.lit("c"), (F.col("o_orderkey") % 5).cast("string")).alias("chrom"),
        ((F.col("o_orderkey") * 13) % 100000).alias("start"),
        (((F.col("o_orderkey") * 13) % 100000) + 600).alias("end"),
        (((F.col("o_orderkey") * 7) % 600) / F.lit(100.0) - F.lit(3.0)).alias("log2"),
    )
    j = interval_join(
        genes, segs, bin_size=10_000, min_overlap_frac=0.5,
        left_prefix="g_", right_prefix="s_",
    )
    # strongest segment per (gene, sample) cell — the uniqueness the
    # reference's pandas pivot demands (cnv.py:664-666)
    cell = keep_first(
        j.select(
            F.col("g_gene").alias("gene"),
            F.col("s_sample_id").alias("sample_id"),
            F.col("s_seg_id").alias("seg_id"),
            F.col("g_start").alias("g_start"),
            F.col("s_log2").alias("log2"),
        ),
        ["gene", "sample_id"],
        [F.col("log2").desc(), F.col("seg_id").asc(), F.col("g_start").asc()],
    )
    long = cell.select("gene", "sample_id", gistic_call(F.col("log2")).alias("gistic"))
    samples = [f"s{i}" for i in range(10)]
    # keep_first guarantees (gene, sample) uniqueness by construction; the
    # pivot's safety assert would re-run the whole join DAG a second time
    return to_wide_matrix(
        long, index="gene", column="sample_id", value="gistic",
        fill=0, column_values=samples, check_unique=False,
    )


SQL_CNV_MATRIX = """
WITH genes_raw AS (
  SELECT p_partkey AS gene_id,
         'g' || CAST(p_partkey % 200 AS VARCHAR) AS gene,
         'c' || CAST(p_partkey % 5 AS VARCHAR) AS chrom,
         (p_partkey * 37) % 100000 AS g_start,
         (p_partkey * 37) % 100000 + 200 + p_size * 11 AS g_end
  FROM part
), genes AS (
  SELECT gene_id, gene, chrom, g_start, g_end FROM genes_raw
  QUALIFY ROW_NUMBER() OVER (PARTITION BY chrom, gene
                             ORDER BY g_end - g_start DESC, g_start, gene_id) = 1
), segs AS (
  SELECT o_orderkey AS seg_id,
         's' || CAST(o_custkey % 10 AS VARCHAR) AS sample_id,
         'c' || CAST(o_orderkey % 5 AS VARCHAR) AS chrom,
         (o_orderkey * 13) % 100000 AS s_start,
         (o_orderkey * 13) % 100000 + 600 AS s_end,
         ((o_orderkey * 7) % 600) / 100.0 - 3.0 AS log2
  FROM orders
), j AS (
  SELECT gene, sample_id, seg_id, g_start, log2
  FROM genes JOIN segs USING (chrom)
  WHERE LEAST(g_end, s_end) - GREATEST(g_start, s_start) > 0
    AND LEAST(g_end, s_end) - GREATEST(g_start, s_start) >= 0.5 * (g_end - g_start)
), cell AS (
  SELECT gene, sample_id, log2 FROM j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY gene, sample_id
                             ORDER BY log2 DESC, seg_id, g_start) = 1
), long AS (
  SELECT gene, sample_id,
         CASE WHEN log2 > 2.0 THEN 2
              WHEN log2 > 0.3 THEN 1
              WHEN log2 < -1.0 THEN -2
              WHEN log2 < -0.3 THEN -1
              ELSE 0 END AS gistic
  FROM cell
)
SELECT gene,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's0'), 0) AS s0,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's1'), 0) AS s1,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's2'), 0) AS s2,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's3'), 0) AS s3,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's4'), 0) AS s4,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's5'), 0) AS s5,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's6'), 0) AS s6,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's7'), 0) AS s7,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's8'), 0) AS s8,
       COALESCE(MAX(gistic) FILTER (WHERE sample_id = 's9'), 0) AS s9
FROM long GROUP BY gene
"""


def q_scalar_gistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GISTIC binning + log2 ratio scalars (cnv.py:465-481, pedmatch:73-87)
    applied to the events value column."""
    e = load_table(spark, sf_dir, "events")
    v = (F.col("value") - 15.0) / 5.0
    return e.select(
        "event_id",
        gistic_call(v).alias("gistic"),
        copy_number_to_log2(F.col("value")).alias("log2_cn"),
    )


SQL_SCALAR_GISTIC = """
SELECT event_id,
       CASE WHEN (value - 15.0) / 5.0 > 2.0 THEN 2
            WHEN (value - 15.0) / 5.0 > 0.3 THEN 1
            WHEN (value - 15.0) / 5.0 < -1.0 THEN -2
            WHEN (value - 15.0) / 5.0 < -0.3 THEN -1
            ELSE 0 END AS gistic,
       CASE WHEN value > 0 THEN ROUND(LOG2(value / 2), 4) END AS log2_cn
FROM events
"""


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFO-field regex extraction (pedmatch:118-121,203-205) applied to the
    events props JSON-ish string."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'k": (\d+)', 1).cast("long").alias("k_val"),
    )


SQL_REGEX_EXTRACT = """
SELECT event_id, TRY_CAST(regexp_extract(props, 'k": (\\d+)', 1) AS BIGINT) AS k_val
FROM events
"""


def q_somatic_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pedmatch end-to-end as ONE certified plan (plans/pedmatch.py;
    reference workflows/pedmatch-clinical-vcf-workflow.py:704): patient
    pairing with the 1-tissue/1-blood guard (pedmatch:579-602), fusion
    INFO-regex extraction + 2-at-a-time breakend pairing + germline
    subtraction (pedmatch:90-179), and the SNV bcftools chain — ALT
    explode (norm -m -any), tumor/normal full-outer merge by variant
    identity (merge -m id), FORMAT unpacking and the compound somatic
    predicate (pedmatch:311-464) — over the deterministic synthetic
    cohort of registry/_synth_pedmatch.py (VCF-shaped strings with INFO
    fields and 9-slot FORMAT payloads, shared with
    ``q_somatic_calls_bucketed``). The oracle derives the expected
    survivors directly from the seed arithmetic — agreement certifies
    the entire string-build -> parse -> pair -> merge -> gate chain."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        fusion_germline_subtract,
        fusion_prep,
        pair_patients,
        snv_somatic,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry._synth_pedmatch import (
        pedmatch_fusion_vcf,
        pedmatch_manifest,
        pedmatch_snv_vcf,
        somatic_summary,
    )

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    # pairs is consumed FOUR times (tumor broadcast, normal broadcast,
    # fusion scope, germline subtract) and its manifest lineage fans a
    # distinct-over-customer subtree out ~9x per reference; fusions is
    # consumed twice (tumor join + normal projection). Persisting both
    # tiny frames collapses the analyzed plan from ~1,900 lines / 84
    # Exchange nodes to the single derivation per frame (r18, guide
    # §2.4) — at 100 TB each re-derivation is a full manifest/SV pass.
    pairs = pair_patients(pedmatch_manifest(spark, sf_dir)).persist()
    pairs.count()  # eager: four consumers' broadcast builds race a lazy
    # cache, each recomputing the manifest subtree it exists to share (r18)
    somatic = snv_somatic(pedmatch_snv_vcf(spark, sf_dir), pairs)
    fusions = fusion_prep(pedmatch_fusion_vcf(spark, sf_dir)).persist()
    fusions.count()
    kept = fusion_germline_subtract(fusions, pairs)
    return _with_caches(somatic_summary(somatic, kept), [pairs, fusions])


SQL_SOMATIC_CALLS = """
WITH o AS (
  -- norm -d exact (r17 pin): duplicate (orderkey, participant) rows mint
  -- bit-identical variant records, which both engines collapse before
  -- the merge/pairing (plans/pedmatch.py keep_first over the merge keys;
  -- dropDuplicates before breakend pairing)
  SELECT DISTINCT o_orderkey, o_custkey % 20 AS p FROM orders
), snv AS (
  SELECT p,
         CAST(COUNT(*) AS BIGINT) AS n_somatic,
         CAST(SUM((o_orderkey * 37) % 1000000) AS BIGINT) AS sum_pos
  FROM o
  WHERE p <> 0                     -- participant 0: pairing guard
    AND o_orderkey % 3 = 0         -- paired normal exists (ALT aligns)
    AND o_orderkey % 40 >= 10      -- t_depth = 10 + k%40 >= 20
    AND o_orderkey % 20 >= 5       -- tumor_af = 0.(k%20) >= 0.05
    AND o_orderkey % 30 >= 3       -- n_depth = 12 + k%30 >= 15
    AND o_orderkey % 4 <= 2        -- normal_af in {0.00,0.01,0.02}
    AND o_orderkey % 5 <> 0        -- tumor FILTER = PASS
    AND o_orderkey % 17 <> 0       -- tumor_gt <> 0/0
    AND o_orderkey % 11 <> 0       -- INFO has no SVTYPE
    AND o_orderkey % 2 = 0         -- normal_gt 0/0 <> tumor_gt 0/1
  GROUP BY 1
), fus AS (
  SELECT p,
         CAST(COUNT(*) AS BIGINT) AS n_fusions,
         CAST(MAX((o_orderkey + 2) % 97) AS INT) AS max_read_count
  FROM o
  WHERE p <> 0                     -- pairing guard again
    AND o_orderkey % 13 = 0        -- has a fusion (breakends 1,2 pair;
                                   -- the k%39 third breakend drops)
    AND o_orderkey % 26 <> 0       -- normal twin subtracts these
  GROUP BY 1
)
SELECT 'P' || COALESCE(fus.p, snv.p) AS participant_id,
       COALESCE(n_fusions, 0) AS n_fusions,
       COALESCE(max_read_count, 0) AS max_read_count,
       COALESCE(n_somatic, 0) AS n_somatic,
       COALESCE(sum_pos, 0) AS sum_pos
FROM fus FULL OUTER JOIN snv ON fus.p = snv.p
"""
