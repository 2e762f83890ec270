"""Round-11 end-to-end flow faces (r10 verdict tasks 3 and 4).

Two of the four reference flows were certified end-to-end before this
round (``somatic_calls``, ``cnv_matrix``); these faces close the other
two. Each runs the REAL plan functions over deterministic VCF/MAF-shaped
frames derived from ``orders`` modular arithmetic, so the DuckDB oracle
can recompute every stage from the seed arithmetic — agreement certifies
the whole composition, not the pieces.

``clinical_merge_flow``: the mci clinical variant merge
(plans/clinical_merge.py; reference workflows/
mci_clinical_variant_merge.py:302) — prep-filter (semi-join + the four
somatic-test gates), provider annotation (the LookupAnnotator contract:
matched rows annotate, unmatched rows FAIL and are dropped by the
completeness filter), dedup-with-preference-to-clinical, the ``.0``
strip normalization, and the merge-stats log invariant (mci:294) emitted
as literal columns so the oracle re-derives them.

``maf_reconcile``: the vcf_anno reconciliation tail
(plans/vcf_anno.py concat_maf_check; reference workflows/
vcf-annotation-workflow.py:400-483) — union-concat of per-shard MAFs,
the per-file line ledger vs concat counts (wc -l parity), the FAILED
annotation quarantine with the KI2* contig exemption, the null/empty
barcode cleanout, and the rerun routing, summarized per manifest sample.
"""

from ._common import *  # noqa: F401,F403

_VC = ("Missense_Mutation", "Nonsense_Mutation", "Frame_Shift_Del")
_SIG = ("Pathogenic", "Likely Pathogenic", "VUS", "Not Reported")
_ACGT = ("A", "C", "G", "T")


def _clin_inputs(spark: SparkSession, sf_dir: str):
    """Deterministic megaMAF / clinical-sheet / annotation-lookup triple
    from orders arithmetic. Start positions are DOUBLE with exact
    integer values — the reference's pandas float artifact the merge's
    strip_dot_zero normalization exists to fix — and stay < 1e7 at every
    shipped SF so Spark's double→string cast never goes scientific."""
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")

    maf = o.filter(k % 4 < 3).select(
        F.concat(F.lit("S"), c % 50).alias("Tumor_Sample_Barcode"),
        F.concat(F.lit("G"), k % 200).alias("Hugo_Symbol"),
        (k % 22 + 1).cast("string").alias("Chromosome"),
        (k * 10).cast("double").alias("Start_Position"),
        (k * 10 + 10).cast("double").alias("End_Position"),
        F.element_at(
            F.array(*[F.lit(v) for v in _VC]), (k % 3 + 1).cast("int")
        ).alias("Variant_Classification"),
        F.concat(F.lit("p."), k % 97).alias("HGVSp_Short"),
        F.when(k % 11 == 0, F.lit(None).cast("double"))
        .otherwise((k % 999).cast("double"))
        .alias("Entrez_Gene_Id"),
    )

    clin = o.filter(k % 6 < 2).select(
        F.when(k % 9 == 0, F.lit("ZZ"))
        .otherwise(F.concat(F.lit("S"), c % 50))
        .alias("sample.sample_id"),
        F.concat(F.lit("G"), k % 200).alias("gene_symbol"),
        F.concat(F.lit("NM_"), k).alias("transcript"),
        F.concat(F.lit("chr"), k % 22 + 1).alias("chromosome"),
        F.concat(F.lit("g."), k).alias("hgvs_genome"),
        F.concat(F.lit("c."), k % 300).alias("hgvs_coding"),
        F.concat(F.lit("p."), k % 97).alias("hgvs_protein"),
        F.when(k % 10 == 9, F.lit("Other"))
        .otherwise(F.lit("AMP/ASCO/CAP"))
        .alias("reported_significance_system"),
        F.element_at(
            F.array(*[F.lit(v) for v in _SIG]), (k % 4 + 1).cast("int")
        ).alias("reported_significance"),
        F.when(k % 3 == 2, F.lit("Germline"))
        .otherwise(F.lit("Somatic"))
        .alias("genomic_source_category"),
        F.when(k % 15 == 14, F.lit("Absent"))
        .otherwise(F.lit("Present"))
        .alias("status"),
        F.when(k % 21 == 20, F.lit("Panel"))
        .otherwise(F.lit("Somatic Disease/Germline Comparator Exome"))
        .alias("test"),
    )

    start = F.when(k % 2 == 0, k * 10).otherwise(k * 10 + 1)
    lookup = o.filter((k % 6 < 2) & (k % 13 != 0)).select(
        F.concat(k % 22 + 1, F.lit(":g."), k).alias("query"),
        start.alias("start"),
        (start + 10).alias("end"),
        F.lit("SNP").alias("variant_type"),
        F.element_at(
            F.array(*[F.lit(v) for v in _ACGT]), (k % 4 + 1).cast("int")
        ).alias("reference_allele"),
        F.element_at(
            F.array(*[F.lit(v) for v in _ACGT]), ((k + 1) % 4 + 1).cast("int")
        ).alias("variant_allele"),
        F.concat(F.lit("p."), k % 97).alias("hgvs_short"),
        F.element_at(
            F.array(*[F.lit(v) for v in _VC]), (k % 3 + 1).cast("int")
        ).alias("variant_classification"),
    )
    return maf, clin, lookup


def q_clinical_merge_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mci clinical merge end-to-end as ONE certified plan
    (plans/clinical_merge.py; mci_clinical_variant_merge.py:302):
    clin_file_prep's broadcast semi-join against the megaMAF's barcodes
    plus the four somatic-test gates, LookupAnnotator provider
    annotation (k % 13 == 0 rows have no lookup row → FAILED → dropped
    by the completeness filter), union + dedup-with-preference-to-
    clinical over the 7-column MAF identity (clinical rows beat MAF rows
    via the Not-Reported sort key; even-k clinical rows collide with
    their MAF twin, odd-k rows add uniquely), and the ``.0``-strip
    output normalization — summarized per sample with the merge-stats
    log invariant (mci:294) attached as literal columns, which the
    oracle re-derives from scratch."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.annotation import (
        LookupAnnotator,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        annotate_clinical_variants,
        clin_file_prep,
        merge_clinical_variants_to_maf,
    )

    maf, clin, lookup = _clin_inputs(spark, sf_dir)
    prepped = clin_file_prep(
        clin,
        maf.select("Tumor_Sample_Barcode"),
        reference_genome="GRCh38",
    )
    anno = annotate_clinical_variants(prepped, LookupAnnotator(lookup, ["query"]))
    deduped, stats = merge_clinical_variants_to_maf(maf, anno)
    out = deduped.groupBy("Tumor_Sample_Barcode").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.sum(
            F.when(F.col("`Reported.Significance`") != "Not Reported", 1)
            .otherwise(0)
        ).alias("n_reported"),
        F.sum(F.col("Start_Position").cast("bigint")).alias("sum_start"),
        F.sum(
            F.when(F.col("Entrez_Gene_Id") != "", 1).otherwise(0)
        ).alias("n_entrez"),
    )
    for name in ("raw_maf_rows", "merged_rows", "clin_deduped",
                 "clin_added_uniquely"):
        out = out.withColumn(name, F.lit(stats[name]).cast("bigint"))
    # propagate the merge's checkpoint handle past the summary agg (r18:
    # the wrap dropped it — one checkpoint RDD leaked per bench rep)
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    return _with_caches(out, getattr(deduped, "_spark_graft_caches", []))


SQL_CLINICAL_MERGE_FLOW = """
WITH maf AS (
  SELECT 'S' || CAST(o_custkey % 50 AS VARCHAR) AS barcode,
         'G' || CAST(o_orderkey % 200 AS VARCHAR) AS hugo,
         CAST(o_orderkey % 22 + 1 AS VARCHAR) AS chrom,
         CAST(o_orderkey * 10 AS DOUBLE) AS start_pos,
         CAST(o_orderkey * 10 + 10 AS DOUBLE) AS end_pos,
         CASE o_orderkey % 3 WHEN 0 THEN 'Missense_Mutation'
              WHEN 1 THEN 'Nonsense_Mutation'
              ELSE 'Frame_Shift_Del' END AS vc,
         'p.' || CAST(o_orderkey % 97 AS VARCHAR) AS hgvsp,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE CAST(o_orderkey % 999 AS DOUBLE) END AS entrez
  FROM orders WHERE o_orderkey % 4 < 3
), clin AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 9 = 0 THEN 'ZZ'
              ELSE 'S' || CAST(o_custkey % 50 AS VARCHAR) END AS sample_id,
         CASE o_orderkey % 4 WHEN 0 THEN 'Pathogenic'
              WHEN 1 THEN 'Likely Pathogenic'
              WHEN 2 THEN 'VUS'
              ELSE 'Not Reported' END AS sig
  FROM orders
  WHERE o_orderkey % 6 < 2
    AND o_orderkey % 3 <> 2              -- genomic_source_category Somatic
    AND o_orderkey % 15 <> 14            -- status Present
    AND o_orderkey % 21 <> 20            -- test somatic exome
    AND o_orderkey % 10 <> 9             -- significance system AMP/ASCO/CAP
), prep AS (
  SELECT * FROM clin
  WHERE EXISTS (SELECT 1 FROM maf m WHERE m.barcode = clin.sample_id)
), anno AS (
  -- LookupAnnotator: k % 13 = 0 rows miss the lookup, FAIL, and are
  -- dropped by the completeness filter; matched rows take the lookup's
  -- derived-from-k annotation columns
  SELECT sample_id AS barcode,
         'G' || CAST(k % 200 AS VARCHAR) AS hugo,
         CAST(k % 22 + 1 AS VARCHAR) AS chrom,
         CAST(CASE WHEN k % 2 = 0 THEN k * 10 ELSE k * 10 + 1 END AS DOUBLE)
             AS start_pos,
         CAST(CASE WHEN k % 2 = 0 THEN k * 10 ELSE k * 10 + 1 END + 10
              AS DOUBLE) AS end_pos,
         CASE k % 3 WHEN 0 THEN 'Missense_Mutation'
              WHEN 1 THEN 'Nonsense_Mutation'
              ELSE 'Frame_Shift_Del' END AS vc,
         'p.' || CAST(k % 97 AS VARCHAR) AS hgvsp,
         CAST(NULL AS DOUBLE) AS entrez,
         sig
  FROM prep WHERE k % 13 <> 0
), unioned AS (
  SELECT barcode, hugo, chrom, start_pos, end_pos, vc, hgvsp, entrez,
         'Not Reported' AS sig_sys, 'Not Reported' AS sig, 0 AS src
  FROM maf
  UNION ALL
  SELECT barcode, hugo, chrom, start_pos, end_pos, vc, hgvsp, entrez,
         'AMP/ASCO/CAP', sig, 1
  FROM anno
), dedup AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY barcode, hugo, chrom, start_pos, end_pos, vc, hgvsp
    ORDER BY CASE WHEN sig_sys = 'Not Reported' OR sig_sys IS NULL
                  THEN 1 ELSE 0 END,
             CASE WHEN sig = 'Not Reported' OR sig IS NULL
                  THEN 1 ELSE 0 END,
             src
  ) AS rn FROM unioned
), stats AS (
  SELECT (SELECT COUNT(*) FROM unioned WHERE src = 0) AS maf_rows,
         (SELECT COUNT(*) FROM unioned WHERE src = 1) AS clin_rows,
         (SELECT COUNT(*) FROM dedup WHERE rn = 1) AS dedup_rows
)
SELECT barcode AS "Tumor_Sample_Barcode",
       COUNT(*) AS n_variants,
       CAST(SUM(CASE WHEN sig <> 'Not Reported' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_reported,
       CAST(SUM(CAST(NULLIF(REPLACE(CAST(start_pos AS VARCHAR), '.0', ''),
                            '') AS BIGINT)) AS BIGINT) AS sum_start,
       CAST(SUM(CASE WHEN COALESCE(REPLACE(CAST(entrez AS VARCHAR), '.0',
                                           ''), '') <> '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_entrez,
       (SELECT maf_rows FROM stats) AS raw_maf_rows,
       (SELECT dedup_rows FROM stats) AS merged_rows,
       (SELECT clin_rows - (dedup_rows - maf_rows) FROM stats)
           AS clin_deduped,
       (SELECT dedup_rows - maf_rows FROM stats) AS clin_added_uniquely
FROM dedup WHERE rn = 1
GROUP BY barcode
"""

def q_maf_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vcf_anno reconciliation tail end-to-end as ONE certified plan
    (plans/vcf_anno.py per_file_counts + concat_maf_check;
    vcf-annotation-workflow.py:400-483): per-shard MAF rows union-concat
    into the study MAF (with k % 41 == 0 rows lost in concat — the
    failure the wc-l ledger exists to catch), the manifest-joined line
    ledger (individual vs concat counts, NULL-safe mismatch — files with
    misformatted NULL/'' barcodes mismatch inherently because the
    barcode grouping drops those rows), the FAILED-annotation quarantine
    with the KI2* contig exemption (k % 34 rows sit on KI270713.1, a
    strict subset of the k % 17 FAILED rows), the misformatted-barcode
    cleanout, and the rerun routing — summarized per manifest sample
    with the cleaned-MAF per-sample row counts and the global
    misformatted count broadcast onto every row."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.vcf_anno import (
        concat_maf_check,
        per_file_counts,
    )

    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    i = c % 40
    suffix = F.when(i % 2 == 0, F.lit(".vcf")).otherwise(F.lit(".vcf.gz"))

    rows_all = o.select(
        F.concat(F.lit("f"), i, suffix).alias("file_name"),
        F.when(k % 97 == 0, F.lit(""))
        .when(k % 89 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("S"), i))
        .alias("Tumor_Sample_Barcode"),
        F.when(k % 17 == 0, F.lit("FAILED"))
        .otherwise(F.lit("SUCCESS"))
        .alias("Annotation_Status"),
        F.when(k % 34 == 0, F.lit("KI270713.1"))
        .otherwise((k % 22 + 1).cast("string"))
        .alias("Chromosome"),
        F.concat(F.lit("G"), k % 200).alias("Hugo_Symbol"),
        k.alias("_k"),
    )
    # union-concat of the even/odd shards (the reference's cat of
    # per-sample annotated MAFs), with the k % 41 rows lost in concat
    concat_maf = (
        rows_all.filter(F.col("_k") % 2 == 0)
        .unionByName(rows_all.filter(F.col("_k") % 2 == 1))
        .filter(F.col("_k") % 41 != 0)
        .drop("_k")
    )
    pfc = per_file_counts(rows_all.drop("_k"))

    si = o.select(i.alias("i")).distinct()
    manifest = si.select(
        F.concat(F.lit("S"), F.col("i")).alias("sample"),
        F.concat(
            F.lit("http://data.example/in/f"),
            F.col("i"),
            F.when(F.col("i") % 2 == 0, F.lit(".vcf")).otherwise(
                F.lit(".vcf.gz")
            ),
        ).alias("file_url"),
    )

    chk = concat_maf_check(concat_maf, manifest, pfc)
    failed = chk["failed"].withColumnRenamed(
        "Tumor_Sample_Barcode", "_fb"
    )
    cleaned_counts = (
        chk["cleaned_maf"]
        .groupBy("Tumor_Sample_Barcode")
        .agg(F.count(F.lit(1)).alias("_nc"))
        .withColumnRenamed("Tumor_Sample_Barcode", "_cb")
    )
    mis = chk["misformatted"].agg(
        F.count(F.lit(1)).alias("n_misformatted")
    )
    ledger = chk["ledger"]
    out = (
        ledger.join(failed, ledger["sample"] == failed["_fb"], "left")
        .join(cleaned_counts, ledger["sample"] == cleaned_counts["_cb"], "left")
        .select(
            "sample",
            F.col("line_count_individual").alias("n_individual"),
            F.col("line_count_concat").alias("n_concat"),
            F.col("mismatch").cast("int").alias("mismatch"),
            F.coalesce(F.col("failed_annotations"), F.lit(0)).alias(
                "n_failed"
            ),
            (
                F.col("mismatch")
                | (F.coalesce(F.col("failed_annotations"), F.lit(0)) > 0)
            )
            .cast("int")
            .alias("is_rerun"),
            F.coalesce(F.col("_nc"), F.lit(0)).alias("n_cleaned"),
        )
        .crossJoin(F.broadcast(mis))
    )
    return out


SQL_MAF_RECONCILE = """
WITH rows_all AS (
  SELECT o_orderkey AS k, o_custkey % 40 AS i,
         CASE WHEN o_orderkey % 97 = 0 THEN ''
              WHEN o_orderkey % 89 = 0 THEN NULL
              ELSE 'S' || CAST(o_custkey % 40 AS VARCHAR) END AS barcode,
         CASE WHEN o_orderkey % 17 = 0 THEN 'FAILED'
              ELSE 'SUCCESS' END AS status,
         CASE WHEN o_orderkey % 34 = 0 THEN 'KI270713.1'
              ELSE CAST(o_orderkey % 22 + 1 AS VARCHAR) END AS chrom
  FROM orders
), concat_maf AS (
  SELECT * FROM rows_all WHERE k % 41 <> 0
), ind AS (
  SELECT i, COUNT(*) AS n_individual FROM rows_all GROUP BY i
), conc AS (
  SELECT barcode, COUNT(*) AS n_concat FROM concat_maf GROUP BY barcode
), failed AS (
  SELECT barcode, COUNT(*) AS n_failed FROM concat_maf
  WHERE status = 'FAILED' AND chrom NOT LIKE '%KI2%'
  GROUP BY barcode
), samples AS (
  SELECT DISTINCT o_custkey % 40 AS i FROM orders
), led AS (
  SELECT 'S' || CAST(s.i AS VARCHAR) AS sample,
         ind.n_individual,
         conc.n_concat,
         (ind.n_individual IS DISTINCT FROM conc.n_concat) AS mismatch,
         COALESCE(f.n_failed, 0) AS n_failed
  FROM samples s
  LEFT JOIN ind ON ind.i = s.i
  LEFT JOIN conc ON conc.barcode = 'S' || CAST(s.i AS VARCHAR)
  LEFT JOIN failed f ON f.barcode = 'S' || CAST(s.i AS VARCHAR)
), cleaned AS (
  SELECT barcode, COUNT(*) AS n_cleaned FROM concat_maf c
  WHERE barcode IS NOT NULL AND barcode <> ''
    AND NOT EXISTS (SELECT 1 FROM led
                    WHERE led.sample = c.barcode
                      AND (led.mismatch OR led.n_failed > 0))
  GROUP BY barcode
), mis AS (
  SELECT COUNT(*) AS n_misformatted FROM concat_maf
  WHERE barcode IS NULL OR barcode = ''
)
SELECT led.sample,
       led.n_individual,
       led.n_concat,
       CAST(led.mismatch AS INTEGER) AS mismatch,
       led.n_failed,
       CAST(led.mismatch OR led.n_failed > 0 AS INTEGER) AS is_rerun,
       COALESCE(cl.n_cleaned, 0) AS n_cleaned,
       (SELECT n_misformatted FROM mis) AS n_misformatted
FROM led LEFT JOIN cleaned cl ON cl.barcode = led.sample
"""
