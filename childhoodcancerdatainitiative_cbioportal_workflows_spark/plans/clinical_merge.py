"""Clinical variant merge pipeline (reference:
``workflows/mci_clinical_variant_merge.py`` clin_anno_merge_flow, mci:302).

Excel prep filter -> API annotation -> merge/dedup into the megaMAF with
preference to clinically-reported rows. The reference's positional
``pd.concat(axis=1)`` of API results (mci:214) disappears: the provider
returns annotation columns from the same mapInPandas batch, so there is no
row-alignment hazard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.genomics import strip_chr_prefix_only, strip_dot_zero
from ..operators.dedup import keep_first

CLIN_PREP_COLS = [
    "sample.sample_id",
    "gene_symbol",
    "transcript",
    "chromosome",
    "hgvs_genome",
    "hgvs_coding",
    "hgvs_protein",
    "reported_significance_system",
    "reported_significance",
]

MAF_DEDUP_KEYS = [
    "Tumor_Sample_Barcode",
    "Hugo_Symbol",
    "Chromosome",
    "Start_Position",
    "End_Position",
    "Variant_Classification",
    "HGVSp_Short",
]


def clin_file_prep(
    clin: DataFrame, maf_samples: DataFrame, reference_genome: str
) -> DataFrame:
    """Filter the genetic_analysis sheet to annotatable somatic SNVs and
    build the API query column (mci:13-49).

    ``maf_samples``: single-column DataFrame of Tumor_Sample_Barcode values
    (the isin filter at mci:27 becomes a broadcast semi-join)."""
    samples = maf_samples.toDF("_maf_sample").distinct()
    out = clin.join(
        F.broadcast(samples),
        clin["`sample.sample_id`"] == samples["_maf_sample"],
        "left_semi",
    )
    out = out.filter(
        (F.col("genomic_source_category") == "Somatic")
        & (F.col("status") == "Present")
        & (F.col("test") == "Somatic Disease/Germline Comparator Exome")
        & (F.col("reported_significance_system") == "AMP/ASCO/CAP")
    )
    # the Excel header 'sample.sample_id' becomes plain 'sample_id' here —
    # dotted names fight Spark's column resolver for no benefit
    out = out.select(
        F.col("`sample.sample_id`").alias("sample_id"),
        *[F.col(c) for c in CLIN_PREP_COLS[1:]],
    )
    out = out.withColumn("chromosome", strip_chr_prefix_only(F.col("chromosome")))
    out = out.withColumn("reference_genome", F.lit(reference_genome))
    return out.withColumn(
        "query", F.concat_ws(":", F.col("chromosome"), F.col("hgvs_genome"))
    )


def annotate_clinical_variants(clin: DataFrame, annotator) -> DataFrame:
    """Annotate via provider, drop failures, rename to MAF columns
    (mci:162-234)."""
    annotated = annotator(clin)
    complete = annotated.filter(
        F.col("start").isNotNull()
        & F.col("end").isNotNull()
        & F.col("variant_type").isNotNull()
        & F.col("reference_allele").isNotNull()
        & F.col("variant_allele").isNotNull()
        & F.col("hgvs_short").isNotNull()
        & F.col("variant_classification").isNotNull()
    )
    return complete.select(
        F.col("sample_id").alias("Tumor_Sample_Barcode"),
        F.col("gene_symbol").alias("Hugo_Symbol"),
        F.col("transcript").alias("RefSeq"),
        F.col("chromosome").alias("Chromosome"),
        F.col("start").alias("Start_Position"),
        F.col("end").alias("End_Position"),
        F.col("reference_allele").alias("Reference_Allele"),
        F.col("variant_allele").alias("Tumor_Seq_Allele2"),
        F.col("variant_classification").alias("Variant_Classification"),
        F.col("variant_type").alias("Variant_Type"),
        F.col("hgvs_short").alias("HGVSp_Short"),
        F.col("reported_significance_system").alias("Reported.Significance System"),
        F.col("reported_significance").alias("Reported.Significance"),
        F.col("reference_genome").alias("NCBI_Build"),
    )


def _not_reported(c: Column) -> Column:
    return ((c == "Not Reported") | c.isNull()).cast("int")


def clin_union(maf_concat: DataFrame, anno_clin_muts: DataFrame) -> DataFrame:
    """The tagged megaMAF ∪ annotated-clinical union the dedup operates
    on (mci:236-262): pandas relied on stable concat order (maf rows
    precede clinical rows); here that order is an explicit ``_src``
    column. Shared by the in-flight merge below and the bucketed ingest
    (plans/clinical_merge_bucketed.py) so both paths dedup the
    byte-identical union."""
    maf = maf_concat
    for c in ("Reported.Significance System", "Reported.Significance"):
        if c not in maf.columns:
            maf = maf.withColumn(c, F.lit("Not Reported"))
    maf = maf.withColumn("_src", F.lit(0))
    clin = anno_clin_muts.withColumn("_src", F.lit(1))
    return maf.unionByName(clin, allowMissingColumns=True)


_DEDUP_PREFERENCE = (
    lambda: [
        _not_reported(F.col("`Reported.Significance System`")).asc(),
        _not_reported(F.col("`Reported.Significance`")).asc(),
        F.col("_src").asc(),
    ]
)


def _finalize_dedup(deduped: DataFrame) -> DataFrame:
    """Output normalization shared by both dedup paths: strip the
    int-as-float ``.0`` artifact exactly as mci:285-289, canonical
    genomic sort."""
    return (
        deduped.withColumn("Entrez_Gene_Id", strip_dot_zero(F.col("Entrez_Gene_Id")))
        .withColumn("Start_Position", strip_dot_zero(F.col("Start_Position")))
        .withColumn("End_Position", strip_dot_zero(F.col("End_Position")))
        .orderBy("Tumor_Sample_Barcode", "Chromosome", "Start_Position")
    )


def dedup_preferring_clinical(unioned: DataFrame) -> DataFrame:
    """Dedup-with-preference on the 7-column MAF identity (mci:263-289):
    reported-significance rows beat Not-Reported ones, clinical (_src=1)
    beats MAF on ties; output normalization strips the int-as-float
    ``.0`` artifact exactly as mci:285-289."""
    deduped = keep_first(unioned, MAF_DEDUP_KEYS, _DEDUP_PREFERENCE()).drop("_src")
    return _finalize_dedup(deduped)


def merge_stats(unioned: DataFrame) -> dict:
    """The reference's mci:294 log-line counts in ONE traversal of the
    union (the naive three .count() calls recompute the tree 3x):
    per-key partial counts, then one global agg — group count == deduped
    rows, per-source sums == pre-dedup side counts. Over a bucketed scan
    the per-key aggregate is exchange-free (the keys ARE the bucket
    keys)."""
    totals = (
        unioned.groupBy(*[F.col(f"`{k}`") for k in MAF_DEDUP_KEYS])
        .agg(
            F.count(F.when(F.col("_src") == 0, 1)).alias("_maf_n"),
            F.count(F.when(F.col("_src") == 1, 1)).alias("_clin_n"),
        )
        .agg(
            F.sum("_maf_n").alias("maf_rows"),
            F.sum("_clin_n").alias("clin_rows"),
            F.count(F.lit(1)).alias("dedup_rows"),
        )
        .first()
    )
    unannotated_rows = totals["maf_rows"]
    clin_rows = totals["clin_rows"]
    concat_rows = totals["dedup_rows"]
    return {
        "raw_maf_rows": unannotated_rows,
        "merged_rows": concat_rows,
        "clin_deduped": clin_rows - (concat_rows - unannotated_rows),
        "clin_added_uniquely": concat_rows - unannotated_rows,
    }


def merge_clinical_variants_to_maf(
    maf_concat: DataFrame, anno_clin_muts: DataFrame
) -> tuple[DataFrame, dict]:
    """Union + dedup-with-preference-to-clinical (mci:236-296). Returns
    (df, stats) where stats carries the reference's log-line counts
    (mci:294).

    ONE traversal of the union (r12 verdict task 3; the r12 shape
    checkpointed the full union and then ran the dedup window AND a
    separate stats groupBy over it — the union-sized block
    materialization was the 15M-row GC noise source in the decade
    probe). The dedup window's partition IS the stats aggregate's
    grouping, so the per-group source counts ride the same Exchange +
    Sort as ``row_number`` (two Window ops, one shuffle): the group
    representative carries (_maf_n, _clin_n), and the mci:294 counts
    reduce to one cheap agg over the DEDUPED frame. What gets
    localCheckpoint-ed is therefore the post-dedup frame — strictly
    smaller than the union — and the union itself streams through the
    window exactly once.

    localCheckpoint (not persist): a persist() here can never be
    released — the caller only receives the derived ``deduped``, and
    unpersisting a derived frame does not drop the parent's CacheManager
    entry, so every merge would leak a session-lifetime cache. The eager
    local checkpoint's blocks live only as long as the returned frame
    references them (ContextCleaner frees them on GC — no catalog entry
    to leak). Tradeoff: executor-local blocks are not fault-tolerant; a
    cluster run that must survive executor loss should set a checkpoint
    dir and use reliable .checkpoint() — or use the bucketed-ingest path
    (plans/clinical_merge_bucketed.py), where the union at rest IS the
    materialization and needs neither."""
    unioned = clin_union(maf_concat, anno_clin_muts)
    wp = Window.partitionBy(*[F.col(f"`{k}`") for k in MAF_DEDUP_KEYS])
    wo = wp.orderBy(*_DEDUP_PREFERENCE())
    kept = (
        unioned.withColumn("_rn", F.row_number().over(wo))
        .withColumn(
            "_maf_n", F.sum(F.when(F.col("_src") == 0, 1).otherwise(0)).over(wp)
        )
        .withColumn(
            "_clin_n", F.sum(F.when(F.col("_src") == 1, 1).otherwise(0)).over(wp)
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    totals = kept.agg(
        F.sum("_maf_n").alias("maf_rows"),
        F.sum("_clin_n").alias("clin_rows"),
        F.count(F.lit(1)).alias("dedup_rows"),
    ).first()
    # deterministic release of the checkpoint blocks (r18): the handle
    # rides the returned plan's cache list so release_plan_caches frees
    # them instead of waiting on async GC — release is terminal (the
    # checkpointed frame cannot recompute), the standard handle contract.
    from ..llm.dedup import _CheckpointHandle, _with_caches

    ck_handle = _CheckpointHandle(kept)
    stats = {
        "raw_maf_rows": totals["maf_rows"],
        "merged_rows": totals["dedup_rows"],
        "clin_deduped": totals["clin_rows"]
        - (totals["dedup_rows"] - totals["maf_rows"]),
        "clin_added_uniquely": totals["dedup_rows"] - totals["maf_rows"],
    }
    deduped = _with_caches(
        _finalize_dedup(kept.drop("_maf_n", "_clin_n", "_src")), [ck_handle]
    )
    return deduped, stats
