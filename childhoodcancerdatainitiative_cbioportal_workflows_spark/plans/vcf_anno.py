"""VCF -> annotated MAF pipeline (reference: ``workflows/vcf_anno.py``
vcf_anno_flow, vcf_anno.py:490).

The reference loops per file: gunzip -> pandas read -> PASS filter ->
4-column projection -> java annotator subprocess -> barcode overwrite, then
grep-concats MAFs and reconciles a wc-l line ledger. Here all VCFs are one
distributed scan keyed by ``input_file_name()``; annotation is a provider
(plans/annotation.py); concat is ``unionByName`` by construction; and the
ledger check becomes three aggregation-joins kept as a first-class
reconciliation output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.genomics import basename, end_position, strip_chr
from ..sources.vcf import read_vcf


def prepare_vcf(vcf: DataFrame) -> DataFrame:
    """PASS filter, 4-col projection, chr strip, MAF-style rename,
    End_Position (vcf_anno.py:278-303)."""
    out = vcf.filter(F.col("FILTER") == "PASS").select(
        strip_chr(F.col("CHROM")).alias("Chromosome"),
        F.col("POS").alias("Start_Position"),
        F.col("REF").alias("Reference_Allele"),
        F.col("ALT").alias("Tumor_Seq_Allele1"),
    )
    return out.withColumn(
        "End_Position",
        end_position(F.col("Start_Position"), F.col("Reference_Allele")),
    )


def annotate_manifest_vcfs(
    spark: SparkSession,
    manifest: DataFrame,
    vcf_dir: str,
    annotator,
) -> DataFrame:
    """All manifest VCFs -> one annotated MAF DataFrame.

    The per-file loop (vcf_anno.py:631-639) becomes a single scan over all
    files with ``input_file_name()``; the manifest join stamps each row's
    ``Tumor_Sample_Barcode`` (the reference overwrites it the same way,
    vcf_anno.py:319,341)."""
    files = [r.file_name for r in manifest.select("file_name").collect()]
    paths = [f"{vcf_dir}/{f}" for f in files]
    vcf = read_vcf(spark, paths).withColumn(
        "file_name", basename(F.input_file_name())
    )
    # prepare_vcf's projection, keeping file_name for the barcode stamp
    prepared = vcf.filter(F.col("FILTER") == "PASS").select(
        strip_chr(F.col("CHROM")).alias("Chromosome"),
        F.col("POS").alias("Start_Position"),
        F.col("REF").alias("Reference_Allele"),
        F.col("ALT").alias("Tumor_Seq_Allele1"),
        "file_name",
    )
    prepared = prepared.withColumn(
        "End_Position",
        end_position(F.col("Start_Position"), F.col("Reference_Allele")),
    )
    barcodes = manifest.select(
        F.col("file_name"), F.col("sample").alias("Tumor_Sample_Barcode")
    )
    stamped = prepared.join(F.broadcast(barcodes), "file_name", "left")
    return annotator(stamped)


def concat_mafs(spark: SparkSession, maf_paths: list[str]) -> DataFrame:
    """concat_mafs (vcf_anno.py:350-398): the grep-based header-skipping
    concat becomes one comment-skipping scan over all MAF files +
    input_file_name tagging. '#' comment lines and per-file header rows are
    dropped by the reader; unionByName semantics come from the shared
    schema of a single multi-path scan."""
    first = (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("comment", "#")
        .option("inferSchema", "false")
        .csv(maf_paths)
    )
    return first.withColumn("file_name", basename(F.input_file_name()))


def per_file_counts(annotated_maf: DataFrame) -> DataFrame:
    """The wc-l ledger equivalent (vcf_anno.py:365-395): per-file MAF row
    counts, with file names rewritten to the annotated-MAF convention so
    they join the manifest mapping in concat_maf_check."""
    return (
        annotated_maf.groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("line_count"))
        .withColumn(
            "file_name",
            F.regexp_replace("file_name", r"\.vcf(\.gz)?$", "_annotated.maf"),
        )
    )


def concat_maf_check(
    concat_maf: DataFrame,
    manifest: DataFrame,
    per_file_counts: DataFrame,
) -> dict[str, DataFrame]:
    """The reconciliation surface of vcf_anno.py:400-483.

    Inputs: the concatenated MAF; the manifest (``sample``, ``file_url``);
    per-file MAF row counts (``file_name``, ``line_count``) — the wc-l
    ledger equivalent, computed by the caller from the individual MAFs.

    Returns: ``ledger`` (per-sample expected vs concat counts + mismatch),
    ``failed`` (per-sample FAILED annotation counts, KI2* contigs exempt),
    ``misformatted`` (null/empty barcode rows), ``cleaned_maf`` (rerun +
    misformatted rows removed), ``rerun_manifest``."""
    # manifest file_url -> expected annotated-MAF file name (vcf_anno.py:425)
    # same pattern as per_file_counts — an uncompressed .vcf manifest entry
    # must rewrite identically on both sides or its ledger join misses and
    # the sample is spuriously routed to rerun
    mf = manifest.withColumn(
        "file_name",
        F.regexp_replace(basename(F.col("file_url")), r"\.vcf(\.gz)?$", "_annotated.maf"),
    )
    ledger = mf.join(per_file_counts, "file_name", "left").withColumnRenamed(
        "line_count", "line_count_individual"
    )
    concat_counts = concat_maf.groupBy("Tumor_Sample_Barcode").agg(
        F.count(F.lit(1)).alias("line_count_concat")
    )
    ledger = ledger.join(
        concat_counts,
        ledger["sample"] == concat_counts["Tumor_Sample_Barcode"],
        "left",
    ).drop("Tumor_Sample_Barcode")
    ledger = ledger.withColumn(
        "mismatch",
        ~F.col("line_count_individual").eqNullSafe(F.col("line_count_concat")),
    )

    failed = (
        concat_maf.filter(
            (F.col("Annotation_Status") == "FAILED")
            & ~F.coalesce(F.col("Chromosome").contains("KI2"), F.lit(False))
        )
        .groupBy("Tumor_Sample_Barcode")
        .agg(F.count(F.lit(1)).alias("failed_annotations"))
    )

    misformatted = concat_maf.filter(
        F.col("Tumor_Sample_Barcode").isNull() | (F.col("Tumor_Sample_Barcode") == "")
    )

    rerun_samples = (
        ledger.filter(F.col("mismatch")).select(F.col("sample"))
        .unionByName(failed.select(F.col("Tumor_Sample_Barcode").alias("sample")))
        .distinct()
    )
    cleaned = concat_maf.join(
        F.broadcast(rerun_samples),
        concat_maf["Tumor_Sample_Barcode"] == rerun_samples["sample"],
        "left_anti",
    ).filter(
        F.col("Tumor_Sample_Barcode").isNotNull()
        & (F.col("Tumor_Sample_Barcode") != "")
    )
    rerun_manifest = mf.join(
        F.broadcast(rerun_samples), mf["sample"] == rerun_samples["sample"], "left_semi"
    )
    return {
        "ledger": ledger,
        "failed": failed,
        "misformatted": misformatted,
        "cleaned_maf": cleaned,
        "rerun_manifest": rerun_manifest,
    }
