"""Input-manifest audit: checksum + completeness verification.

The reference md5-verifies every downloaded file against the manifest
(``workflows/cnv.py:57-77,124-133``; ``workflows/vcf_anno.py:41-61,117-125``)
and compares downloaded-file counts to manifest counts (``cnv.py:560-563``).
Engine shape: one distributed ``binaryFile`` scan hashes all inputs
(``F.md5`` over the content column, JVM-side), outer-joined to the manifest —
missing files, extra files and checksum mismatches fall out of one plan.

Scale note: binaryFile loads each file's content as one row — right for the
manifest-sized genomic inputs this audits (MB-scale VCF/JSON). For
multi-GB objects, audit via the object store's own checksums instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.genomics import basename


def audit_files(
    spark: SparkSession,
    manifest: DataFrame,
    data_dir: str,
    file_col: str = "file_name",
    md5_col: str = "md5sum",
) -> DataFrame:
    """Per-file audit report: (file_name, expected_md5, actual_md5, status)
    with status in {OK, MD5_MISMATCH, MISSING, UNEXPECTED}."""
    actual = (
        spark.read.format("binaryFile")
        .load(f"{data_dir}/*")
        .select(
            basename(F.col("path")).alias(file_col),
            F.md5(F.col("content")).alias("actual_md5"),
        )
    )
    expected = manifest.select(
        F.col(file_col), F.col(md5_col).alias("expected_md5")
    )
    j = expected.join(actual, file_col, "full_outer")
    status = (
        F.when(F.col("expected_md5").isNull(), F.lit("UNEXPECTED"))
        .when(F.col("actual_md5").isNull(), F.lit("MISSING"))
        .when(F.col("expected_md5") != F.col("actual_md5"), F.lit("MD5_MISMATCH"))
        .otherwise(F.lit("OK"))
    )
    return j.withColumn("status", status)


def audit_summary(report: DataFrame) -> DataFrame:
    """Counts per status — the reference's 'downloaded == manifest count'
    gate (cnv.py:560-563) is satisfied iff every row is OK."""
    return report.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
