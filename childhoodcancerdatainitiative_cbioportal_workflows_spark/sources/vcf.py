"""VCF reader.

The reference reads VCFs with ``pd.read_csv(comment='#', header=None)`` and
positional columns (``vcf_anno.py:278-290``, ``pedmatch:52-66``). Spark read:
``comment='#'`` csv with a declared schema. ``##`` meta lines and the
``#CHROM`` header are both dropped by the comment option; per-sample FORMAT
columns keep their sample name when the caller passes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VCF_FIXED_COLUMNS = ["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]


def vcf_schema(sample_cols: list[str] | None = None, with_format: bool = False) -> T.StructType:
    fields = [
        T.StructField("CHROM", T.StringType()),
        T.StructField("POS", T.LongType()),
        T.StructField("ID", T.StringType()),
        T.StructField("REF", T.StringType()),
        T.StructField("ALT", T.StringType()),
        T.StructField("QUAL", T.StringType()),
        T.StructField("FILTER", T.StringType()),
        T.StructField("INFO", T.StringType()),
    ]
    if with_format or sample_cols:
        fields.append(T.StructField("FORMAT", T.StringType()))
    for s in sample_cols or []:
        fields.append(T.StructField(s, T.StringType()))
    return T.StructType(fields)


def read_vcf(
    spark: SparkSession,
    path: str | list[str],
    sample_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed VCF scan; gzip transparent. ``sample_cols`` names the
    per-sample FORMAT-encoded columns (one per sample in column order)."""
    schema = vcf_schema(sample_cols, with_format=bool(sample_cols))
    return (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .option("header", "false")
        .schema(schema)
        .csv(path)
    )


def read_vcf_meta_lines(spark: SparkSession, path: str) -> list[str]:
    """The ``##`` meta header lines (the reference rewrites these by hand
    when emitting VCFs, pedmatch:329-351). Small, driver-collected."""
    txt = spark.read.text(path)
    return [r.value for r in txt.filter(txt.value.startswith("##")).collect()]
