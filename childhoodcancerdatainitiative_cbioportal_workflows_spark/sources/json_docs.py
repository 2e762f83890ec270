"""CNV caller JSON documents -> long segment DataFrame.

The reference loads one JSON per sample and loops rows into a dict
(``workflows/cnv.py:198-217``). Here all files are one distributed
``spark.read.json`` with a declared schema (no inference job), then
``explode(segments)`` — the engine's only table-generating op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CNV_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "metadata",
            T.StructType([T.StructField("sample_name", T.StringType())]),
        ),
        T.StructField(
            "segments",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "position",
                            T.StructType(
                                [
                                    T.StructField("chrom", T.StringType()),
                                    T.StructField("start", T.LongType()),
                                    T.StructField("end", T.LongType()),
                                    T.StructField("length", T.LongType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "cnv",
                            T.StructType(
                                [
                                    T.StructField("log2_copy_ratio", T.DoubleType()),
                                    T.StructField("cnv_supporting_points", T.LongType()),
                                    T.StructField("cnv_supporting_reads", T.LongType()),
                                    T.StructField("log2_pval", T.DoubleType()),
                                    T.StructField("log2_copy_ratio_90per_ci_low", T.DoubleType()),
                                    T.StructField("log2_copy_ratio_90per_ci_high", T.DoubleType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def read_cnv_json(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """One row per (sample, segment), mirroring the per-file dict rows of
    cnv.py:198-217: sample_name split on '-' into (participant, sample_id)
    (cnv.py:204-205), positions and cnv stats flattened."""
    raw = spark.read.schema(CNV_JSON_SCHEMA).option("multiLine", "true").json(paths)
    seg = raw.select(
        F.col("metadata.sample_name").alias("sample_name"),
        F.explode("segments").alias("seg"),
    )
    name_parts = F.split(F.col("sample_name"), "-")
    return seg.select(
        name_parts.getItem(0).alias("participant"),
        name_parts.getItem(1).alias("sample_id"),
        F.col("sample_name"),
        F.col("seg.position.chrom").alias("chrom"),
        F.col("seg.position.start").alias("start"),
        F.col("seg.position.end").alias("end"),
        F.col("seg.position.length").alias("length"),
        F.col("seg.cnv.log2_copy_ratio").alias("log2_copy_ratio"),
        F.col("seg.cnv.cnv_supporting_points").alias("cnv_supporting_points"),
        F.col("seg.cnv.cnv_supporting_reads").alias("cnv_supporting_reads"),
        F.col("seg.cnv.log2_pval").alias("log2_pval"),
        F.col("seg.cnv.log2_copy_ratio_90per_ci_low").alias("ci_low"),
        F.col("seg.cnv.log2_copy_ratio_90per_ci_high").alias("ci_high"),
    )
