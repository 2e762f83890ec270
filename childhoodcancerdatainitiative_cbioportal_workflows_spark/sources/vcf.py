"""VCF reader.

The reference reads VCFs with ``pd.read_csv(comment='#', header=None)`` and
positional columns (``vcf_anno.py:278-290``, ``pedmatch:52-66``). Spark read:
``comment='#'`` csv with a declared schema. ``##`` meta lines and the
``#CHROM`` header are both dropped by the comment option; per-sample FORMAT
columns keep their sample name when the caller passes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
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


# the FT FORMAT declaration the reference splices into the meta block
# (pedmatch-clinical-vcf-workflow.py:331)
FT_META_LINE = (
    '##FORMAT=<ID=FT,Number=1,Type=String,'
    'Description="Filter status of the variant">'
)


def preserve_filter_as_ft(vcf: DataFrame, sample_cols: list[str]) -> DataFrame:
    """FILTER -> per-sample FT FORMAT field
    (``pedmatch-clinical-vcf-workflow.py:326-351``): append ``:FT`` to the
    FORMAT spec and ``:<FILTER>`` to each sample column, so the original
    per-variant filter survives a bcftools-merge-style combination. Callers
    add :data:`FT_META_LINE` to the meta lines they pass to
    :func:`write_vcf` (the reference splices it blindly at line 100; we
    append to the ``##`` block — same declaration, robust position)."""
    out = vcf.withColumn("FORMAT", F.concat_ws(":", F.col("FORMAT"), F.lit("FT")))
    for s in sample_cols:
        out = out.withColumn(s, F.concat_ws(":", F.col(f"`{s}`"), F.col("FILTER")))
    return out


def write_vcf(
    df: DataFrame,
    path: str,
    meta_lines: list[str],
    columns: list[str] | None = None,
    na_rep: str = ".",
) -> str:
    """VCF sink: ``##`` meta lines + ``#CHROM...`` header + tab-separated
    records, one file (the contract every VCF consumer — tabix, bcftools,
    IGV — expects). The read side drops both header forms via
    ``comment='#'``, so emission re-attaches them here; records are written
    distributed then stitched under the header. ``.gz`` paths emit the
    header as its own gzip member (member concatenation is valid gzip)."""
    import glob
    import gzip
    import os
    import shutil
    import tempfile

    cols = columns or df.columns
    out = df.select(*[F.col(f"`{c}`").cast("string") for c in cols]).na.fill(na_rep)
    header_txt = "\n".join([*meta_lines, "#" + "\t".join(cols)]) + "\n"
    gz = path.endswith(".gz")
    tmp = tempfile.mkdtemp(prefix="vcf_sink_")
    staged = os.path.join(tmp, "out")
    writer = (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "false")
        .option("emptyValue", na_rep)
        .option("quote", "\u0000")  # QUOTE_NONE, like the TSV contract
    )
    if gz:
        writer = writer.option("compression", "gzip")
    writer.csv(staged)
    part = glob.glob(os.path.join(staged, "part-*"))[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as dst:
        dst.write(
            gzip.compress(header_txt.encode()) if gz else header_txt.encode()
        )
        with open(part, "rb") as src:
            shutil.copyfileobj(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return path
