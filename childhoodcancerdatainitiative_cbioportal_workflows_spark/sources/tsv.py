"""TSV/CSV scan and sink with the reference's file conventions.

Scan side re-expresses pandas ``read_csv`` variants (SURVEY §2.1): tab sep,
optional ``#`` comment skipping (VCF/MAF/GTF), headerless with given names,
transparent ``.gz``. Sink side reproduces ``to_csv(sep='\t', index=False,
quoting=QUOTE_NONE)`` (``cnv.py:284`` et al.): single header, tab sep, no
quoting, fixed column order — the cBioPortal ingestion contract.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    names: list[str] | None = None,
    header: bool | None = None,
    comment: str | None = None,
    sep: str = "\t",
    infer_schema: bool = False,
) -> DataFrame:
    """pandas read_csv equivalents:
    - header row (default): ``pd.read_csv(path, sep='\\t')``
    - ``names=[...]``: headerless with given names (``cnv.py:650``)
    - ``comment='#'``: skip meta lines (``vcf_anno.py:278``)
    gzip transparent via the codec, as with the shelled-out gunzip.

    Pass ``schema`` (see ``core.schemas`` for the format registry) wherever
    the format is known: schema inference is a second full scan of the data
    (2x ingest cost at 100 TB), so it is OPT-IN via ``infer_schema=True``
    and the no-schema default types every column string — mirroring the
    reference's ``dtype=str`` MAF reads."""
    reader = spark.read.option("sep", sep)
    if comment:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
        reader = reader.option("header", str(bool(header)).lower())
    elif names is not None:
        reader = reader.option("header", "false").option(
            "inferSchema", str(infer_schema).lower()
        )
    else:
        reader = reader.option("header", "true").option(
            "inferSchema", str(infer_schema).lower()
        )
    df = reader.csv(path)
    if names is not None and schema is None:
        df = df.toDF(*names)
    return df


def read_csv_file(spark: SparkSession, path: str, **kw) -> DataFrame:
    """Comma-separated variant (vcf_anno manifest is CSV, vcf_anno.py:535)."""
    return read_tsv(spark, path, sep=",", **kw)


def read_whitespace(
    spark: SparkSession, path: str, names: list[str]
) -> DataFrame:
    """Whitespace-delimited scan — ``pd.read_csv(sep='\\s+')`` over tool
    output like the ``wc -l`` ledger (vcf_anno.py:416,
    pedmatch-clinical-vcf-workflow.py:485). Spark's CSV reader has no regex
    separators, so: text scan + trim + split. All columns string; caller
    casts."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    out = lines.filter(F.trim(F.col("value")) != "").select(
        *[parts.getItem(i).alias(n) for i, n in enumerate(names)]
    )
    return out


def write_tsv(
    df: DataFrame,
    path: str,
    columns: list[str] | None = None,
    na_rep: str = "",
    single_file: bool = True,
    compression: str | None = None,
) -> str:
    """Write the reference's TSV contract: tab sep, header, QUOTE_NONE,
    explicit column order, nulls as ``na_rep``.

    ``single_file=True`` reproduces the one-file-per-output convention the
    downstream cBioPortal loader expects (coalesce(1) — fine for matrix-sized
    outputs; pass False to keep parallel part files for big facts).
    """
    out = df.select(*columns) if columns else df
    if na_rep is not None:
        out = out.na.fill(na_rep)
    # QUOTE_NONE means a separator/newline INSIDE a field has no legal
    # encoding (Spark would wrap it in NUL quote bytes; the reference's
    # escapechar='\\' emits backslash+raw-tab, which still breaks naive TSV
    # consumers). Escape them visibly as \t / \n instead.
    for f in out.schema.fields:
        if isinstance(f.dataType, T.StringType):
            c = F.col(f"`{f.name}`")
            out = out.withColumn(
                f.name,
                F.replace(
                    F.replace(c, F.lit("\t"), F.lit("\\t")),
                    F.lit("\n"), F.lit("\\n"),
                ),
            )
    writer = (
        out.coalesce(1) if single_file else out
    ).write.mode("overwrite").option("sep", "\t").option("header", "true").option(
        "emptyValue", ""
    ).option("quote", "\u0000")  # QUOTE_NONE: NUL quote char disables quoting
    if compression:
        writer = writer.option("compression", compression)
    if single_file:
        tmp = tempfile.mkdtemp(prefix="tsv_sink_")
        staged = os.path.join(tmp, "out")
        writer.csv(staged)
        part = glob.glob(os.path.join(staged, "part-*"))[0]
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(tmp, ignore_errors=True)
        return path
    writer.csv(path)
    return path
