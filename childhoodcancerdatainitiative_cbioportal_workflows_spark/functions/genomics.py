"""Scalar column expressions for the genomic formats.

All pure Column -> Column — no Python UDFs; every expression stays inside
whole-stage codegen. Each function cites the pandas/shell construct it
re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def strip_chr(c: Column) -> Column:
    """Literal 'chr' removal anywhere in the string — matches pandas
    ``str.replace('chr', '', regex=False)`` at cnv.py:282."""
    return F.replace(c, F.lit("chr"), F.lit(""))


def strip_chr_prefix_only(c: Column) -> Column:
    """Conditional prefix strip — mci_clinical_variant_merge.py:41 only
    removes a leading 'chr'."""
    return F.when(c.startswith("chr"), c.substr(F.lit(4), F.length(c))).otherwise(c)


def add_chr(c: Column) -> Column:
    """'chr' + str(col) — cnv.py:404,690."""
    return F.concat(F.lit("chr"), c.cast("string"))


def gistic_call(v: Column) -> Column:
    """GISTIC-like discretization of a log2 copy ratio — cnv.py:465-481,
    reused at pedmatch-clinical-vcf-workflow.py:256. Branch order matters:
    >2.0 -> 2, elif >0.3 -> 1, elif <-1.0 -> -2, elif <-0.3 -> -1, else 0."""
    return (
        F.when(v > 2.0, F.lit(2))
        .when(v > 0.3, F.lit(1))
        .when(v < -1.0, F.lit(-2))
        .when(v < -0.3, F.lit(-1))
        .otherwise(F.lit(0))
    )


def copy_number_to_log2(cn: Column, ndigits: int = 4) -> Column:
    """round(log2(cn/2), 4) — pedmatch-clinical-vcf-workflow.py:73-87.
    The reference raises on cn <= 0; as a column expression the domain guard
    yields NULL (callers that need the hard failure count NULLs and raise)."""
    return F.when(cn > 0, F.round(F.log2(cn / F.lit(2)), ndigits))


def end_position(pos: Column, ref: Column) -> Column:
    """End_Position = POS + len(REF) - 1 — vcf_anno.py:292-303."""
    return pos + F.length(ref) - F.lit(1)


def format_field(sample_col: Column, index: int, null_value: str = "NA") -> Column:
    """Unpack one ':'-packed FORMAT field by position —
    pedmatch-clinical-vcf-workflow.py:378-413 (GT=0, DP=2, FRO=5, FAO=7, AF=8).
    NaN guard (pedmatch:379-382) -> sentinel."""
    return F.when(
        sample_col.isNull(), F.lit(null_value)
    ).otherwise(F.split(sample_col, ":").getItem(index))


def gtf_attribute(attrs: Column, key: str, joiner: str = ";") -> Column:
    """Extract all values of ``key`` from a GTF attribute string and join
    multiples with ';' — cnv.py:360-368 (extract_genes). Pure higher-order
    functions: split on ';', keep entries containing the key, strip
    'key "value"' decoration."""
    entries = F.split(attrs, ";")
    matches = F.filter(entries, lambda x: F.trim(x).startswith(key + " "))
    cleaned = F.transform(
        matches,
        lambda x: F.regexp_extract(F.trim(x), key + r'\s+"([^"]*)"', 1),
    )
    return F.array_join(cleaned, joiner)


def strip_dot_zero(c: Column) -> Column:
    """Cast to string and remove every literal '.0' occurrence, NULL -> '' —
    the int-as-float artifact fix at mci_clinical_variant_merge.py:285-289
    (which, with pandas>=2 defaults, strips ANY '.0', not just a suffix —
    reproduced exactly for oracle parity)."""
    return F.coalesce(F.replace(c.cast("string"), F.lit(".0"), F.lit("")), F.lit(""))


def basename(path: Column) -> Column:
    """os.path.basename — vcf_anno.py:419,425; cnv.py:161."""
    return F.element_at(F.split(path, "/"), -1)
