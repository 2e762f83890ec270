"""VCF sink tests: ``##`` meta-header preservation, the FILTER->FT FORMAT
round-trip (``pedmatch-clinical-vcf-workflow.py:326-351``) and the somatic
SNV output files (``:443-460``), pinned byte-for-byte against golden text."""

from __future__ import annotations

import gzip
import os

from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.vcf import (
    FT_META_LINE,
    preserve_filter_as_ft,
    read_vcf,
    read_vcf_meta_lines,
    write_vcf,
)

VCF_TEXT = """\
##fileformat=VCFv4.2
##reference=GRCh38
##FILTER=<ID=PASS,Description="All filters passed">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
chr1\t100\trs1\tA\tT\t50\tPASS\tDP=30\tGT:DP\t0/1:30
chr2\t200\t.\tG\tC\t9\tLowQual\tDP=7\tGT:DP\t1/1:7
"""

GOLDEN_WITH_FT = """\
##fileformat=VCFv4.2
##reference=GRCh38
##FILTER=<ID=PASS,Description="All filters passed">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=FT,Number=1,Type=String,Description="Filter status of the variant">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
chr1\t100\trs1\tA\tT\t50\tPASS\tDP=30\tGT:DP:FT\t0/1:30:PASS
chr2\t200\t.\tG\tC\t9\tLowQual\tDP=7\tGT:DP:FT\t1/1:7:LowQual
"""


def _write_input(tmp_path) -> str:
    src = str(tmp_path / "in.vcf")
    with open(src, "w") as f:
        f.write(VCF_TEXT)
    return src


def test_write_vcf_preserves_meta_and_ft_golden(spark, tmp_path):
    src = _write_input(tmp_path)
    meta = read_vcf_meta_lines(spark, src)
    assert len(meta) == 4 and meta[0] == "##fileformat=VCFv4.2"
    vcf = read_vcf(spark, src, sample_cols=["S1"])
    with_ft = preserve_filter_as_ft(vcf, ["S1"]).orderBy("CHROM", "POS")
    out = str(tmp_path / "out.vcf")
    write_vcf(with_ft, out, [*meta, FT_META_LINE])
    assert open(out).read() == GOLDEN_WITH_FT


def test_write_vcf_gzip_roundtrip(spark, tmp_path):
    src = _write_input(tmp_path)
    meta = read_vcf_meta_lines(spark, src)
    out = str(tmp_path / "out.vcf.gz")
    write_vcf(read_vcf(spark, src, sample_cols=["S1"]).orderBy("CHROM", "POS"), out, meta)
    # valid multi-member gzip, readable by both gzip and the Spark scans
    assert gzip.open(out, "rt").read().startswith("##fileformat=VCFv4.2")
    assert read_vcf_meta_lines(spark, out) == meta
    back = read_vcf(spark, out, sample_cols=["S1"])
    assert back.count() == 2
    assert {r.CHROM for r in back.collect()} == {"chr1", "chr2"}


def test_write_vcf_null_fill(spark, tmp_path):
    src = _write_input(tmp_path)
    vcf = read_vcf(spark, src, sample_cols=["S1"]).withColumn("ID", __import__("pyspark").sql.functions.lit(None).cast("string"))
    out = str(tmp_path / "nulls.vcf")
    write_vcf(vcf.orderBy("CHROM", "POS"), out, ["##fileformat=VCFv4.2"])
    lines = open(out).read().splitlines()
    assert lines[2].split("\t")[2] == "."  # VCF missing-value dot


def test_write_somatic_vcf_outputs(spark, tmp_path):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        write_somatic_vcf,
    )

    somatic = spark.createDataFrame(
        [("chr1", 100, "A", "T", "PASS", "0/1", "12", "88")],
        ["CHROM", "POS", "REF", "ALT", "FILTER", "tumor_gt", "t_alt_count", "t_ref_count"],
    )
    paths = write_somatic_vcf(somatic, str(tmp_path), "S1_T")
    assert os.path.basename(paths["somatic_vcf"]) == "S1_T_somatic_snvs.vcf"
    body = open(paths["somatic_vcf"]).read()
    assert body.splitlines()[0] == "CHROM\tPOS\tREF\tALT\tFILTER\ttumor_gt\tt_alt_count\tt_ref_count"
    assert open(paths["backup"]).read() == body
