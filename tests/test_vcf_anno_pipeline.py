"""VCF->MAF pipeline tests on synthetic fixtures (FIXTURES.md §2, §4, §11),
exercising the reference's runtime reconciliation checks
(vcf_anno.py:400-483) as test oracles."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.annotation import (
    LookupAnnotator,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.vcf_anno import (
    annotate_manifest_vcfs,
    concat_maf_check,
    prepare_vcf,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.vcf import read_vcf

VCF_HEADER = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"


@pytest.fixture(scope="module")
def vcf_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("vcf_anno")
    rows = {
        # sample1: 3 PASS (one KI2 contig), 1 non-PASS
        "f1.vcf.gz": [
            ("chr1", 100, ".", "A", "T", "50", "PASS", "DP=30"),
            ("chr2", 200, ".", "GC", "G", "50", "PASS", "DP=40"),
            ("KI270728.1", 5, ".", "C", "A", "9", "PASS", "DP=3"),
            ("chr3", 300, ".", "T", "C", "10", "q10", "DP=5"),
        ],
        # sample2: 2 PASS
        "f2.vcf.gz": [
            ("chr1", 100, ".", "A", "T", "50", "PASS", "DP=22"),
            ("chrX", 700, ".", "TTA", "T", "50", "PASS", "DP=18"),
        ],
    }
    for fn, rs in rows.items():
        with gzip.open(root / fn, "wt") as f:
            f.write(VCF_HEADER)
            for r in rs:
                f.write("\t".join(str(x) for x in r) + "\n")
    manifest = pd.DataFrame(
        {
            "sample": ["S1", "S2"],
            "file_url": [f"s3://bucket/vcfs/{fn}" for fn in rows],
            "file_name": list(rows),
            "md5sum": ["m1", "m2"],
        }
    )
    # annotation lookup: KI2 contig variant is missing -> FAILED
    lookup = pd.DataFrame(
        {
            "Chromosome": ["1", "2", "X"],
            "Start_Position": [100, 200, 700],
            "Reference_Allele": ["A", "GC", "TTA"],
            "Tumor_Seq_Allele1": ["T", "G", "T"],
            "Hugo_Symbol": ["TP53", "EGFR", "BRCA1"],
            "Entrez_Gene_Id": [7157, 1956, 672],
            "Variant_Classification": ["Missense_Mutation", "Frame_Shift_Del", "Frame_Shift_Del"],
            "Variant_Type": ["SNP", "DEL", "DEL"],
            "HGVSp_Short": ["p.R175H", "p.A12fs", "p.K10fs"],
            "RefSeq": ["NM_1", "NM_2", "NM_3"],
        }
    )
    return {"root": str(root), "manifest": manifest, "lookup": lookup}


def test_prepare_vcf(spark, vcf_fixture):
    vcf = read_vcf(spark, f"{vcf_fixture['root']}/f1.vcf.gz")
    out = prepare_vcf(vcf).toPandas().sort_values("Start_Position")
    # non-PASS dropped; chr stripped; End = POS + len(REF) - 1
    assert len(out) == 3
    assert set(out.Chromosome) == {"1", "2", "KI270728.1"}
    row = out[out.Start_Position == 200].iloc[0]
    assert row.End_Position == 201  # len('GC') == 2


def test_annotate_and_check_clean(spark, vcf_fixture):
    manifest = spark.createDataFrame(vcf_fixture["manifest"])
    annotator = LookupAnnotator(
        spark.createDataFrame(vcf_fixture["lookup"]),
        keys=["Chromosome", "Start_Position", "Reference_Allele", "Tumor_Seq_Allele1"],
    )
    maf = annotate_manifest_vcfs(spark, manifest, vcf_fixture["root"], annotator)
    pdf = maf.toPandas()
    assert len(pdf) == 5  # 3 + 2 PASS rows
    assert set(pdf.Tumor_Sample_Barcode) == {"S1", "S2"}
    ki = pdf[pdf.Chromosome.str.contains("KI2")]
    assert (ki.Annotation_Status == "FAILED").all()  # not in lookup
    assert (pdf[~pdf.Chromosome.str.contains("KI2")].Annotation_Status == "SUCCESS").all()

    # per-file counts as the wc-l ledger equivalent
    per_file = (
        maf.groupBy("file_name").agg(F.count(F.lit(1)).alias("line_count"))
        .withColumn(
            "file_name",
            F.regexp_replace("file_name", r"\.vcf\.gz$", "_annotated.maf"),
        )
    )
    checks = concat_maf_check(maf, manifest, per_file)
    ledger = checks["ledger"].toPandas()
    assert not ledger.mismatch.any()  # union preserved cardinality
    # the KI2 FAILED row is exempt from the failed-sample check
    assert checks["failed"].count() == 0
    assert checks["misformatted"].count() == 0
    assert checks["cleaned_maf"].count() == 5
    assert checks["rerun_manifest"].count() == 0


def test_uncompressed_vcf_manifest_reconciles(spark):
    """An uncompressed .vcf manifest entry must rewrite to the same
    annotated-MAF name as per_file_counts does, or the ledger join misses
    and the sample is spuriously routed to rerun."""
    manifest = spark.createDataFrame(
        pd.DataFrame({"sample": ["S1"], "file_url": ["s3://b/f1.vcf"], "md5sum": ["x"]})
    )
    maf = spark.createDataFrame(
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["S1", "S1"],
                "file_name": ["f1.vcf"] * 2,
                "Chromosome": ["1", "2"],
                "Annotation_Status": ["SUCCESS", "SUCCESS"],
            }
        )
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.vcf_anno import (
        per_file_counts,
    )

    checks = concat_maf_check(maf, manifest, per_file_counts(maf))
    ledger = checks["ledger"].toPandas().set_index("sample")
    assert not bool(ledger.loc["S1"].mismatch)
    assert checks["rerun_manifest"].count() == 0


def test_lookup_annotator_null_value_column_is_success(spark):
    """A matched lookup row whose FIRST value column is legitimately NULL
    (e.g. Entrez_Gene_Id absent) must still report SUCCESS — match is
    decided by an explicit marker, not value nullness."""
    lookup = spark.createDataFrame(
        pd.DataFrame(
            {
                "Chromosome": ["1"],
                "Entrez_Gene_Id": [None],
                "Hugo_Symbol": ["TP53"],
            }
        )
    )
    variants = spark.createDataFrame(
        pd.DataFrame({"Chromosome": ["1", "9"], "extra": ["a", "b"]})
    )
    out = (
        LookupAnnotator(lookup, keys=["Chromosome"])(variants)
        .toPandas()
        .set_index("Chromosome")
    )
    assert out.loc["1"].Annotation_Status == "SUCCESS"
    assert out.loc["9"].Annotation_Status == "FAILED"


def test_concat_mafs_reader(spark, tmp_path):
    """Multi-file MAF concat: '#' comments and per-file headers dropped,
    rows tagged with their source file (the grep -vE '^#|^Hugo_Symbol'
    semantics of vcf_anno.py:350-398)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.vcf_anno import (
        concat_mafs,
        per_file_counts,
    )

    header = "Hugo_Symbol\tChromosome\tTumor_Sample_Barcode"
    (tmp_path / "s1_annotated.maf").write_text(
        f"#version 2.4\n{header}\nTP53\t17\tS1\nEGFR\t7\tS1\n"
    )
    (tmp_path / "s2_annotated.maf").write_text(
        f"#version 2.4\n{header}\nKRAS\t12\tS2\n"
    )
    paths = [str(tmp_path / "s1_annotated.maf"), str(tmp_path / "s2_annotated.maf")]
    maf = concat_mafs(spark, paths)
    pdf = maf.toPandas()
    assert len(pdf) == 3
    assert set(pdf.Tumor_Sample_Barcode) == {"S1", "S2"}
    assert "Hugo_Symbol" not in set(pdf.Hugo_Symbol)  # no header rows leaked
    counts = per_file_counts(maf).toPandas().set_index("file_name")
    assert counts.loc["s1_annotated.maf"].line_count == 2
    assert counts.loc["s2_annotated.maf"].line_count == 1


def test_check_flags_failures_and_nulls(spark, vcf_fixture):
    """Doctored concat MAF: a FAILED annotation on a real chrom (S2) and a
    null-barcode row -> S2 rerun + cleaned MAF drops both."""
    manifest = spark.createDataFrame(vcf_fixture["manifest"])
    maf_pdf = pd.DataFrame(
        {
            "Tumor_Sample_Barcode": ["S1", "S1", "S1", "S2", "S2", None],
            "file_name": ["f1_annotated.maf"] * 3 + ["f2_annotated.maf"] * 2 + ["f2_annotated.maf"],
            "Chromosome": ["1", "2", "KI270728.1", "1", "X", "5"],
            "Start_Position": [100, 200, 5, 100, 700, 900],
            "Reference_Allele": ["A", "GC", "C", "A", "TTA", "G"],
            "Tumor_Seq_Allele1": ["T", "G", "A", "T", "T", "C"],
            "Annotation_Status": ["SUCCESS", "SUCCESS", "FAILED", "SUCCESS", "FAILED", "SUCCESS"],
        }
    )
    maf = spark.createDataFrame(maf_pdf)
    per_file = spark.createDataFrame(
        pd.DataFrame(
            {
                "file_name": ["f1_annotated.maf", "f2_annotated.maf"],
                "line_count": [3, 3],
            }
        )
    )
    checks = concat_maf_check(maf, manifest, per_file)
    ledger = checks["ledger"].toPandas().set_index("sample")
    # S2 has 2 barcoded rows but ledger expects 3 -> mismatch
    assert bool(ledger.loc["S2"].mismatch) and not bool(ledger.loc["S1"].mismatch)
    failed = checks["failed"].toPandas()
    assert list(failed.Tumor_Sample_Barcode) == ["S2"]  # KI2 row exempt
    assert checks["misformatted"].count() == 1
    cleaned = checks["cleaned_maf"].toPandas()
    assert set(cleaned.Tumor_Sample_Barcode) == {"S1"}
    assert len(cleaned) == 3
    rerun = checks["rerun_manifest"].toPandas()
    assert list(rerun["sample"]) == ["S2"]
