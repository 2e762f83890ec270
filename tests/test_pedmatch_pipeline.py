"""Pedmatch tumor/normal pipeline tests on clinical-VCF fixtures
(FIXTURES.md §5), covering patient pairing, fusion breakend pairing +
germline subtraction, CNV log2/germline path, the relational SNV chain,
and add_vaf."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
    add_vaf,
    af_table,
    cnv_discrete_matrix,
    cnv_germline_subtract,
    cnv_log2_matrix,
    cnv_prep,
    cnv_segment_table,
    fusion_germline_subtract,
    fusion_prep,
    pair_patients,
    prep_clinical_vcf,
    read_clinical_vcfs,
    snv_somatic,
)

VCF_COLS = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}\n"
# FORMAT: GT=0, DP=2, FRO=5, FAO=7, AF=8
FMT = "GT:GQ:DP:MDP:MAF:FRO:QUAL2:FAO:AF:OTHER"


def _fmt_val(gt, dp, fro, fao, af):
    return f"{gt}:99:{dp}:0:0:{fro}:50:{fao}:{af}:x"


@pytest.fixture(scope="module")
def ped_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("pedmatch")
    files = {}

    # --- P0001 tumor (tissue): fusions + CNVs + SNVs
    files["P0001_tissue.vcf"] = [
        # fusion pair F1 (somatic) + pair F2 (germline: also in normal)
        ("chr1", 1000, "F1_1", "A", "<SV>", "50", "PASS",
         "SVTYPE=Fusion;GENE_NAME=EWSR1;EXON_NUM=7;ANNOTATION=ann1;READ_COUNT=100", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        ("chr2", 2000, "F1_2", "C", "<SV>", "50", "PASS",
         "SVTYPE=Fusion;GENE_NAME=FLI1;EXON_NUM=6;ANNOTATION=ann2;READ_COUNT=120", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        ("chr3", 3000, "F2_1", "G", "<SV>", "50", "PASS",
         "SVTYPE=Fusion;GENE_NAME=TMPRSS2;EXON_NUM=1;ANNOTATION=ann3;READ_COUNT=80", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        ("chr3", 4000, "F2_2", "T", "<SV>", "50", "PASS",
         "SVTYPE=Fusion;GENE_NAME=ERG;EXON_NUM=4;ANNOTATION=ann4;READ_COUNT=90", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        # CNV amplification (somatic) + one shared with normal (germline)
        ("chr8", 500, "MYCN", "A", "<CNV>", "50", "PASS",
         "SVTYPE=CNV;Amplification;NUMTILES=12;END=90500;RAW_CN=8.0", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        ("chr7", 700, "EGFR", "A", "<CNV>", "50", "PASS",
         "SVTYPE=CNV;Amplification;NUMTILES=5;END=50700;RAW_CN=4.0", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        # SNVs: s1 somatic (passes all gates), s2 fails tumor AF gate,
        # s3 germline (same GT in normal), s4 multiallelic (2nd allele somatic)
        ("chr1", 11000, "s1", "A", "T", "50", "PASS", "DP=30", FMT, _fmt_val("0/1", 40, 30, 20, 0.40)),
        ("chr1", 12000, "s2", "G", "C", "50", "PASS", "DP=30", FMT, _fmt_val("0/1", 40, 30, 1, 0.02)),
        ("chr1", 13000, "s3", "T", "G", "50", "PASS", "DP=30", FMT, _fmt_val("1/1", 40, 30, 25, 0.90)),
        ("chr1", 14000, "s4", "A", "G,C", "50", "PASS", "DP=35", FMT, _fmt_val("1/2", 45, 30, 22, 0.30)),
    ]
    # --- P0001 normal (blood)
    files["P0001_blood.vcf"] = [
        # germline fusion pair matching F2's sites (different FUSION_ID)
        ("chr3", 3100, "G9_1", "G", "<SV>", "50", "PASS",
         "SVTYPE=Fusion;GENE_NAME=TMPRSS2;EXON_NUM=1;ANNOTATION=annX;READ_COUNT=70", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        ("chr3", 4100, "G9_2", "T", "<SV>", "50", "PASS",
         "SVTYPE=Fusion;GENE_NAME=ERG;EXON_NUM=4;ANNOTATION=annY;READ_COUNT=60", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        # germline CNV on EGFR
        ("chr7", 700, "EGFR", "A", "<CNV>", "50", "PASS",
         "SVTYPE=CNV;Amplification;NUMTILES=5;END=50700;RAW_CN=4.1", FMT, _fmt_val("0/1", 50, 10, 40, 0.8)),
        # SNV normal-side rows (AF low except s3 which matches tumor GT)
        ("chr1", 11000, "s1", "A", "T", "50", "PASS", "DP=30", FMT, _fmt_val("0/0", 25, 30, 0, 0.01)),
        ("chr1", 12000, "s2", "G", "C", "50", "PASS", "DP=30", FMT, _fmt_val("0/0", 25, 30, 0, 0.01)),
        ("chr1", 13000, "s3", "T", "G", "50", "PASS", "DP=30", FMT, _fmt_val("1/1", 25, 30, 28, 0.95)),
        ("chr1", 14000, "s4", "A", "G,C", "50", "PASS", "DP=35", FMT, _fmt_val("0/0", 25, 30, 0, 0.01)),
    ]
    # --- P0002: only tissue (unpaired -> skipped)
    files["P0002_tissue.vcf"] = [
        ("chr1", 100, "z1", "A", "T", "50", "PASS", "DP=30", FMT, _fmt_val("0/1", 40, 30, 20, 0.4)),
    ]

    for fn, rows in files.items():
        sample = fn.replace(".vcf", "")
        with open(root / fn, "w") as f:
            f.write(VCF_COLS.format(sample=sample))
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")

    manifest = pd.DataFrame(
        [
            ("P0001_tissue", "P0001", "tissue", "P0001_tissue.vcf"),
            ("P0001_blood", "P0001", "blood", "P0001_blood.vcf"),
            ("P0002_tissue", "P0002", "tissue", "P0002_tissue.vcf"),
        ],
        columns=["sample_id", "participant_id", "sample_type", "file_name"],
    )
    return {"root": str(root), "manifest": manifest}


@pytest.fixture(scope="module")
def loaded(spark, ped_fixture):
    manifest = spark.createDataFrame(ped_fixture["manifest"])
    pairs = pair_patients(manifest)
    vcf = prep_clinical_vcf(
        read_clinical_vcfs(spark, ped_fixture["root"], manifest)
    )
    return {"manifest": manifest, "pairs": pairs, "vcf": vcf}


def test_pair_patients(loaded):
    pairs = loaded["pairs"].toPandas()
    assert len(pairs) == 1  # P0002 skipped (no blood)
    assert pairs.iloc[0].tumor_sample_id == "P0001_tissue"
    assert pairs.iloc[0].normal_sample_id == "P0001_blood"


def test_fusion_pairing_and_germline(loaded):
    fusions = fusion_prep(loaded["vcf"])
    pdf = fusions.toPandas()
    # 2 tumor pairs + 1 normal pair
    assert len(pdf) == 3
    f1 = pdf[(pdf.Sample_Id == "P0001_tissue") & (pdf.Event_Info == "F1")].iloc[0]
    assert (f1.Site1_Hugo_Symbol, f1.Site2_Hugo_Symbol) == ("EWSR1", "FLI1")
    assert (f1.Site1_Region_Number, f1.Site2_Region_Number) == ("7", "6")
    assert f1.Annotation == "ann2" and f1.Tumor_Read_Count == "120"  # site2's
    assert (f1.Site1_Position, f1.Site2_Position) == (1000, 2000)

    somatic = fusion_germline_subtract(fusions, loaded["pairs"]).toPandas()
    # F2 (TMPRSS2-ERG) matches the normal's sites -> dropped
    assert list(somatic.Event_Info) == ["F1"]
    assert list(somatic.SV_Status) == ["SOMATIC"]


def test_cnv_path(loaded):
    cnvs = cnv_prep(loaded["vcf"])
    pdf = cnvs.toPandas()
    assert len(pdf) == 3  # MYCN+EGFR tumor, EGFR normal
    mycn = pdf[pdf.Hugo_Symbol == "MYCN"].iloc[0]
    assert mycn["seg.mean"] == 2.0  # log2(8/2)
    assert mycn["loc.end"] == 90500 and mycn["num.mark"] == "12"
    assert mycn["Patient_Id"] == "P0001"

    somatic = cnv_germline_subtract(cnvs, loaded["pairs"]).toPandas()
    assert list(somatic.Hugo_Symbol) == ["MYCN"]  # EGFR germline-subtracted

    seg = cnv_segment_table(cnv_germline_subtract(cnvs, loaded["pairs"])).toPandas()
    assert list(seg.chrom) == ["8"]  # chr stripped
    disc = cnv_discrete_matrix(cnv_germline_subtract(cnvs, loaded["pairs"])).toPandas()
    assert disc.set_index("Hugo_Symbol").loc["MYCN", "P0001_tissue"] == 1  # 2.0 -> gain is >0.3, not >2.0
    log2m = cnv_log2_matrix(cnv_germline_subtract(cnvs, loaded["pairs"])).toPandas()
    assert log2m.set_index("Hugo_Symbol").loc["MYCN", "P0001_tissue"] == "2.0"


def test_snv_chain(loaded):
    somatic = snv_somatic(loaded["vcf"], loaded["pairs"])
    pdf = somatic.toPandas().sort_values("POS")
    # s1 passes; s2 fails AF gate (0.02 < 0.05); s3 germline (same GT);
    # s4 multiallelic split -> both alleles carry tumor 1/2 vs normal 0/0,
    # passing gates -> 2 rows
    assert list(pdf.ID) == ["s1", "s4", "s4"]
    assert set(pdf[pdf.ID == "s4"].ALT) == {"G", "C"}
    assert (pdf.FILTER == "PASS").all()  # forced rewrite
    assert (pdf.tumor_sample_id == "P0001_tissue").all()

    af = af_table(somatic).toPandas()
    assert len(af) == 3
    assert set(af.Tumor_Sample_Barcode) == {"P0001_tissue"}
    assert set(af.t_alt_count) == {"20", "22"}


def test_add_vaf(spark, loaded):
    somatic = snv_somatic(loaded["vcf"], loaded["pairs"])
    af = af_table(somatic)
    maf = spark.createDataFrame(
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["P0001_tissue", "P0001_tissue"],
                "Chromosome": ["chr1", "1"],
                "Start_Position": [11000, 99999],
                "Hugo_Symbol": ["TP53", "NOPE"],
                "t_alt_count": ["old", "old"],
                "t_ref_count": ["old", "old"],
            }
        )
    )
    # af table Chromosome carries 'chr' -> cleaned on both sides
    maf_clean = maf.withColumn(
        "Chromosome", F.replace(F.col("Chromosome"), F.lit("chr"), F.lit(""))
    )
    out = add_vaf(maf_clean, af).toPandas().sort_values("Start_Position")
    hit = out[out.Hugo_Symbol == "TP53"].iloc[0]
    assert (hit.t_alt_count, hit.t_ref_count) == ("20", "30")  # FAO=20, FRO=30
    miss = out[out.Hugo_Symbol == "NOPE"].iloc[0]
    assert (miss.t_alt_count, miss.t_ref_count) == ("", "")
