"""Clinical variant merge tests (mci_clinical_variant_merge.py semantics),
with a hermetic fetch double exercising the HGVS matching cascade."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.annotation import (
    BatchHttpAnnotator,
    match_consequence,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
    annotate_clinical_variants,
    clin_file_prep,
    merge_clinical_variants_to_maf,
)


def _clin_rows():
    base = dict(
        genomic_source_category="Somatic",
        status="Present",
        test="Somatic Disease/Germline Comparator Exome",
        reported_significance_system="AMP/ASCO/CAP",
        reported_significance="Tier I",
        transcript="NM_000546",
    )
    return pd.DataFrame(
        [
            # kept: matches maf sample, all filters pass, chr prefix stripped
            {**base, "sample.sample_id": "S1", "gene_symbol": "TP53",
             "chromosome": "chr17", "hgvs_genome": "g.7675088C>T",
             "hgvs_coding": "c.524G>A", "hgvs_protein": "p.R175H"},
            # dropped: sample not in maf
            {**base, "sample.sample_id": "S9", "gene_symbol": "EGFR",
             "chromosome": "7", "hgvs_genome": "g.1C>T",
             "hgvs_coding": "c.1A>T", "hgvs_protein": "p.X1Y"},
            # dropped: germline
            {**base, "sample.sample_id": "S1", "gene_symbol": "BRCA2",
             "genomic_source_category": "Germline",
             "chromosome": "13", "hgvs_genome": "g.2C>T",
             "hgvs_coding": "c.2A>T", "hgvs_protein": "p.A2B"},
            # kept: protein 'Not Reported' -> coding match path
            {**base, "sample.sample_id": "S2", "gene_symbol": "KRAS",
             "chromosome": "12", "hgvs_genome": "g.25245350C>T",
             "hgvs_coding": "c.35G>A", "hgvs_protein": "Not Reported"},
            # kept but annotation fails (fetch returns empty) -> filtered out
            {**base, "sample.sample_id": "S2", "gene_symbol": "NRAS",
             "chromosome": "1", "hgvs_genome": "g.999G>C",
             "hgvs_coding": "c.9G>C", "hgvs_protein": "p.Q9H"},
        ]
    )


ANNOS = {
    "17:g.7675088C>T": {
        "annotation_summary": {
            "genomicLocation": {
                "start": 7675088, "end": 7675088,
                "referenceAllele": "C", "variantAllele": "T",
            },
            "variantType": "SNP",
            "transcriptConsequences": [
                {"hgvsp": "p.R175H", "hgvspShort": "p.R175H",
                 "variantClassification": "Missense_Mutation",
                 "hgvsc": "c.524G>A"},
            ],
        }
    },
    "12:g.25245350C>T": {
        "annotation_summary": {
            "genomicLocation": {
                "start": 25245350, "end": 25245350,
                "referenceAllele": "C", "variantAllele": "T",
            },
            "variantType": "SNP",
            "transcriptConsequences": [
                {"hgvsp": "p.G12D", "hgvspShort": "p.G12D",
                 "variantClassification": "Missense_Mutation",
                 "hgvsc": "ENST1:c.35G>A"},
            ],
        }
    },
    "1:g.999G>C": {},  # annotation failure -> all-null fields
}


def fake_fetch(query: str) -> dict:
    return ANNOS.get(query, {})


def test_clin_prep_and_annotate(spark):
    clin = spark.createDataFrame(_clin_rows())
    maf_samples = spark.createDataFrame(pd.DataFrame({"s": ["S1", "S2"]}))
    prepped = clin_file_prep(clin, maf_samples, "GRCh38")
    pdf = prepped.toPandas()
    assert len(pdf) == 3  # S9 + germline dropped
    assert set(pdf.chromosome) == {"17", "12", "1"}  # chr prefix stripped
    assert set(pdf["query"]) == set(ANNOS)

    annotator = BatchHttpAnnotator(fetch=fake_fetch, retries=1)
    maf_ready = annotate_clinical_variants(prepped, annotator)
    out = maf_ready.toPandas().sort_values("Hugo_Symbol")
    # NRAS fetch failed -> filtered; TP53 via protein match, KRAS via coding
    assert list(out.Hugo_Symbol) == ["KRAS", "TP53"]
    assert list(out.HGVSp_Short) == ["p.G12D", "p.R175H"]
    assert list(out.NCBI_Build.unique()) == ["GRCh38"]
    assert out[out.Hugo_Symbol == "TP53"].Start_Position.iloc[0] == 7675088


def test_match_consequence_cascade():
    ann = ANNOS["12:g.25245350C>T"]
    # protein path
    assert match_consequence(ann, "p.G12D", None) == ("p.G12D", "Missense_Mutation")
    # coding path when protein not reported
    assert match_consequence(ann, "Not Reported", "c.35G>A") == (
        "p.G12D", "Missense_Mutation",
    )
    # summaries fallback
    ann2 = {
        "annotation_summary": {
            "transcriptConsequences": [],
            "transcriptConsequenceSummaries": [
                {"hgvsp": "p.V600E", "hgvspShort": "p.V600E",
                 "variantClassification": "Missense_Mutation"}
            ],
        }
    }
    assert match_consequence(ann2, "p.V600E", None)[0] == "p.V600E"
    # del/dup/ins truncation fallback
    ann3 = {
        "annotation_summary": {
            "transcriptConsequences": [
                {"hgvsc": "ENST:c.100_102del", "hgvspShort": "p.K34del",
                 "variantClassification": "In_Frame_Del"}
            ]
        }
    }
    assert match_consequence(ann3, "Not Reported", "c.100_102delAAG")[0] == "p.K34del"
    # no match at all
    assert match_consequence({}, "p.Z9Z", "c.1A>T") == (None, None)


def test_merge_dedup_preference(spark):
    maf = spark.createDataFrame(
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["S1", "S1", "S2"],
                "Hugo_Symbol": ["TP53", "EGFR", "KRAS"],
                "Chromosome": ["17", "7", "12"],
                "Start_Position": [7675088.0, 55019017.0, None],
                "End_Position": [7675088.0, 55019017.0, 25245350.0],
                "Variant_Classification": ["Missense_Mutation"] * 3,
                "HGVSp_Short": ["p.R175H", "p.L62R", "p.G12D"],
                "Entrez_Gene_Id": [7157.0, 1956.0, None],
            }
        )
    )
    clin = spark.createDataFrame(
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["S1", "S3"],
                "Hugo_Symbol": ["TP53", "BRAF"],
                "Chromosome": ["17", "7"],
                "Start_Position": [7675088.0, 140753336.0],
                "End_Position": [7675088.0, 140753336.0],
                "Variant_Classification": ["Missense_Mutation"] * 2,
                "HGVSp_Short": ["p.R175H", "p.V600E"],
                "Reported.Significance System": ["AMP/ASCO/CAP"] * 2,
                "Reported.Significance": ["Tier I", "Tier II"],
            }
        )
    )
    merged, stats = merge_clinical_variants_to_maf(maf, clin)
    pdf = merged.toPandas()
    # duplicate TP53 row kept once, from the clinical side
    tp53 = pdf[pdf.Hugo_Symbol == "TP53"]
    assert len(tp53) == 1
    assert tp53["Reported.Significance"].iloc[0] == "Tier I"
    # BRAF added uniquely; maf-only rows defaulted to Not Reported
    assert stats == {
        "raw_maf_rows": 3,
        "merged_rows": 4,
        "clin_deduped": 1,
        "clin_added_uniquely": 1,
    }
    egfr = pdf[pdf.Hugo_Symbol == "EGFR"]
    assert egfr["Reported.Significance"].iloc[0] == "Not Reported"
    # .0 strip + null -> '' (mci:285-289)
    assert tp53.Start_Position.iloc[0] == "7675088"
    kras = pdf[pdf.Hugo_Symbol == "KRAS"]
    assert kras.Start_Position.iloc[0] == "" and kras.Entrez_Gene_Id.iloc[0] == ""


def test_merge_stats_single_pass_equals_naive_recompute(spark):
    """Pins the r13 single-pass stats rewrite (r13 verdict task 6): the
    window-sum stats that ride the dedup Exchange must equal the naive
    independently-computed ``.filter(_src==…).count()`` values on a
    fixture with MULTI-ROW groups on both sides — groups with several
    MAF rows, several clinical rows, both, and null dedup keys — the
    shapes where a window-vs-groupBy discrepancy would surface."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        MAF_DEDUP_KEYS,
        clin_union,
    )

    def maf_row(sym, start, barcode="S1"):
        return dict(
            Tumor_Sample_Barcode=barcode,
            Hugo_Symbol=sym,
            Chromosome="1",
            Start_Position=start,
            End_Position=start,
            Variant_Classification="Missense_Mutation",
            HGVSp_Short=f"p.{sym}",
            Entrez_Gene_Id=1.0,
        )

    def clin_row(sym, start, tier, barcode="S1"):
        r = maf_row(sym, start, barcode)
        del r["Entrez_Gene_Id"]
        r["Reported.Significance System"] = "AMP/ASCO/CAP"
        r["Reported.Significance"] = tier
        return r

    # group A: 3 MAF + 2 clinical rows (same 7-key identity)
    # group B: 2 MAF rows only
    # group C: 2 clinical rows only
    # group D: 1 MAF + 1 clinical
    # group E: null Start/End keys, 2 MAF + 1 clinical
    maf = spark.createDataFrame(
        pd.DataFrame(
            [maf_row("A", 100.0)] * 3
            + [maf_row("B", 200.0)] * 2
            + [maf_row("D", 400.0)]
            + [maf_row("E", None)] * 2
        )
    )
    clin = spark.createDataFrame(
        pd.DataFrame(
            [clin_row("A", 100.0, "Tier I"), clin_row("A", 100.0, "Tier II")]
            + [clin_row("C", 300.0, "Tier I"), clin_row("C", 300.0, "Tier III")]
            + [clin_row("D", 400.0, "Tier II")]
            + [clin_row("E", None, "Tier I")]
        )
    )
    merged, stats = merge_clinical_variants_to_maf(maf, clin)

    # naive recompute: three independent traversals of the same union
    unioned = clin_union(maf, clin)
    naive_maf = unioned.filter(F.col("_src") == 0).count()
    naive_clin = unioned.filter(F.col("_src") == 1).count()
    naive_groups = unioned.dropDuplicates(MAF_DEDUP_KEYS).count()
    assert stats == {
        "raw_maf_rows": naive_maf,
        "merged_rows": naive_groups,
        "clin_deduped": naive_clin - (naive_groups - naive_maf),
        "clin_added_uniquely": naive_groups - naive_maf,
    }
    assert (naive_maf, naive_clin, naive_groups) == (8, 6, 5)
    # the merged frame itself has exactly one row per group, and every
    # group with a clinical row keeps the clinical (Tier I first) rep
    pdf = merged.toPandas().set_index("Hugo_Symbol")
    assert merged.count() == naive_groups
    assert pdf.loc["A", "Reported.Significance"] == "Tier I"
    assert pdf.loc["C", "Reported.Significance"] == "Tier I"
    assert pdf.loc["E", "Reported.Significance"] == "Tier I"
    assert pdf.loc["B", "Reported.Significance"] == "Not Reported"
