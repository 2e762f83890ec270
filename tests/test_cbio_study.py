"""Format-contract tests for the emitted cBioPortal study directory
(SURVEY §5: the reference delegates to cBioPortal's validateData.py, which
is not in this container — these tests pin the same documented contract:
required meta keys per profile, case-list shape, the 4-row # clinical
attribute header)."""

from __future__ import annotations

import os

import pytest

from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.cbio_study import (
    DEFAULT_SAMPLE_ATTRS,
    case_list_lines,
    write_study,
)


def _kv(path: str) -> dict[str, str]:
    out = {}
    for line in open(path).read().splitlines():
        k, v = line.split(": ", 1)
        out[k] = v
    return out


@pytest.fixture(scope="module")
def study(spark, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cbio")
    mutations = spark.createDataFrame(
        [
            ("TP53", "17", "7675088", "Missense_Mutation", "S1"),
            ("KRAS", "12", "25245350", "Missense_Mutation", "S2"),
        ],
        ["Hugo_Symbol", "Chromosome", "Start_Position", "Variant_Classification", "Tumor_Sample_Barcode"],
    )
    cna = spark.createDataFrame(
        [("TP53", -2, 0), ("MYC", 2, 1)], ["Hugo_Symbol", "S1", "S3"]
    )
    seg = spark.createDataFrame(
        [("S4", "17", 100, 900, 42, -1.25)],
        ["ID", "chrom", "loc.start", "loc.end", "num.mark", "seg.mean"],
    )
    clinical = spark.createDataFrame(
        [("P1", "S1"), ("P2", "S2")], ["PATIENT_ID", "SAMPLE_ID"]
    )
    out = str(tmp_path / "study")
    paths = write_study(
        out,
        study_id="ccdi_test_2026",
        name="CCDI engine test study",
        description="Emitted by the engine for contract tests",
        type_of_cancer="mixed",
        mutations=mutations,
        cna_discrete=cna,
        cna_seg=seg,
        clinical=clinical,
    )
    return out, paths


def test_meta_study_contract(study):
    _, paths = study
    kv = _kv(paths["meta_study"])
    for required in ("type_of_cancer", "cancer_study_identifier", "name", "description"):
        assert required in kv, required
    assert kv["cancer_study_identifier"] == "ccdi_test_2026"


def test_profile_meta_contracts(study):
    out, paths = study
    for key, gat, datatype, stable in (
        ("meta_mutations", "MUTATION_EXTENDED", "MAF", "mutations"),
        ("meta_CNA", "COPY_NUMBER_ALTERATION", "DISCRETE", "gistic"),
    ):
        kv = _kv(paths[key])
        assert kv["genetic_alteration_type"] == gat
        assert kv["datatype"] == datatype
        assert kv["stable_id"] == stable
        assert kv["show_profile_in_analysis_tab"] in ("true", "false")
        # the referenced data file must exist next to the meta file
        assert os.path.exists(os.path.join(out, kv["data_filename"]))
    seg_kv = _kv(paths["meta_cna_seg"])
    assert seg_kv["datatype"] == "SEG" and "reference_genome_id" in seg_kv
    assert os.path.exists(os.path.join(out, seg_kv["data_filename"]))


def test_case_list_contract(study):
    out, paths = study
    lines = open(paths["cases_all"]).read().splitlines()
    kv = dict(line.split(": ", 1) for line in lines)
    assert kv["stable_id"] == "ccdi_test_2026_all"
    ids = kv["case_list_ids"].split("\t")
    # union of MAF barcodes, CNA sample columns, seg IDs, clinical samples
    assert ids == ["S1", "S2", "S3", "S4"]
    assert os.path.dirname(paths["cases_all"]).endswith("case_lists")


def test_case_list_rejects_empty():
    with pytest.raises(ValueError):
        case_list_lines("s", "all", "n", "d", [])


def test_clinical_sample_header_contract(study):
    _, paths = study
    lines = open(paths["data_clinical_sample"]).read().splitlines()
    assert [ln.startswith("#") for ln in lines[:5]] == [True] * 4 + [False]
    widths = {len(ln.lstrip("#").split("\t")) for ln in lines[:5]}
    assert widths == {len(DEFAULT_SAMPLE_ATTRS)}  # all header rows aligned
    assert lines[3] == "#1\t1"  # priorities row
    assert lines[4] == "PATIENT_ID\tSAMPLE_ID"
    assert lines[5:] and all(len(ln.split("\t")) == 2 for ln in lines[5:])


def test_data_cna_matrix_shape(study):
    out, _ = study
    lines = open(os.path.join(out, "data_CNA.txt")).read().splitlines()
    assert lines[0] == "Hugo_Symbol\tS1\tS3"
    assert {ln.split("\t")[0] for ln in lines[1:]} == {"TP53", "MYC"}
