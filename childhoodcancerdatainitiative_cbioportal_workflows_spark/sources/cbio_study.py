"""cBioPortal study-directory emitters.

The reference loads/validates study directories with cBioPortal's own
importer (``workflows/cbio_dataset_load_remove.py:297-430`` shells out to
``scripts/importer/validateData.py`` / ``metaImport.py``); it never builds
the files itself. This module emits that load contract — the public
cBioPortal "File Formats" specification — from engine DataFrames:

* ``meta_study.txt`` plus per-profile ``meta_*.txt`` descriptors
  (key: value lines, fixed required keys per genetic_alteration_type)
* ``case_lists/cases_*.txt`` (stable_id = <study>_<suffix>,
  ``case_list_ids`` tab-joined)
* ``data_clinical_sample.txt`` with the 4-row ``#`` attribute header
  (display names / descriptions / datatypes / priorities) over the
  attribute-ID column row
* data matrices via the existing TSV/matrix sinks (``tsv.write_tsv``,
  ``operators.pivot``)

Meta/case-list files are driver-sized key-value texts; only the data files
carry table-scale payloads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .tsv import write_tsv


def _write_lines(path: str, lines: list[str]) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def meta_study_lines(
    study_id: str,
    name: str,
    description: str,
    type_of_cancer: str,
    reference_genome: str = "hg38",
    add_global_case_list: bool = True,
) -> list[str]:
    return [
        f"type_of_cancer: {type_of_cancer}",
        f"cancer_study_identifier: {study_id}",
        f"name: {name}",
        f"description: {description}",
        f"add_global_case_list: {str(add_global_case_list).lower()}",
        f"reference_genome: {reference_genome}",
    ]


def meta_mutations_lines(
    study_id: str, data_filename: str = "data_mutations.txt"
) -> list[str]:
    return [
        f"cancer_study_identifier: {study_id}",
        "genetic_alteration_type: MUTATION_EXTENDED",
        "datatype: MAF",
        "stable_id: mutations",
        "show_profile_in_analysis_tab: true",
        "profile_name: Mutations",
        "profile_description: Somatic mutations from the engine pipelines",
        f"data_filename: {data_filename}",
    ]


def meta_cna_discrete_lines(
    study_id: str, data_filename: str = "data_CNA.txt"
) -> list[str]:
    return [
        f"cancer_study_identifier: {study_id}",
        "genetic_alteration_type: COPY_NUMBER_ALTERATION",
        "datatype: DISCRETE",
        "stable_id: gistic",
        "show_profile_in_analysis_tab: true",
        "profile_name: Copy-number values",
        "profile_description: Discrete copy-number calls (GISTIC-style -2..2)",
        f"data_filename: {data_filename}",
    ]


def meta_cna_seg_lines(
    study_id: str,
    reference_genome_id: str = "hg38",
    data_filename: str = "data_cna.seg",
) -> list[str]:
    # SEG descriptors carry reference_genome_id + description, no stable_id
    return [
        f"cancer_study_identifier: {study_id}",
        "genetic_alteration_type: COPY_NUMBER_ALTERATION",
        "datatype: SEG",
        f"reference_genome_id: {reference_genome_id}",
        "description: Somatic CNA segments",
        f"data_filename: {data_filename}",
    ]


def meta_clinical_sample_lines(
    study_id: str, data_filename: str = "data_clinical_sample.txt"
) -> list[str]:
    return [
        f"cancer_study_identifier: {study_id}",
        "genetic_alteration_type: CLINICAL",
        "datatype: SAMPLE_ATTRIBUTES",
        f"data_filename: {data_filename}",
    ]


def case_list_lines(
    study_id: str,
    suffix: str,
    name: str,
    description: str,
    sample_ids: list[str],
) -> list[str]:
    if not sample_ids:
        raise ValueError("case list must name at least one sample")
    return [
        f"cancer_study_identifier: {study_id}",
        f"stable_id: {study_id}_{suffix}",
        f"case_list_name: {name}",
        f"case_list_description: {description}",
        "case_list_ids: " + "\t".join(sample_ids),
    ]


# (attribute_id, display_name, description, datatype STRING|NUMBER|BOOLEAN,
# priority) — PATIENT_ID/SAMPLE_ID lead per the clinical-file contract
ClinicalAttr = tuple[str, str, str, str, str]

DEFAULT_SAMPLE_ATTRS: list[ClinicalAttr] = [
    ("PATIENT_ID", "Patient Identifier", "Patient identifier", "STRING", "1"),
    ("SAMPLE_ID", "Sample Identifier", "Sample identifier", "STRING", "1"),
]


def write_clinical_sample_file(
    clinical: DataFrame,
    path: str,
    attrs: list[ClinicalAttr],
) -> str:
    """``data_clinical_sample.txt``: four ``#`` metadata rows (display
    names, descriptions, datatypes, priorities) above the attribute-ID
    header, then the sample rows. ``attrs`` order defines column order and
    must cover every DataFrame column."""
    ids = [a[0] for a in attrs]
    missing = [c for c in ids if c not in clinical.columns]
    if missing:
        raise ValueError(f"clinical DataFrame lacks attribute columns {missing}")
    tmp = path + ".data"
    write_tsv(clinical, tmp, columns=ids)
    with open(tmp) as f:
        body = f.read().split("\n", 1)[1]  # drop the plain header row
    header = [
        "#" + "\t".join(a[1] for a in attrs),
        "#" + "\t".join(a[2] for a in attrs),
        "#" + "\t".join(a[3] for a in attrs),
        "#" + "\t".join(a[4] for a in attrs),
        "\t".join(ids),
    ]
    with open(path, "w") as f:
        f.write("\n".join(header) + "\n" + body)
    os.remove(tmp)
    return path


def write_study(
    out_dir: str,
    study_id: str,
    name: str,
    description: str,
    type_of_cancer: str,
    mutations: DataFrame | None = None,
    cna_discrete: DataFrame | None = None,
    cna_seg: DataFrame | None = None,
    clinical: DataFrame | None = None,
    clinical_attrs: list[ClinicalAttr] | None = None,
    reference_genome: str = "hg38",
) -> dict[str, str]:
    """Emit a loadable study directory from engine outputs. Sample IDs for
    ``case_lists/cases_all.txt`` are the union of mutation barcodes,
    CNA matrix sample columns and clinical SAMPLE_IDs."""
    paths: dict[str, str] = {}
    samples: set[str] = set()

    paths["meta_study"] = _write_lines(
        os.path.join(out_dir, "meta_study.txt"),
        meta_study_lines(
            study_id, name, description, type_of_cancer, reference_genome
        ),
    )
    if mutations is not None:
        paths["data_mutations"] = write_tsv(
            mutations, os.path.join(out_dir, "data_mutations.txt")
        )
        paths["meta_mutations"] = _write_lines(
            os.path.join(out_dir, "meta_mutations.txt"),
            meta_mutations_lines(study_id),
        )
        samples.update(
            r[0]
            for r in mutations.select("Tumor_Sample_Barcode").distinct().collect()
            if r[0]
        )
    if cna_discrete is not None:
        paths["data_CNA"] = write_tsv(
            cna_discrete, os.path.join(out_dir, "data_CNA.txt")
        )
        paths["meta_CNA"] = _write_lines(
            os.path.join(out_dir, "meta_CNA.txt"),
            meta_cna_discrete_lines(study_id),
        )
        samples.update(c for c in cna_discrete.columns if c not in ("Hugo_Symbol", "Entrez_Gene_Id"))
    if cna_seg is not None:
        paths["data_cna_seg"] = write_tsv(
            cna_seg, os.path.join(out_dir, "data_cna.seg")
        )
        paths["meta_cna_seg"] = _write_lines(
            os.path.join(out_dir, f"meta_cna_seg.txt"),
            meta_cna_seg_lines(study_id, reference_genome),
        )
        samples.update(r[0] for r in cna_seg.select("ID").distinct().collect())
    if clinical is not None:
        attrs = clinical_attrs or DEFAULT_SAMPLE_ATTRS
        paths["data_clinical_sample"] = write_clinical_sample_file(
            clinical, os.path.join(out_dir, "data_clinical_sample.txt"), attrs
        )
        paths["meta_clinical_sample"] = _write_lines(
            os.path.join(out_dir, "meta_clinical_sample.txt"),
            meta_clinical_sample_lines(study_id),
        )
        samples.update(r[0] for r in clinical.select("SAMPLE_ID").distinct().collect())

    paths["cases_all"] = _write_lines(
        os.path.join(out_dir, "case_lists", "cases_all.txt"),
        case_list_lines(
            study_id,
            "all",
            "All samples",
            "All samples in the study",
            sorted(samples),
        ),
    )
    return paths
