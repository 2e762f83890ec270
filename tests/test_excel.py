"""Native xlsx reader tests. Fixtures are written with a minimal in-test
SpreadsheetML emitter (zip+XML, the public ECMA-376 format) — no openpyxl in
the container, which is exactly why sources/excel.py parses the zip itself.
Mirrors the reference's two Excel entry points: a named clinical sheet
(``mci_clinical_variant_merge.py:24``, sheet_name='genetic_analysis') and a
first-sheet manifest (``pedmatch-clinical-vcf-workflow.py:24``)."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.excel import (
    read_excel,
    read_xlsx_rows,
)

_WB_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets></workbook>"""

_RELS_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}</Relationships>"""

_CT_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml"
 ContentType="application/xml"/>
<Default Extension="rels"
 ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Override PartName="/xl/workbook.xml"
 ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>'


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Minimal SpreadsheetML writer: inline strings, numbers, booleans."""
    sheet_entries, rel_entries, parts = [], [], {}
    for idx, (name, rows) in enumerate(sheets.items(), start=1):
        rid = f"rId{idx}"
        sheet_entries.append(f'<sheet name="{name}" sheetId="{idx}" r:id="{rid}"/>')
        rel_entries.append(
            f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{idx}.xml"/>'
        )
        body = "".join(
            '<row r="%d">%s</row>'
            % (
                ri + 1,
                "".join(
                    _cell_xml(f"{_col_letter(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                ),
            )
            for ri, row in enumerate(rows)
        )
        parts[f"xl/worksheets/sheet{idx}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            f'spreadsheetml/2006/main"><sheetData>{body}</sheetData></worksheet>'
        )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT_XML)
        zf.writestr("xl/workbook.xml", _WB_XML.format(sheets="".join(sheet_entries)))
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS_XML.format(rels="\n".join(rel_entries)))
        for part, content in parts.items():
            zf.writestr(part, content)


@pytest.fixture()
def workbook(tmp_path):
    path = str(tmp_path / "clinical.xlsx")
    write_xlsx(
        path,
        {
            "summary": [["note"], ["not the data sheet"]],
            "genetic_analysis": [
                ["sample.sample_id", "gene_symbol", "chromosome", "vaf", "n_reads", "flag"],
                ["S1", "TP53", "chr17", 0.42, 120, True],
                ["S2", "KRAS", "12", 0.13, 57, False],
                ["S3", None, "X", None, 0, True],
            ],
        },
    )
    return path


def test_read_xlsx_rows_named_sheet(workbook):
    header, rows = read_xlsx_rows(workbook, "genetic_analysis")
    assert header == ["sample.sample_id", "gene_symbol", "chromosome", "vaf", "n_reads", "flag"]
    assert rows[0] == ["S1", "TP53", "chr17", 0.42, 120, True]
    assert rows[2][1] is None and rows[2][3] is None  # sparse cells -> None


def test_read_xlsx_rows_sheet_index_and_errors(workbook):
    header, _ = read_xlsx_rows(workbook, 0)
    assert header == ["note"]
    with pytest.raises(ValueError, match="genetic"):
        read_xlsx_rows(workbook, "genetic")  # exact-name lookup, like pandas
    with pytest.raises(ValueError, match="2 sheets"):
        read_xlsx_rows(workbook, 5)


def test_read_excel_dataframe(spark, workbook):
    df = read_excel(spark, workbook, sheet_name="genetic_analysis")
    assert df.columns == ["sample.sample_id", "gene_symbol", "chromosome", "vaf", "n_reads", "flag"]
    rows = {r["sample.sample_id"]: r for r in df.collect()}
    assert rows["S1"]["n_reads"] == 120 and abs(rows["S1"]["vaf"] - 0.42) < 1e-12
    assert rows["S3"]["gene_symbol"] is None


def test_read_excel_mixed_typed_column(spark, tmp_path):
    """A chromosome-style column mixing real ints and strings (17 vs 'X')
    must surface as strings (None preserved) instead of raising Spark's
    'Can not merge type LongType and StringType'."""
    path = str(tmp_path / "mixed.xlsx")
    write_xlsx(
        path,
        {
            "s": [
                ["sample", "chromosome", "count"],
                ["S1", 17, 3],
                ["S2", "X", 4],
                ["S3", None, 5],
            ]
        },
    )
    df = read_excel(spark, path)
    rows = {r["sample"]: r for r in df.collect()}
    assert rows["S1"]["chromosome"] == "17"
    assert rows["S2"]["chromosome"] == "X"
    assert rows["S3"]["chromosome"] is None
    assert rows["S3"]["count"] == 5  # homogeneous numeric column stays numeric


def test_excel_serial_to_date(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.excel import (
        excel_serial_to_date,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (59,), (61,), (45658,)], ["serial"])
    out = {
        r.serial: str(r.d)
        for r in df.select("serial", excel_serial_to_date(F.col("serial")).alias("d")).collect()
    }
    assert out[1] == "1900-01-01"
    assert out[59] == "1900-02-28"
    assert out[61] == "1900-03-01"  # phantom 1900-02-29 skipped
    assert out[45658] == "2025-01-01"


def test_pedmatch_manifest_from_xlsx(spark, tmp_path):
    """The pedmatch workflow's entry: first-sheet Excel manifest ->
    pair_patients tissue/blood pairing."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        pair_patients,
    )

    path = str(tmp_path / "manifest.xlsx")
    write_xlsx(
        path,
        {
            "Sheet1": [
                ["participant_id", "sample_id", "sample_type", "file_name"],
                ["P1", "S1T", "tissue", "s1t.vcf.gz"],
                ["P1", "S1N", "blood", "s1n.vcf.gz"],
                ["P2", "S2T", "tissue", "s2t.vcf.gz"],  # unpaired
            ]
        },
    )
    manifest = read_excel(spark, path)  # first sheet, like pd.read_excel default
    pairs = pair_patients(manifest).collect()
    assert len(pairs) == 1 and pairs[0]["participant_id"] == "P1"


def test_clin_file_prep_from_xlsx(spark, tmp_path):
    """The mci workflow's actual entry: Excel genetic_analysis sheet ->
    clin_file_prep. Chromosome prefix stripped, query column built."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        clin_file_prep,
    )

    path = str(tmp_path / "mci.xlsx")
    base = [
        "Somatic", "Present", "Somatic Disease/Germline Comparator Exome",
        "AMP/ASCO/CAP", "Tier I", "NM_000546",
    ]
    header = [
        "genomic_source_category", "status", "test",
        "reported_significance_system", "reported_significance", "transcript",
        "sample.sample_id", "gene_symbol", "chromosome",
        "hgvs_genome", "hgvs_coding", "hgvs_protein",
    ]
    write_xlsx(
        path,
        {
            "genetic_analysis": [
                header,
                base + ["S1", "TP53", "chr17", "g.7675088C>T", "c.524G>A", "p.R175H"],
                base + ["S9", "EGFR", "7", "g.1C>T", "c.1A>T", "p.X1Y"],  # not in maf
            ]
        },
    )
    clin = read_excel(spark, path, sheet_name="genetic_analysis")
    maf_samples = spark.createDataFrame([("S1",)], ["Tumor_Sample_Barcode"])
    out = clin_file_prep(clin, maf_samples, "GRCh38").collect()
    assert len(out) == 1
    assert out[0]["sample_id"] == "S1"
    assert out[0]["chromosome"] == "17"
    assert out[0]["query"] == "17:g.7675088C>T"
