"""Excel scan (clinical workbooks) — dependency-free xlsx parser.

The reference reads small clinical Excel sheets with pandas/openpyxl
(``workflows/mci_clinical_variant_merge.py:24`` reads
``sheet_name="genetic_analysis"``; ``workflows/pedmatch-clinical-vcf-workflow.py:24``
reads the first sheet). These are driver-sized inputs (manifests, clinical
variant lists), so the idiomatic Spark path is a driver-side parse ->
``createDataFrame``, keeping the cluster out of a fundamentally single-file
format.

xlsx is a public format: a zip of XML parts (ECMA-376 SpreadsheetML). The
parser below reads the workbook's sheet registry, the shared-string table
and one worksheet — no openpyxl dependency (absent in this container).
Limitations, documented: date cells surface as Excel serial numbers (the
clinical sheets here carry IDs and labels, not dates); formulas surface as
their cached ``<v>`` values.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; itertext over all <t> handles both
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_part(zf: zipfile.ZipFile, sheet_name: str | int) -> str:
    """Resolve a sheet name/position to its worksheet part path via the
    workbook relationship table."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall(f"{_NS_PKG}Relationship")
    }
    sheets = wb.find(f"{_NS}sheets")
    entries = [] if sheets is None else list(sheets.findall(f"{_NS}sheet"))
    if isinstance(sheet_name, int):
        if not 0 <= sheet_name < len(entries):
            raise ValueError(f"workbook has {len(entries)} sheets, asked for index {sheet_name}")
        chosen = entries[sheet_name]
    else:
        by_name = {e.get("name"): e for e in entries}
        if sheet_name not in by_name:
            raise ValueError(f"sheet {sheet_name!r} not in workbook (has {sorted(by_name)})")
        chosen = by_name[sheet_name]
    target = rid_to_target[chosen.get(f"{_NS_R}id")]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(el.text or "" for el in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":  # cached formula string
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: ints stay ints so ID columns survive round-trips
    txt = v.text
    if re.fullmatch(r"-?\d+", txt):
        return int(txt)
    return float(txt)


def read_xlsx_rows(path: str, sheet_name: str | int = 0) -> tuple[list[str], list[list]]:
    """Parse one sheet into (header, data_rows). First row is the header
    (pandas ``read_excel`` default); missing cells are None; rows are padded
    to header width."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        part = _sheet_part(zf, sheet_name)
        root = ET.fromstring(zf.read(part))
    rows: list[dict[int, object]] = []
    for row_el in root.iter(f"{_NS}row"):
        cells = {}
        for pos, c in enumerate(row_el.findall(f"{_NS}c")):
            ref = c.get("r")
            ci = _col_index(ref) if ref else pos
            cells[ci] = _cell_value(c, shared)
        rows.append(cells)
    if not rows:
        return [], []
    width = max(max(r, default=-1) for r in rows) + 1
    dense = [[r.get(i) for i in range(width)] for r in rows]
    header = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(dense[0])]
    return header, dense[1:]


def excel_serial_to_date(col):
    """Excel stores dates as serial day numbers (day 1 = 1900-01-01, with
    the fictitious 1900-02-29 at serial 60 inherited from Lotus 1-2-3).
    Convert a numeric serial column to a DATE: serials > 59 shift by one
    extra day to skip the phantom leap day."""
    from pyspark.sql import functions as F

    base = F.to_date(F.lit("1899-12-31"))
    adj = F.when(col > 59, col.cast("long") - 2).otherwise(col.cast("long") - 1)
    return F.date_add(base, adj.cast("int") + 1)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
) -> DataFrame:
    """Excel scan -> DataFrame, first row as header. All columns surface as
    strings when mixed-typed (pandas-object semantics); homogeneous numeric
    columns keep their numeric type."""
    import pandas as pd

    header, data = read_xlsx_rows(path, sheet_name)
    pdf = pd.DataFrame(data, columns=header)
    pdf = pdf.where(pdf.notna(), None)
    # createDataFrame cannot merge mixed-typed object columns (a chromosome
    # column holding 17 and 'X' — typical clinical workbooks — raises
    # 'Can not merge type LongType and StringType'): coerce any object
    # column with heterogeneous value types to str, preserving None.
    for c in pdf.columns:
        if pdf[c].dtype == object:
            kinds = {type(v) for v in pdf[c] if v is not None}
            if len(kinds) > 1:
                pdf[c] = pdf[c].map(lambda v: None if v is None else str(v))
    return spark.createDataFrame(pdf)
