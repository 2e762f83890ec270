"""Excel scan (clinical workbooks).

The reference reads small clinical Excel sheets with pandas/openpyxl
(``mci_clinical_variant_merge.py:24``, ``pedmatch:24``). These are
driver-sized inputs (manifests, clinical variant lists), so the idiomatic
Spark path is a driver-side pandas read -> ``createDataFrame`` (Arrow),
keeping the cluster out of a fundamentally single-file format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
) -> DataFrame:
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, engine="openpyxl")
    except ImportError as exc:  # openpyxl not in this container
        raise NotImplementedError(
            "Excel scan requires openpyxl at runtime; convert the workbook to "
            "CSV/TSV and use read_tsv, or install openpyxl"
        ) from exc
    # all-object columns keep strings; pandas NaN -> None for Spark nulls
    pdf = pdf.where(pdf.notna(), None)
    return spark.createDataFrame(pdf)
