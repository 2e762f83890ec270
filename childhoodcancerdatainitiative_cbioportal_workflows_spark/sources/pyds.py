"""Custom Python data sources (the Spark 4 ``pyspark.sql.datasource`` API).

Two formats the built-in sources can't serve:

* ``xlsx`` — executor-side Excel scan. :func:`..sources.excel.read_excel`
  parses ONE workbook on the driver (the right call for a single clinical
  manifest, see excel.py's module doc), but a drop zone holding hundreds
  of site-submitted workbooks (the reference's intake shape,
  mci_clinical_variant_merge.py:24) needs the parse distributed: this
  source globs the path driver-side, emits ONE partition PER (file,
  sheet), and each executor parses its workbook with the same
  dependency-free zip+XML parser. Workbooks are driver-unsplittable
  binary zips, so per-file partitions are the finest sound granularity.
  All columns surface as strings (different files may type a column
  differently — a chromosome column holding 17 and 'X'; cast downstream),
  plus a ``_src_file`` lineage column.

* ``sqldump`` — statement-level relation over mysqldump files: one row
  per CREATE TABLE / INSERT statement with its table and tuple count,
  the record-shaped face of :func:`..sources.sqldump
  .parse_sql_dump_counts` (which remains the aggregate fast path — its
  ``spark.read.text(lineSep=';')`` scan splits WITHIN files, this source
  partitions per file). Useful when the dump's statement stream itself is
  the dataset (audit trails, migration diffing).

Register once per session::

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
        register_python_sources,
    )
    register_python_sources(spark)
    df = spark.read.format("xlsx").load("/drop/*.xlsx")

Cited reference behavior: Excel intake mci_clinical_variant_merge.py:24,
pedmatch-clinical-vcf-workflow.py:24; dump parsing src/utils.py:328-383.
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _expand_files(path: str, suffix: str | None = None) -> list[str]:
    """Driver-side glob/dir expansion to a sorted local file list."""
    local = path[7:] if path.startswith("file://") else path
    files: list[str] = []
    for p in sorted(_glob.glob(local)) or [local]:
        if os.path.isdir(p):
            files.extend(
                sorted(
                    q
                    for q in _glob.glob(os.path.join(p, "*"))
                    if os.path.isfile(q)
                    and (suffix is None or q.endswith(suffix))
                )
            )
        elif os.path.isfile(p):
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no input files match {path!r}")
    return files


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx")``. Options: ``path`` (file/dir/glob),
    ``sheet`` (name or 0-based index as string, default first sheet)."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> StructType:
        # infer from the FIRST file's header row (driver-side, head-only);
        # every file must share the header — a mismatched workbook fails
        # loudly at read time rather than silently misaligning columns
        from .excel import read_xlsx_rows

        first = _expand_files(self.options["path"], suffix=".xlsx")[0]
        header, _ = read_xlsx_rows(first, self._sheet())
        return StructType(
            [StructField(h, StringType()) for h in header]
            + [StructField("_src_file", StringType())]
        )

    def _sheet(self) -> str | int:
        s = self.options.get("sheet", "0")
        return int(s) if re.fullmatch(r"\d+", str(s)) else s

    def reader(self, schema: StructType) -> "XlsxReader":
        return XlsxReader(schema, self.options["path"], self._sheet())

    def simpleStreamReader(self, schema: StructType) -> "XlsxStreamReader":
        return XlsxStreamReader(schema, self.options["path"], self._sheet())


class XlsxReader(DataSourceReader):
    def __init__(self, schema: StructType, path: str, sheet: str | int):
        self.columns = [f.name for f in schema.fields[:-1]]  # minus _src_file
        self.path = path
        self.sheet = sheet

    def partitions(self):
        return [_FilePartition(f) for f in _expand_files(self.path, ".xlsx")]

    def read(self, partition: _FilePartition):
        from .excel import read_xlsx_rows

        header, rows = read_xlsx_rows(partition.path, self.sheet)
        if header != self.columns:
            raise ValueError(
                f"{partition.path}: header {header} != inferred schema "
                f"{self.columns} (all workbooks in one load must share a header)"
            )
        for r in rows:
            yield tuple(
                (None if v is None else str(v)) for v in r
            ) + (partition.path,)


class XlsxStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the xlsx drop zone: each micro-batch picks up
    workbooks that appeared since the last offset (``readStream.format
    ("xlsx")``) — continuously-arriving site submissions without a
    conversion step in front of the landing zone. The offset is the
    sorted list of already-ingested file paths (exactly replayable:
    ``readBetweenOffsets`` re-parses the difference), which grows with
    the zone — at production scale front this with the same
    date-partitioned drop-dir convention the built-in file source uses,
    so each stream only watches one bounded partition. Files must be
    complete when they appear (write-then-rename, the standard landing
    contract)."""

    def __init__(self, schema: StructType, path: str, sheet: str | int):
        self.columns = [f.name for f in schema.fields[:-1]]
        self.path = path
        self.sheet = sheet

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_of(self, files):
        from .excel import read_xlsx_rows

        for path in files:
            header, rows = read_xlsx_rows(path, self.sheet)
            if header != self.columns:
                raise ValueError(
                    f"{path}: header {header} != stream schema {self.columns}"
                )
            for r in rows:
                yield tuple(
                    (None if v is None else str(v)) for v in r
                ) + (path,)

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        try:
            now = _expand_files(self.path, ".xlsx")
        except FileNotFoundError:
            now = []
        new = [f for f in now if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        # a materialized list ITERATOR, not a bare generator or list: the
        # engine both copies/pickles the prefetched batch for replay
        # (generators don't pickle) and iterates it (lists aren't
        # iterators). Batches are bounded by the files that arrived since
        # the last trigger.
        return iter(list(self._rows_of(new))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        new = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return iter(list(self._rows_of(new)))


_SQLDUMP_SCHEMA = StructType(
    [
        StructField("src_file", StringType()),
        StructField("stmt_kind", StringType()),
        StructField("table_name", StringType()),
        StructField("n_rows", LongType()),
    ]
)


class SqlDumpDataSource(DataSource):
    """``spark.read.format("sqldump")``: one row per CREATE TABLE /
    INSERT statement. Option: ``path``. Same regexes and tuple-counting
    semantics as ``parse_sql_dump_counts`` (unattributable INSERTs
    surface under the ``__unparseable__`` table, never dropped)."""

    @classmethod
    def name(cls) -> str:
        return "sqldump"

    def schema(self) -> StructType:
        return _SQLDUMP_SCHEMA

    def reader(self, schema: StructType) -> "SqlDumpReader":
        return SqlDumpReader(self.options["path"])


class SqlDumpReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        return [_FilePartition(f) for f in _expand_files(self.path)]

    def read(self, partition: _FilePartition):
        from .sqldump import (
            _CREATE_TABLE,
            _INSERT_TABLE,
            _VALUES_TUPLES,
            _sniff_one,
            UNPARSEABLE,
        )

        sep = _sniff_one(partition.path)
        with open(partition.path, "r", errors="replace", newline="") as f:
            body = f.read()
        for stmt in body.split(sep):
            m = re.search(_CREATE_TABLE, stmt)
            if m:
                yield (partition.path, "create", m.group(1), 0)
                continue
            if not re.search(r"(?im)^\s*INSERT\s+INTO", stmt):
                continue
            mt = re.search(_INSERT_TABLE, stmt)
            mv = re.search(_VALUES_TUPLES, stmt)
            if not mt or not mv:
                yield (partition.path, "insert", UNPARSEABLE, 0)
                continue
            n = len(re.split(r"\)\s*,\s*\(", mv.group(1)))
            yield (partition.path, "insert", mt.group(1), n)


def register_python_sources(spark) -> None:
    """Register both custom formats on this session (idempotent)."""
    spark.dataSource.register(XlsxDataSource)
    spark.dataSource.register(SqlDumpDataSource)
