"""SQL-dump text scan: table/row counts from a mysqldump file.

The reference parses dump files line-by-line in 10k-line chunks with a
carry buffer (``src/utils.py:328-383``): count CREATE TABLE statements and
count VALUES tuples per INSERT INTO table. Spark version: distributed
``spark.read.text`` with a statement delimiter (``;\\n``, or ``;\\r\\n``
for CRLF dumps — sniffed from the file head) so one record = one SQL
statement regardless of dialect — extended inserts (one batched
``INSERT ... VALUES (...),(...);`` line), ``--skip-extended-insert`` dumps
(one tuple per INSERT), and pretty-printed multi-line tuple lists all
parse identically. The text source stays splittable on the custom
delimiter, so a dump of any size partitions across executors with no
chunk/carry logic.

A record carries the comment/blank lines that precede its statement
(mysqldump interleaves ``--`` banners), so all statement regexes anchor at
LINE starts (``(?im)^\\s*``), not record starts — this also stops DDL text
embedded mid-line in string data from minting phantom tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: synthetic table bucket for INSERT statements the parser could not
#: attribute (no parseable table name or no VALUES tuple list). The
#: reference drops such lines silently; we surface them so a reconcile
#: against source-of-truth counts can flag the gap.
UNPARSEABLE = "__unparseable__"

# identifier = optionally-quoted segments; the TABLE NAME is the LAST
# segment, so `db`.`tbl`, db.tbl, `db`.tbl and plain tbl all resolve to
# 'tbl' — a single [`"]?-prefixed char class truncated `db`.`tbl` to 'db'
# and collapsed a whole schema-qualified dump into one bucket (ADVICE r4)
_QSEG = r'(?:`[^`]+`|"[^"]+"|[A-Za-z0-9_$]+)'
_IDENT_LAST = r'(?:' + _QSEG + r'\.)*(?:[`"]?([A-Za-z0-9_$]+)[`"]?)'
_CREATE_TABLE = (
    r'(?im)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?' + _IDENT_LAST
)
_INSERT_TABLE = r'(?im)^\s*INSERT\s+INTO\s+' + _IDENT_LAST
_VALUES_TUPLES = r"(?is)VALUES\s*(\(.*)"


def _sniff_one(path: str) -> str:
    """Statement delimiter from the first 64 KB of ONE dump file:
    ``;\\r\\n`` for CRLF-terminated (Windows-produced) dumps, else
    ``;\\n``. Decided from the FIRST line terminator (the dump's own
    convention), not a substring search — string data later in the head
    may embed ';\\r\\n' inside an LF file and must not flip the
    delimiter."""
    try:
        with open(path, "rb") as f:
            head = f.read(65536)
        i = head.find(b"\n")
        if i > 0 and head[i - 1 : i] == b"\r":
            return ";\r\n"
    except OSError:
        pass  # unreadable head -> assume LF; the scan itself surfaces real IO errors
    return ";\n"


def _input_groups(path: str) -> list[tuple[str, list[str]]]:
    """Expand a local path/glob/directory into files GROUPED by their
    sniffed statement delimiter, so a directory mixing LF and CRLF dumps
    parses each file with its own terminator (one first-file sniff applied
    to all files made every non-matching file collapse into a single
    record — silent undercount; ADVICE r4). Scheme'd paths (s3a://,
    hdfs://) can't be head-read from the driver and default to LF, which
    every mysqldump produced on a POSIX host uses (pass pre-normalized
    dumps otherwise)."""
    import glob as _glob
    import os

    local = path[7:] if path.startswith("file://") else path
    if "://" in local:
        return [(";\n", [path])]
    files: list[str] = []
    for p in sorted(_glob.glob(local)) or [local]:
        if os.path.isdir(p):
            files.extend(
                sorted(q for q in _glob.glob(os.path.join(p, "*")) if os.path.isfile(q))
            )
        else:
            files.append(p)
    groups: dict[str, list[str]] = {}
    for f in files:
        groups.setdefault(_sniff_one(f), []).append(f)
    return sorted(groups.items()) or [(";\n", [path])]


def parse_sql_dump_counts(
    spark: SparkSession, path: str, include_unparseable: bool = True
) -> DataFrame:
    """Per-table row counts from INSERT statements.

    Rows per statement = count of top-level tuple separators ``),(``
    (whitespace/newlines allowed between them) + 1, the same '(' row-start
    counting the reference does (src/utils.py:375-383) — string values that
    themselves contain ``),(`` miscount identically in both engines. Tables
    that appear in CREATE TABLE (``IF NOT EXISTS`` included) but have no
    INSERT rows count 0. INSERT statements with no parseable table name or
    VALUES list are counted under :data:`UNPARSEABLE` (omit with
    ``include_unparseable=False``) rather than silently dropped.
    """
    from functools import reduce

    parts = [
        spark.read.option("lineSep", sep).text(fs)
        for sep, fs in _input_groups(path)
    ]
    stmts = reduce(DataFrame.unionAll, parts)
    created = (
        stmts.select(
            F.regexp_extract("value", _CREATE_TABLE, 1).alias("table_name")
        )
        .filter(F.col("table_name") != "")
        .distinct()
    )
    parsed = (
        stmts.filter(F.col("value").rlike(r"(?im)^\s*INSERT\s+INTO"))
        .select(
            F.regexp_extract("value", _INSERT_TABLE, 1).alias("table_name"),
            F.regexp_extract("value", _VALUES_TUPLES, 1).alias("tuples"),
        )
        .select(
            F.when(
                (F.col("table_name") == "") | (F.col("tuples") == ""),
                F.lit(UNPARSEABLE),
            )
            .otherwise(F.col("table_name"))
            .alias("table_name"),
            F.when(
                (F.col("table_name") == "") | (F.col("tuples") == ""), F.lit(0)
            )
            .otherwise(F.size(F.split(F.col("tuples"), r"\)\s*,\s*\(")))
            .cast("long")
            .alias("n_rows"),
        )
    )
    inserts = parsed.groupBy("table_name").agg(
        F.sum("n_rows").alias("n_rows"), F.count("*").alias("n_stmts")
    )
    out = (
        created.join(inserts, "table_name", "full")
        .withColumn("n_rows", F.coalesce(F.col("n_rows"), F.lit(0)))
        .withColumn("n_stmts", F.coalesce(F.col("n_stmts"), F.lit(0)))
    )
    # keep unattributed-INSERT accounting unless told otherwise
    if not include_unparseable:
        out = out.filter(F.col("table_name") != UNPARSEABLE)
    return out.select("table_name", "n_rows", "n_stmts")
