"""SQL-dump text scan: table/row counts from a mysqldump file.

The reference parses dump files line-by-line in 10k-line chunks with a
carry buffer (``src/utils.py:328-383``): count CREATE TABLE statements and
count VALUES tuples per INSERT INTO table. Spark version: distributed
``spark.read.text`` with a statement delimiter (``;\\n``) so one record =
one SQL statement regardless of dialect — extended inserts (one batched
``INSERT ... VALUES (...),(...);`` line), ``--skip-extended-insert`` dumps
(one tuple per INSERT), and pretty-printed multi-line tuple lists all
parse identically. The text source stays splittable on the custom
delimiter, so a dump of any size partitions across executors with no
chunk/carry logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: synthetic table bucket for INSERT statements the parser could not
#: attribute (no parseable table name or no VALUES tuple list). The
#: reference drops such lines silently; we surface them so a reconcile
#: against source-of-truth counts can flag the gap.
UNPARSEABLE = "__unparseable__"

_INSERT_TABLE = r'(?is)^\s*INSERT\s+INTO\s+[`"]?([A-Za-z0-9_$.]+)'
_VALUES_TUPLES = r"(?is)VALUES\s*(\(.*)"


def parse_sql_dump_counts(
    spark: SparkSession, path: str, include_unparseable: bool = True
) -> DataFrame:
    """Per-table row counts from INSERT statements.

    Rows per statement = count of top-level tuple separators ``),(``
    (whitespace/newlines allowed between them) + 1, the same '(' row-start
    counting the reference does (src/utils.py:375-383) — string values that
    themselves contain ``),(`` miscount identically in both engines. Tables
    that appear in CREATE TABLE but have no INSERT rows count 0. INSERT
    statements with no parseable table name or VALUES list are counted
    under :data:`UNPARSEABLE` (omit with ``include_unparseable=False``)
    rather than silently dropped.
    """
    stmts = spark.read.option("lineSep", ";\n").text(path)
    created = (
        stmts.select(
            F.regexp_extract(
                "value", r'(?is)CREATE\s+TABLE\s+[`"]?([A-Za-z0-9_$.]+)', 1
            ).alias("table_name")
        )
        .filter(F.col("table_name") != "")
        .distinct()
    )
    parsed = (
        stmts.filter(F.col("value").rlike(r"(?is)^\s*INSERT\s+INTO"))
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
    # keep unattributed-INSERT accounting unless told otherwise, but drop
    # phantom tables that came from neither CREATE nor a parsed INSERT
    if not include_unparseable:
        out = out.filter(F.col("table_name") != UNPARSEABLE)
    return out.select("table_name", "n_rows", "n_stmts")
