"""SQL-dump text scan: table/row counts from a mysqldump file.

The reference parses dump files line-by-line in 10k-line chunks with a
carry buffer (``src/utils.py:328-383``): count CREATE TABLE statements and
count VALUES tuples per INSERT INTO table. Spark version: distributed
``spark.read.text`` + regexp — no chunking logic needed, and a dump of any
size partitions across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def parse_sql_dump_counts(spark: SparkSession, path: str) -> DataFrame:
    """Per-table row counts from INSERT statements.

    mysqldump emits one-line batched inserts ``INSERT INTO `t` VALUES
    (...),(...);`` — rows per line = count of ``),(`` separators + 1
    (src/utils.py:375-383 counts '(' row-starts the same way). Tables that
    appear in CREATE TABLE but have no INSERT rows count 0.
    """
    lines = spark.read.text(path)
    created = (
        lines.select(
            F.regexp_extract("value", r"CREATE TABLE `([^`]+)`", 1).alias("table_name")
        )
        .filter(F.col("table_name") != "")
        .distinct()
    )
    inserts = (
        lines.filter(F.col("value").startswith("INSERT INTO"))
        .select(
            F.regexp_extract("value", r"INSERT INTO `([^`]+)`", 1).alias("table_name"),
            (
                F.size(F.split(F.col("value"), r"\),\s*\(")).cast("long")
            ).alias("n_rows"),
        )
        .filter(F.col("table_name") != "")
        .groupBy("table_name")
        .agg(F.sum("n_rows").alias("n_rows"))
    )
    return (
        created.join(inserts, "table_name", "left")
        .withColumn("n_rows", F.coalesce(F.col("n_rows"), F.lit(0)))
    )
