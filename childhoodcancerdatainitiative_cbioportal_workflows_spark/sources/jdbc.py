"""JDBC export / restore flows (reference: ``workflows/export_db.py:8``,
``workflows/restore_db.py:16``, ``src/utils.py:151-452``).

The reference shells out to mysqldump/mysql and reconciles per-table
row/column counts by parsing the dump text. Spark-native shape:

* export  — ``spark.read.jdbc`` per table (predicate-partitioned for big
  tables) -> partitioned parquet snapshot + a counts manifest
* restore — parquet snapshot -> ``df.write.jdbc`` + count reconciliation
  (reusing :func:`..operators.reconcile.reconcile_counts`)

mysqldump's ``--single-transaction`` consistency maps to reading all tables
at one snapshot: pass ``options={"isolationLevel": ...}`` or export from a
replica; Spark cannot impose cross-table transactionality on its own.

Tested live against embedded Apache Derby (ships in Spark's jars) —
tests/test_runner_jdbc.py runs a real write.jdbc/read.jdbc round-trip with
count reconciliation; the parquet/reconcile halves are additionally covered
driver-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.reconcile import reconcile_counts


def table_counts(dfs: dict[str, DataFrame], count_col: str) -> DataFrame:
    """(table_name, n_rows, n_cols) manifest — the dump ledger of
    src/utils.py:301-452."""
    spark = next(iter(dfs.values())).sparkSession
    rows = [
        (name, df.count(), len(df.columns)) for name, df in dfs.items()
    ]
    return spark.createDataFrame(rows, f"table_name string, {count_col} long, n_cols int")


def export_tables(
    spark: SparkSession,
    url: str,
    tables: list[str],
    out_dir: str,
    options: dict[str, str] | None = None,
    partition_options: dict[str, dict] | None = None,
) -> DataFrame:
    """DB -> parquet snapshot (export_db semantics). Returns the counts
    manifest. ``partition_options[table]`` may carry
    (partitionColumn, lowerBound, upperBound, numPartitions) for parallel
    reads of big tables — the scale path; unpartitioned JDBC reads are
    single-threaded."""
    dfs: dict[str, DataFrame] = {}
    for t in tables:
        reader = spark.read.format("jdbc").option("url", url).option("dbtable", t)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        for k, v in (partition_options or {}).get(t, {}).items():
            reader = reader.option(k, str(v))
        df = reader.load()
        df.write.mode("overwrite").parquet(os.path.join(out_dir, t))
        dfs[t] = spark.read.parquet(os.path.join(out_dir, t))
    counts = table_counts(dfs, "expected")
    counts.write.mode("overwrite").parquet(os.path.join(out_dir, "_counts"))
    return counts


def restore_tables(
    spark: SparkSession,
    snapshot_dir: str,
    url: str,
    tables: list[str],
    options: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """parquet snapshot -> DB + reconciliation (restore_db.py:101-120
    semantics: per-table expected vs restored counts, mismatch flags)."""
    restored: dict[str, DataFrame] = {}
    for t in tables:
        df = spark.read.parquet(os.path.join(snapshot_dir, t))
        writer = df.write.format("jdbc").option("url", url).option("dbtable", t)
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.mode(mode).save()
        reader = spark.read.format("jdbc").option("url", url).option("dbtable", t)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        restored[t] = reader.load()
    return reconcile_restore(spark, snapshot_dir, restored)


def reconcile_restore(
    spark: SparkSession, snapshot_dir: str, restored: dict[str, DataFrame]
) -> DataFrame:
    """The count-reconciliation half of restore_db, separable so it can run
    (and be tested) against any pair of snapshot/restored table sets."""
    expected = spark.read.parquet(os.path.join(snapshot_dir, "_counts")).select(
        "table_name", "expected"
    )
    observed = table_counts(restored, "observed").select("table_name", "observed")
    return reconcile_counts(expected, observed, ["table_name"])
