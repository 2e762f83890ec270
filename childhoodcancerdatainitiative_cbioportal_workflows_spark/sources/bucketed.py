"""Bucketed table layout: pre-shuffled storage for exchange-free joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle.
Spark's table bucketing (``bucketBy`` + ``saveAsTable``) moves that
shuffle to WRITE time, once: both tables hash-partitioned into the same
number of buckets on the join key are co-located, and Catalyst plans the
join with NO Exchange on either side (the FileScan reports
``SelectedBucketsCount``; with ``sortBy`` the per-bucket sort is free
too). The price is a fixed bucket count chosen at write time — size it
so one bucket of the LARGER table fits an executor core's working set
(e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-compression; use
bucket counts with many divisors so differently-bucketed tables can
still coalesce 4.1+-style).

Bucket pruning: equality predicates on the bucket key scan only the
matching bucket's files. Both effects are plan-asserted in
``tests/test_partitioning.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    one_file_per_bucket: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table.
    ``path`` makes it external (data outside the warehouse dir). The
    write itself shuffles once on the keys — that is the point: pay the
    exchange at write time, never again at read time.

    The explicit ``repartition`` on the bucket keys is load-bearing at
    scale: Spark's bucketed writer hash-splits EVERY input task into up
    to ``n_buckets`` files, so without it a wide write produces
    tasks x buckets files (100k tasks x 4096 buckets = a 400M-small-
    files catastrophe on a 100 TB ingest). Repartitioning on the keys
    first uses the same Murmur3 pmod assignment as the bucket id, so
    each task holds exactly one bucket's rows and writes exactly ONE
    file per bucket (plan-asserted in tests/test_partitioning.py).
    This also makes the docstring's 'shuffles once' literal — the
    exchange is this repartition.

    Tradeoff (r12 advice): the repartition also CAPS write parallelism
    at ``n_buckets`` tasks and funnels any hot bucket key into a single
    task — a skewed ingest serializes on its largest bucket. For key
    distributions known to be skewed, pass
    ``one_file_per_bucket=False`` to skip the repartition and let the
    upstream task layout (and AQE) spread the hot key across writers,
    accepting up-to-tasks-per-bucket files in exchange; or pre-salt the
    hot keys upstream. The default favors the file-count contract
    because at 100 TB the small-files failure is table-wide and
    permanent while bucket skew costs one slow write."""
    staged = df
    if one_file_per_bucket:
        staged = df.repartition(n_buckets, *[F.col(f"`{k}`") for k in keys])
    writer = (
        staged.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet`` on the files would lose it and re-shuffle)."""
    return spark.table(table)
