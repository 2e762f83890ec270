"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of the fact-to-fact joins (MAF x af-table,
segments x gene-map, lineitem x orders) is the shuffle. Writing both sides
bucketed by the join key lets Spark plan a SortMergeJoin with NO Exchange:
each bucket pair joins locally. The price is paid once at write time and
amortized over every subsequent join/aggregation on the bucket key.

Bucketing requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` files carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-task sort from
    SortMergeJoin reads."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``path/col=value/...``).

    The scan-side payoff is partition PRUNING: a filter on a partition
    column never opens the other directories at all (visible as
    ``PartitionFilters`` in the scan node), which is the difference
    between reading one day and reading 100 TB when queries are
    time/study-scoped. Choose low-cardinality columns (date, study,
    chromosome); high-cardinality partitioning drowns the driver in
    file metadata — bucket instead (:func:`write_bucketed`)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
