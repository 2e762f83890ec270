"""Order-explicit dedup operators.

The reference relies on pandas implicit row order for
``sort_values(...).drop_duplicates(subset, keep='first')``
(``workflows/cnv.py:372,376``) and for source-preference dedup
(``workflows/mci_clinical_variant_merge.py:263-282``). Spark has no implicit
row order, so both become ``row_number()`` windows over an *explicit* key —
deterministic under any partitioning, which the oracle comparisons require.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def keep_first(
    df: DataFrame,
    subset: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """``sort_values(order_by).drop_duplicates(subset, keep='first')``.

    ``order_by`` must be a total order within each ``subset`` group for the
    result to be deterministic (append a tiebreaker column when in doubt).
    """
    w = Window.partitionBy(*subset).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def keep_first_per_run(
    df: DataFrame,
    subset: Sequence[str],
    run_col: str,
    order_by: Sequence[Column | str],
) -> DataFrame:
    """``keep_first(df, [*subset, run_col], order_by)`` with the window
    EXCHANGE keyed on ``subset`` alone: rows sort by (run_col, order_by)
    inside each ``subset`` partition and only the first row of each
    run_col run survives — one row per (subset, run_col) group, chosen
    by ``order_by``. Use when a downstream join/aggregate hashes on
    ``subset``: the straightforward superset-key window would partition
    on (subset, run_col) and force a SECOND shuffle for the join, while
    this shape lets the join reuse the window's exchange.
    ``run_col`` must be non-NULL (a NULL run would merge into the
    partition head under lag's NULL)."""
    w = Window.partitionBy(*subset).orderBy(F.col(run_col).asc(), *order_by)
    return (
        df.withColumn("_prev_run", F.lag(run_col).over(w))
        .filter(
            F.col("_prev_run").isNull()
            | (F.col("_prev_run") != F.col(run_col))
        )
        .drop("_prev_run")
    )


def keep_topk(
    df: DataFrame,
    subset: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group (the k>1 generalization of :func:`keep_first`).

    One shuffle on ``subset``; ``row_number`` (not ``rank``) so exactly k
    rows survive per group under a total ``order_by`` — deterministic under
    any partitioning. When ``rank_col`` is given the 1-based position is
    kept in the output."""
    w = Window.partitionBy(*subset).orderBy(*order_by)
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    if rank_col is None:
        return out.drop("_rn")
    return out.withColumnRenamed("_rn", rank_col)


def dedup_with_preference(
    df: DataFrame,
    keys: Sequence[str],
    preference: Column,
    tiebreak: Sequence[Column | str] = (),
) -> DataFrame:
    """Keep one row per ``keys``, preferring rows where ``preference`` sorts
    first (ascending). Mirrors mci_clinical_variant_merge.py:263-282, where
    clinically-reported rows (preference 0) win over raw MAF rows
    (preference 1) on a 7-column variant key."""
    order = [preference.asc(), *tiebreak]
    return keep_first(df, keys, order)
