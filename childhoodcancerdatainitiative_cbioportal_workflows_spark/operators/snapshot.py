"""Snapshot diff: added / removed / changed rows between two table
versions by key.

The everyday data-ops question — "what changed between yesterday's load
and today's?" — is one keyed full-outer join: rows only in the new
snapshot are ``added``, only in the old are ``removed``, present in both
with any compare-column differing are ``changed``, else ``unchanged``.
The reference answers it with pandas count reconciliation after each
re-load (`/root/reference/workflows/cnv.py` count audits,
`/root/reference/utils/` dump/restore checks); this operator is the
row-level generalization that also says WHICH rows moved.

Comparison is direct column equality (null-safe ``eqNullSafe``), not a
hash of stringified values: cross-engine string formatting of doubles
differs, while value equality is bit-defined in both engines. For very
wide rows at 100 TB, pre-hash the compare columns into one binary
column on WRITE (both snapshots through the same writer) and diff that
— the join shape is unchanged.

Shuffle accounting: one full-outer join keyed on the snapshot key;
filters and column pruning reach both scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """(key…, status) for every key in either snapshot; ``status`` ∈
    added | removed | changed | unchanged."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    o = old.select(
        *[F.col(c).alias(c) for c in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        *[F.col(c).alias(c) for c in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    ).withColumn("_in_new", F.lit(True))
    j = o.join(n, key_cols, "full_outer")
    same = reduce(
        lambda acc, c: acc
        & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
        compare_cols,
        F.lit(True),
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*key_cols, status.alias(status_col))
