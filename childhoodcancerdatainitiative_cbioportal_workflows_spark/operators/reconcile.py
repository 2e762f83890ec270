"""Count reconciliation — the reference's correctness surface.

Mirrors the expected-vs-observed checks: segment->gene mapping counts
(``workflows/cnv.py:686-711``), MAF concat line ledger
(``workflows/vcf_anno.py:400-446``), DB restore table counts
(``workflows/restore_db.py:101-120``). Pattern: full-outer join the two
count tables on their keys, null -> 0, flag mismatches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def reconcile_counts(
    expected: DataFrame,
    observed: DataFrame,
    keys: Sequence[str],
    expected_col: str = "expected",
    observed_col: str = "observed",
    mismatch_col: str = "mismatch",
) -> DataFrame:
    """Full-outer join on ``keys``; missing side counts as 0 (the reference's
    ``fillna(0)`` at cnv.py:695); mismatch flag where counts differ."""
    j = expected.join(observed, on=list(keys), how="outer")
    return (
        j.withColumn(expected_col, F.coalesce(F.col(expected_col), F.lit(0)))
        .withColumn(observed_col, F.coalesce(F.col(observed_col), F.lit(0)))
        .withColumn(mismatch_col, F.col(expected_col) != F.col(observed_col))
    )
