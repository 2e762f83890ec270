"""Consecutive-row pairing (fusion breakend pairing).

The reference iterates each ``FUSION_ID`` group in file order and takes rows
two-at-a-time as (site1, site2) (``workflows/pedmatch-clinical-vcf-workflow.py:123-151``).
pandas got the order from the implicit index; Spark needs an explicit order
column (add ``monotonically_increasing_id()`` at scan, or carry a file line
number). The pairing itself is a window: row_number -> pair index ->
``lead()`` pulls site2's columns onto site1's row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def pair_rows(
    df: DataFrame,
    group_col: str,
    order_col: str,
    pair_cols: Sequence[str],
    suffixes: tuple[str, str] = ("_1", "_2"),
    drop_unpaired: bool = True,
) -> DataFrame:
    """Within each ``group_col``, order by ``order_col`` and pair consecutive
    rows. Output: one row per pair with ``pair_cols`` duplicated under both
    suffixes, plus ``pair_id`` (0-based pair index within the group).

    Odd trailing rows are dropped when ``drop_unpaired`` (the reference's
    2-at-a-time loop simply never emits them)."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    rn = F.row_number().over(w)
    out = df.withColumn("_rn", rn).withColumn(
        "pair_id", F.floor((F.col("_rn") - 1) / 2)
    )
    for c in pair_cols:
        out = out.withColumn(f"{c}{suffixes[1]}", F.lead(c).over(w))
    # Partner detection must not depend on a nullable payload column: a real
    # second row whose pair_cols[0] is NULL is still a pair (the reference
    # emits it with NaN fields). lead over the row number is null iff the
    # group truly ends here.
    out = out.withColumn("_partner_rn", F.lead("_rn").over(w))
    # keep the first row of each pair; its lead() columns are the second row
    out = out.filter(F.col("_rn") % 2 == 1)
    for c in pair_cols:
        out = out.withColumnRenamed(c, f"{c}{suffixes[0]}")
    if drop_unpaired:
        out = out.filter(F.col("_partner_rn").isNotNull())
    return out.drop("_rn", "_partner_rn")
