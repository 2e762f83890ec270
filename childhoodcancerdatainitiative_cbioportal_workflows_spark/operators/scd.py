"""Slowly-changing-dimension (SCD type 2) interval builder.

Turns a keyed change stream (one row per state change) into validity
intervals: each row becomes [valid_from = its ts, valid_to = next
change's ts) per key, with the current row open (null valid_to). The
standard warehouse CDC materialization; the reference's closest shape is
its resume/append bookkeeping (vcf_anno.py:542-634), which tracks only
the latest state.

One shuffle on the key; the interval edge is a single ``lead`` window.
Deterministic under ties via the ``tiebreak`` column (same discipline as
the other order-sensitive operators).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    tiebreak: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Append validity-interval columns: ``valid_from`` (the row's ts),
    ``valid_to`` (next change's ts per key, null when current) and an
    ``is_current`` flag."""
    order = [F.col(ts).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(ts)).over(w)
    return df.select(
        *df.columns,
        F.col(ts).alias(valid_from),
        nxt.alias(valid_to),
        nxt.isNull().alias(current_flag),
    )
