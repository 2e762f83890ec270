"""Wide gene x sample matrix pivot.

The reference pivots long CNV tables into wide matrices
(``workflows/cnv.py:650-684``, ``pedmatch-clinical-vcf-workflow.py:258-284``)
and *catches pandas' ValueError* on duplicate (index, column) pairs
(``cnv.py:664-666``). Spark's ``groupBy().pivot().agg(first())`` silently
picks one value instead, so uniqueness is asserted explicitly first.

Scale note (SURVEY §4): a pivot is two jobs (distinct column values, then
agg) and is bounded by ``spark.sql.pivotMaxValues``. Cohorts (<= thousands of
samples) are fine; at the 100 TB north star keep the long format canonical
and emit wide matrices only at the sink edge — this operator IS that edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class DuplicateCellError(ValueError):
    pass


def _q(name: str) -> str:
    """Backtick-quote a column name so dotted names (seg.mean, loc.start —
    the cBio formats love them) resolve as single identifiers."""
    return f"`{name}`" if "." in name and not name.startswith("`") else name


def assert_unique_cells(df: DataFrame, index: str, column: str) -> None:
    dup = (
        df.groupBy(df[_q(index)], df[_q(column)])
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise DuplicateCellError(
            f"duplicate ({index}, {column}) pairs — pivot would be ambiguous"
        )


def wide_matrix_lines(
    df: DataFrame,
    index: str,
    column: str,
    value: str,
    column_values: list[str],
    fill: str = "NA",
    sep: str = "\t",
) -> DataFrame:
    """The 100 TB path for gene x sample matrices (SURVEY §4: pivot width).

    ``groupBy().pivot()`` materializes one Spark column per sample and is
    bounded by ``spark.sql.pivotMaxValues``; at cohort widths beyond that,
    the wide TSV is produced as TEXT: one aggregation builds a
    sample -> value map per gene, one projection formats the row string in
    the fixed ``column_values`` order. Distributed end to end, no wide
    schema ever exists; write with ``spark.read...text`` semantics
    (header prepended by the caller or via union).

    Returns (index, line) — line is the tab-joined row.
    """
    q = _q
    maps = df.groupBy(df[q(index)]).agg(
        F.map_from_entries(
            F.collect_list(F.struct(df[q(column)], df[q(value)].cast("string")))
        ).alias("_m")
    )
    return maps.select(
        F.col(q(index)).alias(index),
        F.concat_ws(sep, F.col(q(index)).cast("string"), *[
            F.coalesce(F.col("_m").getItem(cv), F.lit(fill)) for cv in column_values
        ]).alias("line"),
    )


def to_wide_matrix(
    df: DataFrame,
    index: str,
    column: str,
    value: str,
    fill=None,
    check_unique: bool = True,
    column_values: list | None = None,
) -> DataFrame:
    """Long -> wide: rows = index, one column per ``column`` value, cells =
    ``value``; ``fill`` replaces missing cells (reference fills 'NA'/0).
    Pass ``column_values`` when known to skip the distinct-values job."""
    if check_unique:
        assert_unique_cells(df, index, column)
    piv = (
        df.groupBy(df[_q(index)])
        .pivot(column, column_values)
        .agg(F.first(df[_q(value)]))
    )
    if fill is not None:
        piv = piv.na.fill(fill)
    return piv
