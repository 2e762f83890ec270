"""Fixed-point lattice validation — the fail-fast contract behind every
exact order-statistics operator.

``exact_quantiles`` / ``grouped_quantiles`` / ``mad_anomalies`` and the
decay family are exact ONLY when inputs land exactly on a 1/``grid``
fixed-point lattice (prices in cents, counts, basis points): their first
step, ``round(v * grid)``, silently QUANTIZES anything else, and the
resulting ranks are plausible-but-unanchored — the worst failure mode at
100 TB, where nobody eyeballs the rows. This module turns that
docstring-only precondition (r8 verdict task 7) into a validated
contract: one map-side-combinable aggregate proves every value is
lattice-aligned, or the run dies with the measured violation before any
expensive shuffle.

Scale shape: ``agg(max(...), count_if(...))`` — a single scan with a
map-side partial, no shuffle beyond one row per partition, so the guard
is free relative to any operator it protects. NULLs are ignored (the
operators exclude them anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class LatticeViolation(ValueError):
    """Raised when a column is not aligned to the declared 1/grid lattice."""


def lattice_deviation(df: DataFrame, col: str, grid: int = 100) -> DataFrame:
    """One-row report of how far ``df[col]`` strays from the 1/``grid``
    lattice: (n_values, n_off_lattice, max_abs_deviation) where deviation
    is the ROUND-TRIP error ``abs(v - round(v*grid)/grid)``. The naive
    ``v*grid == round(v*grid)`` test would flag every honest cents value
    (317.40*100 = 31739.999999999996 in binary floating point); the real
    contract is that quantization is LOSSLESS — v is the closest double
    to its lattice point, so ``round(v*grid)/grid`` reproduces v bit-for-
    bit. 0 deviation for every row means exact-order-statistics operators
    are exact on this column; anything else means they would silently
    quantize. (Exactness of the test itself requires |v*grid| < 2^53 —
    the same int64/double envelope the operators assume.)"""
    dev = F.abs(F.col(col) - F.round(F.col(col) * grid) / grid)
    return df.filter(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.coalesce(
            F.sum((dev > 0).cast("long")), F.lit(0)
        ).alias("n_off_lattice"),
        F.coalesce(F.max(dev), F.lit(0.0)).alias("max_abs_deviation"),
    )


def raise_if_off_lattice(
    col: str, grid: int, n_values: int, n_off: int, max_dev: float
) -> None:
    """Shared raise for pre-measured deviation counters — lets operators
    FUSE the lattice check into an aggregate pass they already run (r16
    verdict task 5: a separate validation pre-scan is a second full read
    of the column at 100 TB) while keeping one error contract."""
    if n_off and n_off > 0:
        raise LatticeViolation(
            f"column {col!r} is not on the 1/{grid} lattice: "
            f"{n_off}/{n_values} values off-lattice, "
            f"max |v - round(v*{grid})/{grid}| = {max_dev} "
            "— exact order statistics would silently quantize; pass data "
            "already aligned to the grid (or widen the grid)"
        )


def validate_lattice(df: DataFrame, col: str, grid: int = 100) -> None:
    """Fail fast unless every non-NULL value of ``df[col]`` sits exactly
    on the 1/``grid`` lattice. Raises :class:`LatticeViolation` with the
    measured off-lattice count and worst deviation; returns None when the
    contract holds. Cost: one narrow scan with a map-side partial max."""
    row = lattice_deviation(df, col, grid).first()
    if row is not None:
        raise_if_off_lattice(
            col, grid, row["n_values"], row["n_off_lattice"],
            row["max_abs_deviation"],
        )
