"""Random-projection dimensionality reduction (Johnson–Lindenstrauss).

Sparse sign projection (Achlioptas 2003, public result): entries of the
projection matrix are drawn from {+1, 0, -1} with probabilities
{1/6, 2/3, 1/6}; pairwise distances are preserved in expectation up to a
constant factor (callers compare projected vectors to each other, so the
sqrt(3)/sqrt(k) scaling constant is irrelevant and omitted).

Determinism across engines is the design constraint here: floating-point
sums are order-sensitive, so the projection runs in FIXED-POINT — each
component is rounded once to an integer at 1e-9 resolution
(``round(x * 1e9) -> bigint``), and the signed sum of 64-bit integers is
exact and order-free. The output is the fixed-point bigint; divide by 1e9
for the float value. |x| <= 2 and dim <= 2^12 keeps the sum far inside
int64.

The matrix is generated from a seeded PRNG and inlined as an array
LITERAL into the plan (one JVM parse, broadcast with the plan — the same
pattern as the ANN hyperplane literals in .similarity). The whole
operator is a per-row zip_with/aggregate fold: zero shuffles, zero UDFs.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F

FIXED_POINT = 1_000_000_000  # 1e9: 9 decimal digits, exact in int64


def projection_matrix(k: int, dim: int, seed: int = 42) -> list[list[int]]:
    """k x dim sparse sign matrix, deterministic in (k, dim, seed)."""
    rng = random.Random(seed)
    return [
        [rng.choice((1, 0, 0, 0, 0, -1)) for _ in range(dim)] for _ in range(k)
    ]


def _fixed(v: Column) -> Column:
    return F.round(v.cast("double") * F.lit(float(FIXED_POINT)), 0).cast("long")


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int = 64,
    seed: int = 42,
    prefix: str = "p",
) -> DataFrame:
    """Project ``vec_col`` (length must be exactly ``dim``) onto ``k``
    random sign vectors; output columns ``p0..p{k-1}`` are exact
    fixed-point bigints (value * 1e9)."""
    mat = projection_matrix(k, dim, seed)
    outs = []
    for j, row in enumerate(mat):
        plane = F.array(*[F.lit(p) for p in row])
        term = F.zip_with(F.col(vec_col), plane, lambda v, p: _fixed(v) * p)
        outs.append(
            F.aggregate(term, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
                f"{prefix}{j}"
            )
        )
    return df.select(F.col(id_col), *outs)


def projection_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int = 64,
    seed: int = 42,
    prefix: str = "p",
) -> str:
    """DuckDB oracle for :func:`random_projection` over the same inlined
    matrix (list_sum widens to HUGEINT; cast back to BIGINT)."""
    mat = projection_matrix(k, dim, seed)
    cols = []
    for j, row in enumerate(mat):
        lit = "[" + ", ".join(str(p) for p in row) + "]"
        cols.append(
            f"CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
            f"CAST(ROUND(CAST({vec_col}[i] AS DOUBLE) * 1e9, 0) AS BIGINT)"
            f" * ({lit})[i])) AS BIGINT) AS {prefix}{j}"
        )
    return f"SELECT {id_col}, " + ", ".join(cols) + f" FROM {table}"
