"""Embedding quantization.

At 100 TB an ``array<float>`` embedding column dominates storage and
shuffle width; int8 scalar quantization cuts both 4x, which is what makes
the ANN index families in :mod:`.similarity` shippable (the IVF inverted
lists and LSH buckets carry the quantized vectors, de-quantizing only for
the final verify pass). No reference analogue (the reference has no
embedding surface); the operator follows the standard symmetric per-vector
scheme (FAISS ``ScalarQuantizer`` shape, public knowledge).

Everything is a per-row projection over built-in higher-order functions —
no shuffle, no UDF, fully codegen'd, and deterministic: the rounding is an
explicit ``floor(x*127/scale + 0.5)`` over doubles so any engine computing
the same expression bit-matches (IEEE double ops are exact given the same
parenthesization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def max_abs(vec: Column) -> Column:
    """Per-vector max |x| as double (the symmetric quantization scale)."""
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def quantize_vec(vec: Column, scale: Column) -> Column:
    """int8-range codes: floor(x/scale*127 + 0.5), clamped to [-127, 127].
    A zero vector (scale 0) quantizes to all zeros."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / scale * F.lit(127.0) + F.lit(0.5)).cast(
                        "int"
                    ),
                ),
            )
        )
        .cast("int"),
    )


def dequantize_vec(qvec: Column, scale: Column) -> Column:
    """Inverse map q -> q*scale/127 (array<double>)."""
    return F.transform(qvec, lambda q: q.cast("double") * scale / F.lit(127.0))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "qvec",
    scale_col: str = "scale",
    err_col: str | None = "max_err",
) -> DataFrame:
    """Quantize ``vec_col`` to int8 codes plus a per-vector scale.

    ``err_col`` (optional) carries the max absolute reconstruction error —
    the quality audit a real pipeline stores next to the index. Bounded by
    scale/254 for in-range values, so it doubles as a self-check."""
    # STAGE the scale in its own projection: HOF lambda arguments are
    # inlined, so passing the array_max expression directly into
    # quantize_vec would recompute it once PER ELEMENT (a |vec|x blowup,
    # measured 64x here). As a staged column it is computed once per row
    # and referenced by the lambda.
    staged = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        max_abs(F.col(vec_col)).alias(scale_col),
    )
    out = staged.select(
        F.col(id_col),
        F.col(scale_col),
        quantize_vec(F.col("_v"), F.col(scale_col)).alias(out_col),
        F.col("_v"),
    )
    if err_col is not None:
        recon = dequantize_vec(F.col(out_col), F.col(scale_col))
        out = out.withColumn(
            err_col,
            F.array_max(
                F.zip_with(
                    F.col("_v"),
                    recon,
                    lambda v, r: F.abs(v.cast("double") - r),
                )
            ),
        )
    return out.drop("_v")
