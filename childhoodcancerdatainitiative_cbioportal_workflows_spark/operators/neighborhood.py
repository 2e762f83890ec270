"""Sorted-neighborhood dedup blocking (Hernández & Stolfo '95).

The third classic near-dup candidate-generation family next to LSH
(llm/dedup) and q-gram blocking (operators/fuzzy): sort records by a
normalized key and compare each record only with its ``window`` sorted
neighbors. Where LSH bounds candidates probabilistically, sorted
neighborhood bounds them STRUCTURALLY — exactly ``window`` comparisons
per row — which makes cost planning trivial at 100 TB.

Spark-scalable formulation: a global sort row_number is a single-
partition window, so the sort runs WITHIN blocks (a short prefix of the
normalized key partitions the window; the rest of the key orders it).
Neighbors never straddle a block boundary — the documented recall
trade-off every distributed sorted-neighborhood makes (multi-pass with
rotated keys is the standard recall fix and composes by union). Pair
fan-out is ≤ ``window`` per row, so carrying the token arrays through
the self-join is bounded, and the similarity test is integer-exact
Jaccard (``100·|A∩B| ≥ pct·|A∪B|`` cross-multiplied — no float
division anywhere).

Every step (row_number per block, rank-distance self-join, list
intersect) has a 1:1 DuckDB translation, so the operator is value-
certifiable, unlike hash-randomized blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
    ws_tokens,
)


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 3,
    block_prefix: int = 2,
    key_prefix: int = 16,
    min_pct: int = 40,
    key_col: str | None = None,
) -> DataFrame:
    """Candidate pairs from sorted-neighborhood blocking, kept when the
    distinct-token Jaccard similarity is ≥ ``min_pct`` percent.

    ``key_col`` optionally names a precomputed sort-key column (used by
    the multi-pass variant to rotate keys); default is the normalized
    text itself.

    Output: (id_a, id_b, n_inter, n_union); within a pass ``id_a``
    precedes ``id_b`` in the sort order — all integer columns,
    driver-sortable.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    norm = (
        F.col(key_col)
        if key_col is not None
        else F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    )
    staged = df.select(
        F.col(id_col).alias("_id"),
        F.substring(norm, 1, block_prefix).alias("_blk"),
        F.substring(norm, 1, key_prefix).alias("_key"),
        F.array_distinct(ws_tokens(F.lower(F.col(text_col)))).alias("_toks"),
    )
    w = Window.partitionBy("_blk").orderBy("_key", "_id")
    ranked = staged.withColumn("_rn", F.row_number().over(w))
    a = ranked.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        F.col("_rn").alias("_rn_a"),
        F.col("_toks").alias("_ta"),
    )
    b = ranked.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        F.col("_rn").alias("_rn_b"),
        F.col("_toks").alias("_tb"),
    )
    # EQUI-join on (block, neighbor rank): each left row explodes into
    # exactly `window` neighbor keys, so the join is a hash join with
    # bounded fan-out — never the per-block cartesian a `rank BETWEEN`
    # range condition would execute as
    pairs = a.withColumn(
        "_rn_b", F.explode(F.sequence(F.col("_rn_a") + 1, F.col("_rn_a") + window))
    ).join(b, ["_blk", "_rn_b"])
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    return (
        pairs.withColumn("n_inter", inter)
        .withColumn("n_union", union)
        # integer cross-multiplication; n_union = 0 (two empty token
        # sets) is defined as non-matching, and 100·0 ≥ pct·0 would
        # wrongly match — guard explicitly
        .filter(
            (F.col("n_union") > 0)
            & (F.lit(100) * F.col("n_inter") >= F.lit(min_pct) * F.col("n_union"))
        )
        .select("id_a", "id_b", "n_inter", "n_union")
    )


def sorted_neighborhood_multipass(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 3,
    block_prefix: int = 2,
    key_prefix: int = 16,
    min_pct: int = 40,
    passes: int = 2,
) -> DataFrame:
    """Hernández–Stolfo multi-pass sorted neighborhood: the standard
    recall fix for single-key blocking. Pass 0 sorts on the normalized
    text prefix; each further pass ROTATES the normalization (here:
    reversed normalized text, then token-sorted text), so records that a
    shared prefix never brings together get a second chance to be sorted
    adjacent. Pairs are unioned with ``id_a < id_b`` canonicalization
    and deduplicated; total cost is ``passes ×`` the bounded single-pass
    cost — still structurally linear, never quadratic.

    Output: distinct (id_a, id_b) candidate pairs that met ``min_pct``
    Jaccard in AT LEAST one pass (similarity is pass-invariant, so no
    per-pass scores are kept).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    keys = [
        norm,
        F.reverse(norm),
        F.array_join(F.array_sort(ws_tokens(F.lower(F.col(text_col)))), ""),
    ]
    if not 1 <= passes <= len(keys):
        # silently running fewer passes than requested would quietly
        # lower recall; fail loudly at the rotation-key budget
        raise ValueError(f"passes must be in [1, {len(keys)}], got {passes}")
    out = None
    for key_expr in keys[:passes]:
        staged = df.select(F.col(id_col).alias(id_col), F.col(text_col))
        p = sorted_neighborhood_pairs(
            staged.withColumn("_snkey", key_expr),
            id_col,
            text_col,
            window=window,
            block_prefix=block_prefix,
            key_prefix=key_prefix,
            min_pct=min_pct,
            key_col="_snkey",
        )
        # canonicalize: sort order differs per pass, so (a,b) vs (b,a)
        canon = p.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        out = canon if out is None else out.unionAll(canon)
    return out.distinct()
