"""Per-group MinHash signatures — the mergeable SET-SIMILARITY sketch.

Completes the portable sketch family (HLL = distinct count, Bloom =
membership, Count-Min = frequency) with resemblance: a fixed-size
signature per group whose j-wise minimum is mergeable across shards
exactly like HLL registers (MIN instead of MAX), and whose match rate
between two groups is an unbiased estimator of the token-set Jaccard.
Same portability discipline as operators/sketches: token ids are
md5-derived, the hash family is the certified universal family the LSH
dedup already uses ((a_j·x + b_j) mod M31, llm.minhash_universal_coeffs),
so a DuckDB oracle rebuilds every signature bit-exactly and the
ESTIMATION ERROR itself is certifiable (the ann_recall / lsh_recall
discipline applied to set similarity).

Scale shape: tokens explode into ``num_hashes`` plane rows, then ONE
map-side-combinable ``min`` per (group, plane) — the shuffle carries at
most ``num_hashes`` rows per group per partition, never the tokens.
Estimating all-pairs similarity over G groups costs a ``num_hashes``-key
equi-join of two G·num_hashes-row tables — independent of corpus size,
the reason sketch-then-estimate is the 100 TB corpus-overlap plan
(exact pairwise token intersections re-shuffle the full vocabulary per
pair).

Reference parity: the reference has no sketching; its cohort-overlap
checks are pandas set intersections (workflows' participant reconcile
steps). This is that comparison as a fixed-size mergeable artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MERSENNE31 = (1 << 31) - 1


def _token_base(col):
    """md5-derived token id on [0, M31): fold the first 8 hex nibbles
    (32 uniform bits) and reduce mod M31 — both engines compute this
    identically on the same md5 hex string."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % F.lit(
        MERSENNE31
    )


def minhash_group_signature(
    df: DataFrame,
    group_col: str,
    token_col: str,
    num_hashes: int = 64,
    seed: int = 7,
) -> DataFrame:
    """(group, j, h): the per-group MinHash signature — for each of
    ``num_hashes`` universal-hash planes, the minimum of
    ``(a_j·x + b_j) mod M31`` over the group's distinct non-NULL tokens
    (x = md5-derived token id; a_j·x < 2^62 stays in int64). Merge shard
    signatures with MIN on (group, j), exactly like HLL's MAX merge.
    Groups whose tokens are all NULL emit no rows (a NULL is not a set
    member — the sketch-family rule)."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_universal_coeffs,
    )

    a_co, b_co = minhash_universal_coeffs(num_hashes, seed)
    a_lit = ",".join(str(v) for v in a_co)
    b_lit = ",".join(str(v) for v in b_co)
    base = df.filter(F.col(token_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        _token_base(F.col(token_col)).alias("_x"),
    )
    planes = base.select(
        "g",
        F.explode(
            F.expr(
                f"transform(sequence(0, {num_hashes - 1}), j -> "
                f"struct(j AS j, (array({a_lit})[j] * _x + array({b_lit})[j]) "
                f"% {MERSENNE31} AS h))"
            )
        ).alias("_p"),
    )
    return (
        planes.select("g", F.col("_p.j").alias("j"), F.col("_p.h").alias("h"))
        .groupBy("g", "j")
        .agg(F.min("h").alias("h"))
    )


def jaccard_estimate_pairs(
    sig: DataFrame, max_groups: int | None = 4096
) -> DataFrame:
    """All-pairs Jaccard estimates from one signature table: for every
    unordered group pair (g_a < g_b), (matches, k) where matches counts
    the planes whose minima agree — matches/k is the unbiased resemblance
    estimate, emitted as the two INTEGERS so the face stays bit-exact
    cross-engine (the caller divides if it wants the float).

    Scale contract (r9 verdict): the plane equi-join is G² in GROUP
    count — each of the k planes pairs every group with every other, so
    the intermediate is k·G² rows. That is by design for this operator's
    stated use, corpus-LEVEL overlap (G = datasets/sources/cohorts,
    thousands at most: G = 10³ at k = 64 is a 64M-row intermediate, a
    constant-cost join regardless of corpus bytes). It is the WRONG plan
    for entity-level groups — at G = 10⁶ the intermediate is 10¹²·k rows.
    ``max_groups`` enforces the boundary with one driver-side distinct
    count over the (G·k)-row signature table (parameter-sized, never
    data-sized); past it, use the banded MinHash-LSH path
    (llm.dedup.minhash_lsh), which buckets signatures so only in-band
    collisions ever pair. Pass ``max_groups=None`` to waive the guard.

    When the guard runs, ``sig`` is persisted first so the eager count
    does not compute the upstream signature pipeline (a full corpus
    scan + minhash aggregation) a second time when the returned join is
    materialized — the cache is parameter-sized (≤ max_groups·k rows);
    callers may ``sig.unpersist()`` after consuming the result."""
    if max_groups is not None:
        sig = sig.persist()
        n_g = sig.select("g").distinct().count()
        if n_g > max_groups:
            # the guard-trips path is exactly the one where the cache is
            # LARGER than parameter-sized — release it before raising
            sig.unpersist()
            raise ValueError(
                f"jaccard_estimate_pairs: {n_g} groups exceeds "
                f"max_groups={max_groups}; the all-pairs plane join is "
                "G^2 in group count — use llm.dedup.minhash_lsh banding "
                "for entity-scale group counts, or pass max_groups=None "
                "to waive"
            )
    a = sig.select(
        F.col("g").alias("g_a"), "j", F.col("h").alias("h_a")
    )
    b = sig.select(
        F.col("g").alias("g_b"), "j", F.col("h").alias("h_b")
    )
    out = (
        a.join(b, "j")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(
            F.sum((F.col("h_a") == F.col("h_b")).cast("long")).alias(
                "matches"
            ),
            F.count(F.lit(1)).alias("k"),
        )
    )
    if max_groups is not None:
        # ride the standard cache-list contract so release_plan_caches
        # frees the signature cache (r18: the "callers may unpersist"
        # convention leaked one cache per call in the bench loop)
        from ..llm.dedup import _with_caches

        return _with_caches(out, [sig])
    return out
