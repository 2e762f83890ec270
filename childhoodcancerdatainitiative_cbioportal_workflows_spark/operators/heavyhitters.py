"""Exact distributed heavy hitters via a Misra-Gries candidate pre-pass.

The naive plan — ``groupBy(value).count()`` then filter — shuffles one
row per DISTINCT value per input partition. On a web-scale token / URL /
fingerprint universe that shuffle payload IS the vocabulary, which at
100 TB dwarfs the answer (the handful of values above the support
threshold). The classic two-phase fix (Misra-Gries '82; summary
mergeability per Agarwal et al., "Mergeable Summaries", PODS '12):

1. **Candidate pass** — each partition folds its rows through a bounded
   Misra-Gries summary of ``k`` counters (Arrow-batched ``mapInPandas``;
   the per-batch ``value_counts`` is vectorized C and the summary merge
   touches at most ``k`` + batch-vocabulary keys, so no row-at-a-time
   Python runs). Pigeonhole guarantee: a value with global frequency
   ≥ n/T exceeds n_p/T in at least one partition, and an MG summary with
   ``k ≥ 2T`` retains every such value there (per-partition MG error is
   at most n_p/(k+1) < n_p/T). Each partition emits ≤ k candidate rows —
   the ONLY thing this pass sends to the driver-side collect-free
   ``distinct``.
2. **Exact recount** — a broadcast join filters the base scan down to
   candidate values BEFORE the aggregation shuffle, so the exchange
   carries candidate rows only; the final ``freq ≥ ceil(n/T)`` filter
   makes the output EXACT and independent of partitioning / batch order
   (the MG pass can only over-select, never drop a true heavy hitter —
   pinned by a repartition-sweep property test).

Reference parity: the reference's pandas ``value_counts()`` QA audits
(`/root/reference/workflows/cnv.py` count checks) are the small-data
shape of this; two-phase heavy hitters is the corpus-scale
generalization a 100 TB token pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructField, StructType


def _mg_candidates(k: int):
    """mapInPandas fold: one bounded Misra-Gries summary per partition.

    State is a pandas Series (value -> surviving count) carried across
    the partition's Arrow batches. The prune step subtracts the
    (k+1)-largest counter from all counters and drops the non-positive
    remainder — the PODS'12 merge rule, which keeps at most k counters
    and bounds the total decrement by n_p/(k+1).
    """
    import pandas as pd

    def fold(batches):
        counters = None
        for pdf in batches:
            bc = pdf["_x"].value_counts()
            counters = bc if counters is None else (
                bc.add(counters, fill_value=0).astype("int64")
            )
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield counters.rename_axis("_x").reset_index()[["_x"]]

    return fold


def heavy_hitters(
    df: DataFrame,
    col: str,
    support_inv: int,
    mg_k: int | None = None,
    freq_col: str = "freq",
    allow_undersized: bool = False,
) -> DataFrame:
    """All values of ``col`` with frequency ≥ ceil(n / support_inv), with
    their EXACT counts — computed with a vocabulary-independent shuffle.

    ``mg_k`` (candidate counters per partition) defaults to
    ``2 * support_inv``, the smallest power-of-safety satisfying the
    superset guarantee with strict margin. The single driver round-trip
    is one scalar (``n``); candidates stay distributed and re-enter via
    ``broadcast``.
    """
    if support_inv < 1:
        raise ValueError("support_inv must be >= 1")
    k = mg_k if mg_k is not None else 2 * support_inv
    if k < 2 * support_inv and not allow_undersized:
        # k < 2T voids the pigeonhole superset guarantee: an adversarial
        # partition split can prune a TRUE heavy hitter from every
        # summary and the output is silently incomplete, not just
        # over-selected. Opt in explicitly for best-effort mode.
        raise ValueError(
            f"mg_k={k} < 2*support_inv={2 * support_inv} voids the exactness "
            "guarantee; pass allow_undersized=True for best-effort candidates"
        )
    staged = df.select(F.col(col).alias("_x")).filter(
        F.col("_x").isNotNull()
    ).persist()
    try:
        n = staged.count()
        if n == 0:
            return staged.select(
                F.col("_x").alias(col), F.lit(0).cast("bigint").alias(freq_col)
            ).limit(0)
        threshold = (n + support_inv - 1) // support_inv
        schema = StructType([StructField("_x", staged.schema["_x"].dataType)])
        cand = staged.mapInPandas(_mg_candidates(k), schema).distinct()
        out = (
            staged.join(F.broadcast(cand), "_x")
            .groupBy("_x")
            .agg(F.count(F.lit(1)).alias(freq_col))
            .filter(F.col(freq_col) >= F.lit(threshold))
            .select(F.col("_x").alias(col), freq_col)
        )
        # materialize before unpersist: the recount re-reads the staged
        # cache, so the cache must outlive the action. localCheckpoint is
        # eager and truncates the lineage back to the cached scan. The
        # checkpoint's blocks ride the returned plan's cache list so
        # release_plan_caches frees them deterministically (r18: un-handled,
        # every call leaked one RDD to async GC).
        from ..llm.dedup import _CheckpointHandle, _with_caches

        ck = out.localCheckpoint(eager=True)
        return _with_caches(ck, [_CheckpointHandle(ck)])
    finally:
        staged.unpersist()
