"""Reciprocal-rank fusion (RRF) of retrieval rankings.

Hybrid retrieval — lexical BM25 (llm/relevance) + dense cosine
(llm/similarity) — is the standard corpus-search stack; RRF
(Cormack/Clarke/Büttcher, SIGIR '09) is the standard way to merge their
rankings without score calibration: ``score(d) = Σ_lists 1/(k + rank_d)``.

Certifiability: the textbook formula sums floats; this implementation
scores in integer fixed point — each list contributes
``scale div (k + rank)`` with BIGINT ``div`` — so fused scores are exact
integers, identical across engines and partitionings, and ties are
broken by document id. Ranks are ints by construction, which is what
makes RRF (unlike score averaging) amenable to exact arithmetic.

Plan shape: union of the (tiny) ranking lists, one keyed aggregation.
Rankings are top-k projections of their retrievers, so the fusion input
is k·lists rows regardless of corpus size — the whole operator is
broadcast-scale at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    scale: int = 10**9,
    topn: int | None = None,
) -> DataFrame:
    """Fuse rank lists into (id, rrf_fp, n_lists), rrf_fp descending.

    Each input must carry ``id_col`` and an integer ``rank_col``
    (1-based). ``rrf_fp = Σ scale div (k_const + rank)``; ``n_lists``
    counts how many input lists contained the document.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = None
    for r in rankings:
        part = (
            r.select(
                F.col(id_col).alias("_id"),
                F.col(rank_col).cast("bigint").alias("_r"),
            )
            # a retriever may emit the same document more than once (e.g.
            # one row per matching chunk); RRF counts each LIST once per
            # document, best rank wins — without this, a duplicated doc
            # double-dips its reciprocal contribution AND inflates
            # n_lists past the number of lists
            .groupBy("_id")
            .agg(F.min("_r").alias("_r"))
        )
        tagged = part if tagged is None else tagged.unionAll(part)
    fused = (
        tagged.withColumn(
            "_c", F.expr(f"CAST({scale} AS BIGINT) div ({k_const} + _r)")
        )
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("rrf_fp"),
            F.count(F.lit(1)).alias("n_lists"),
        )
    )
    if topn is not None:
        # TakeOrderedAndProject, never a global sort
        fused = fused.orderBy(F.col("rrf_fp").desc(), F.col("_id").asc()).limit(topn)
    return fused.select(F.col("_id").alias(id_col), "rrf_fp", "n_lists")
