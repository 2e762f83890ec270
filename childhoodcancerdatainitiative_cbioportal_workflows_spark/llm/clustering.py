"""Embedding-space corpus clustering (SURVEY §7 P7).

Cluster-level corpus curation — topic bucketing, cluster-balanced
sampling, cluster-based near-dup pruning (SemDeDup-style) — needs exactly
one distributed primitive: assign every embedding to its nearest trained
centroid and aggregate per cluster. The quantizer is an offline artifact
(:func:`..llm.similarity.train_ivf_centroids` — seeded k-means||,
coordinates rounded, sorted), so assignment is deterministic and
oracle-checkable.

Scale shape: assignment is the same narrow per-row fold over the K-entry
centroid literal used by the IVF index build (``_nearest_centroid`` —
no n×K row expansion, no shuffle); the per-cluster profile is ONE
aggregation whose map-side combine reduces the exchange to K rows per
input partition. Clustering 100 TB of embeddings is a single scan.

Determinism: the cosine to the assigned centroid is floor-scaled to 1e-4
fixed point per row, so the per-cluster sum is an exact BIGINT sum and
the mean is one double division — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.session import spread
from .similarity import _cents_lit, _norm


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster_id, cos4) for every vector: nearest trained centroid by
    cosine (ties break cluster-id-asc, matching the IVF assignment fold)
    plus the floor-scaled cosine to that centroid.

    One fold evaluates all K centroids per row and keeps the running
    argmax — the cosine must ride the fold's accumulator struct, because
    re-deriving it after the fold would double the vector math."""
    cent_list = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cents = _cents_lit(sorted(cent_list, key=lambda t: int(t[0])))
    v = spread(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    staged = v.withColumn("_vnorm", _norm(F.col("vec")))

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    init = F.struct(
        F.lit(float("-inf")).alias("cos"), F.lit(-1).cast("bigint").alias("cid")
    )

    def step(acc, c):
        cos = _dot(c["cvec"], F.col("vec")) / (c["cnorm"] * F.col("_vnorm"))
        return F.when(
            cos > acc["cos"], F.struct(cos.alias("cos"), c["cid"].alias("cid"))
        ).otherwise(acc)

    best = F.aggregate(cents, init, step)
    return staged.select(
        F.col("id"),
        best.getField("cid").alias("cluster_id"),
        F.floor(best.getField("cos") * 10000).cast("bigint").alias("cos4"),
    )


def cluster_profile(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster corpus profile under a trained quantizer:
    (cluster_id, n_vectors, mean_cos) with ``mean_cos`` the mean
    floor-scaled cosine of members to their centroid — the cluster
    tightness signal curation pipelines threshold on (loose clusters are
    noise/outlier pools; tight ones near-dup pools).

    Scale: map-side combine collapses each input split to ≤K partial rows;
    the exchange carries O(K × partitions), never O(n)."""
    return (
        assign_clusters(df, centroids, vec_col=vec_col, id_col=id_col)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("cos4").alias("_sum_cos4"),
        )
        .select(
            "cluster_id",
            "n_vectors",
            (
                (F.col("_sum_cos4").cast("double") / F.col("n_vectors").cast("double"))
                / F.lit(10000.0)
            ).alias("mean_cos"),
        )
    )
