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
    re-deriving it after the fold would double the vector math.

    Zero-norm vectors and centroids are excluded (cosine undefined;
    ANSI DIVIDE_BY_ZERO otherwise — r17 sweep); oracle nv/nc CTEs carry
    matching nrm/cnrm > 0 predicates."""
    cent_list = [
        (i, [float(x) for x in c])
        for i, c in enumerate(centroids)
        if any(float(x) != 0.0 for x in c)
    ]
    if not cent_list:
        # no usable centroids: nothing can be assigned (an empty array
        # literal types as VOID and would break the fold)
        id_t = df.select(F.col(id_col).alias("id")).dtypes[0][1]
        return df.sparkSession.createDataFrame(
            [], f"id {id_t}, cluster_id bigint, cos4 bigint"
        )
    cents = _cents_lit(sorted(cent_list, key=lambda t: int(t[0])))
    v = spread(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    staged = v.withColumn("_vnorm", _norm(F.col("vec"))).filter(
        F.col("_vnorm") > 0
    )

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


def semantic_dup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-shaped near-duplicate pairs: vectors are bucketed by their
    nearest TRAINED centroid and pairwise cosine runs only WITHIN a
    cluster — the density-adaptive counterpart of the random-hyperplane
    LSH bucketing in ``embedding_dup_pairs_lsh`` (clusters follow corpus
    structure, so semantically-close pairs land together at much higher
    recall than random planes for the same candidate budget).

    Returns (id_a, id_b, cos_sim) with id_a < id_b and cosine >= threshold,
    cos_sim rounded to 4 decimals. Feed the pairs to
    :func:`..llm.dedup.dedup_components` to canonicalize keep-sets.

    Scale: the self-join shuffles on cluster_id; per-reducer work is
    bounded by the largest cluster (sum of |C_i|² total). At corpus scale
    the quantizer's K must grow with n (K ≈ n / target_cluster_size, the
    SemDeDup recipe — their 100 M-doc runs use K ~ 10⁵) so clusters stay
    ~constant-size; K here rides the centroid artifact, so the caller
    controls that knob at train time. Vectors ride the bucket join once;
    no crossJoin node ever appears (plan-asserted in tests).

    The NARROW (id, cluster_id) assignment persists eagerly (the
    dedup-builder pattern): it feeds BOTH self-join sides, and an
    unmaterialized plan runs the n×K assignment fold twice AND lets the
    join's isnotnull constraints push the fold into the scan filter below
    the spread (both observed — 4 fold-bearing scans in the uncached
    plan). Only the two-long assignment is cached — never the vectors,
    which re-enter from the columnar scan per side (cache footprint is
    16 B/row at any corpus size). Callers release with
    :func:`..llm.dedup.release_plan_caches` after materializing."""
    from .dedup import _with_caches

    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    assigned = (
        assign_clusters(df, centroids, vec_col=vec_col, id_col=id_col)
        .select("id", "cluster_id")
        .persist()
    )
    assigned.count()  # eager: lazy persisted frames recompute per plan branch
    # norms are per-ROW (staged before the self-join): computing
    # _norm(vec) inside the pair expression would redo the 64-element
    # fold + sqrt once per PAIR per side — pairs >> rows within clusters.
    # Same expression over the same doubles, so the cosine value (and the
    # oracle hash) is bit-identical.
    sides = assigned.join(vecs, "id").withColumn("_nrm", _norm(F.col("vec")))
    a = sides.select(
        F.col("cluster_id"),
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("_nrm").alias("_nrm_a"),
    )
    b = sides.select(
        F.col("cluster_id"),
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("_nrm").alias("_nrm_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("_nrm_a") * F.col("_nrm_b"))
    out = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
    return _with_caches(out, [assigned])


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
