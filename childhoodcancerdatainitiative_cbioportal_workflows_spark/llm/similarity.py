"""Similarity search over an embedding column (SURVEY §7 P7).

* :func:`cosine_topk` — exact brute force: broadcast the (small) query set
  against all candidates. The right baseline, and the verify stage for ANN.
* :func:`lsh_ann_topk` — random-hyperplane LSH: H signed projections ->
  bucket signature; queries only compare against same-bucket candidates
  (multi-probe over T hash tables to trade recall/cost). Hyperplanes are a
  seeded numpy matrix shipped as a broadcast literal — deterministic.

All arithmetic is JVM-side array folds (``zip_with`` + ``aggregate``), no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..core.session import spread


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


# NOTE: an unrolled element_at dot-product chain (64 scalar terms) was
# benchmarked against the HOF fold for the pairwise workloads here and lost
# 4x — the giant generated expression falls off the JIT inlining cliff.
# Keep the array folds; they are the fast shape for vector math in pure
# Spark SQL. (The next tier up is Arrow-batched numpy, which trades oracle
# bit-parity for ~20x.)


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbours by cosine for each query vector.

    ``queries`` is broadcast — it must be the small side (typical ANN
    serving shape). Result: (q_id, c_id, cos_sim, rank).

    Zero-norm vectors are EXCLUDED from both sides (cosine undefined;
    ANSI DIVIDE_BY_ZERO otherwise — r17 ANN adversarial sweep). Norms
    staged per ROW, which also stops the old per-PAIR norm folds."""
    c = spread(candidates).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
    ).withColumn("_cnrm", _norm(F.col("c_vec"))).filter(F.col("_cnrm") > 0)
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    ).withColumn("_qnrm", _norm(F.col("q_vec"))).filter(F.col("_qnrm") > 0)
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    cos = _dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("_qnrm") * F.col("_cnrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def _planes_lit(planes):
    """Nested plane tensor as ONE JVM-parsed SQL array literal.

    ``F.lit`` on a deeply nested Python list pays one py4j round trip per
    scalar — measured 2.1 s of pure driver time for a 12x5x64 tensor, on
    EVERY query build. A single ``F.expr("array(array(...)))")`` string
    parses in milliseconds. Plain-decimal reprs get the ``D`` suffix so each
    element parses as the exact IEEE double its repr() round-trips to
    (scientific-notation reprs are already double literals); generated
    DuckDB oracles inline the same reprs, so bit-parity is preserved."""

    def _d(x: float) -> str:
        r = repr(float(x))
        return r if ("e" in r or "E" in r) else r + "D"

    def _arr(xs) -> str:
        if isinstance(xs[0], (int, float)):
            return "array(" + ",".join(_d(x) for x in xs) + ")"
        return "array(" + ",".join(_arr(x) for x in xs) + ")"

    return F.expr(_arr(planes))


def _bucket_expr(vec, planes: list[list[float]]):
    """Signature = bits of sign(plane . vec), packed into a long.

    Planes ride as ONE nested-array literal — unrolling them into
    planes x dim scalar literals bloats the plan (thousands of expression
    nodes per bucket column) and dominates wall-clock via codegen, not
    evaluation. Bit weights as exact doubles (2^j <= 2^52) because shift
    amounts can't be Columns."""
    planes_lit = _planes_lit(planes)
    weights = F.lit([float(1 << j) for j in range(len(planes))])
    contrib = F.transform(
        planes_lit,
        lambda p, j: F.when(
            _dot(p, vec) >= 0, F.element_at(weights, j + F.lit(1))
        ).otherwise(F.lit(0.0)),
    )
    return F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x).cast("bigint")


def ivf_flat_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroid_ids: list[int],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-flat approximate top-k: an inverted-file index whose coarse
    quantizer is a DETERMINISTIC sample of the corpus itself
    (``centroid_ids``) — no k-means iterations, so the whole construction
    is reproducible in any engine (the trained-centroid variant drops in by
    swapping the centroid table). Every vector picks its nearest centroid
    via a narrow per-row fold over the K-entry centroid literal (no
    shuffle, no row expansion); a query probes its ``nprobe`` nearest
    lists and scores only those lists' members. At corpus scale the probe
    join replaces O(n*q) scoring with list-local work, and the assignment
    pass is embarrassingly parallel.

    Returns (q_id, c_id, cos_sim, rank), rank by cosine desc / id asc."""
    v = spread(candidates).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # bounded collect: the coarse quantizer is K rows (K ~ 16) by design
    cent_rows = (
        candidates.filter(F.col(id_col).isin([int(i) for i in centroid_ids]))
        .select(F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cvec"))
        .collect()
    )
    cent_list = [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cent_rows]
    qd = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    return _ivf_topk_core(v, qd, cent_list, k, nprobe, exclude_self)


def _cents_lit(cent_list: list[tuple[int, list[float]]]):
    """K (cid, vector, norm) quantizer entries as ONE JVM-parsed
    array<struct<cid,cvec,cnorm>> literal — same rationale (and
    exact-double reprs) as :func:`_planes_lit`. The norm is a CONSTANT per
    centroid, so it is folded here once, not recomputed per corpus row;
    the Python accumulation order (0.0 + x*x left-to-right, then sqrt)
    matches the ``_norm`` fold exactly, so the literal is bit-identical
    to what the JVM would compute."""

    def _d(x: float) -> str:
        r = repr(float(x))
        return r if ("e" in r or "E" in r) else r + "D"

    def _cnorm(vec: list[float]) -> float:
        import math

        acc = 0.0
        for x in vec:
            acc += x * x
        return math.sqrt(acc)

    items = ",".join(
        "named_struct('cid',{}L,'cvec',array({}),'cnorm',{})".format(
            int(cid), ",".join(_d(x) for x in vec), _d(_cnorm(vec))
        )
        for cid, vec in cent_list
    )
    return F.expr("array(" + items + ")")


def _nearest_centroid(vec, cent_list: list[tuple[int, list[float]]], vnorm=None):
    """Shuffle-free nearest-centroid assignment: one array fold over the
    K-entry centroid literal. The literal is sorted by cid and the fold
    keeps the FIRST maximum, so ties break cid-asc — identical semantics
    to the former window (which shuffled all n x K expanded rows by id
    just to keep one; r4 verdict #4). Spark orders NaN above all doubles
    in both ``>`` and window sorts, so zero-norm vectors also agree.

    Centroid norms ride the literal (constants); pass ``vnorm`` as a
    STAGED column to avoid recomputing the row norm once per centroid —
    HOF lambda arguments are inlined, so an unhoisted ``_norm(vec)`` here
    costs K norm folds per row instead of one."""
    cents = _cents_lit(sorted(cent_list, key=lambda t: int(t[0])))
    if vnorm is None:
        vnorm = _norm(vec)
    init = F.struct(
        F.lit(float("-inf")).alias("cos"), F.lit(-1).cast("bigint").alias("cid")
    )

    def step(acc, c):
        cos = _dot(c["cvec"], vec) / (c["cnorm"] * vnorm)
        return F.when(
            cos > acc["cos"], F.struct(cos.alias("cos"), c["cid"].alias("cid"))
        ).otherwise(acc)

    return F.aggregate(cents, init, step).getField("cid")


def _ivf_topk_core(
    v: DataFrame,
    qd: DataFrame,
    cent_list: list[tuple[int, list[float]]],
    k: int,
    nprobe: int,
    exclude_self: bool,
) -> DataFrame:
    """Shared IVF probe/score plan over a [(cid, cvec), ...] quantizer —
    the quantizer source (corpus sample vs trained k-means) is the only
    thing the public faces differ on. Candidate-side list assignment is a
    narrow per-row fold (no shuffle, no n x K row expansion); only the
    small query side pays a crossJoin + window to rank its nprobe lists.

    Zero-norm rows are excluded from candidates, queries AND the
    quantizer (cosine undefined; ANSI DIVIDE_BY_ZERO otherwise — r17
    sweep); oracle nv/nc CTEs carry matching nrm/cnrm > 0 predicates.
    The guard rides the norm column each side already stages — one fold
    per row, no extra pass."""
    cent_list = [
        (cid, vec) for cid, vec in cent_list if any(x != 0.0 for x in vec)
    ]
    if not cent_list:
        # empty quantizer (no usable centroids in this corpus): no lists
        # exist to probe, so the result is empty — an empty array literal
        # types as VOID and would break the assignment fold
        id_t = dict(v.dtypes)["id"]
        return v.sparkSession.createDataFrame(
            [], f"q_id {id_t}, c_id {id_t}, cos_sim double, rank int"
        )
    # persist: the staged-norm candidate frame feeds BOTH the list
    # assignment and the verify join side (cv) — un-persisted, each
    # re-ran the scan + norm fold (r18). One job fills the cache; the
    # caller releases it via release_plan_caches (bench contract).
    v = v.withColumn("_vnorm", _norm(F.col("vec"))).filter(F.col("_vnorm") > 0).persist()
    v.count()  # eager: concurrent stages race an unmaterialized cache
    qd = qd.withColumn("_qnorm", _norm(F.col("vec"))).filter(F.col("_qnorm") > 0)
    cand_lists = v.select(
        "id",
        _nearest_centroid(
            F.col("vec"), cent_list, vnorm=F.col("_vnorm")
        ).alias("list_id"),
    )
    cents = qd.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in vec]) for c, vec in cent_list],
        "cid bigint, cvec array<double>",
    )
    ccos = _dot(F.col("vec"), F.col("cvec")) / (
        F.col("_qnorm") * _norm(F.col("cvec"))
    )
    w_assign = Window.partitionBy("id").orderBy(F.col("_ccos").desc(), F.col("cid").asc())
    qprobe = (
        qd.crossJoin(F.broadcast(cents))
        .withColumn("_ccos", ccos)
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("id").alias("q_id"), F.col("cid").alias("list_id"))
    )
    pairs = (
        qprobe.join(cand_lists, "list_id")
        .select("q_id", F.col("id").alias("c_id"))
        .distinct()
    )
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    # norms staged per ROW before the pair join (never per scored pair);
    # the guard's staged columns double as the scoring norms — the value,
    # and the oracle hash, is bit-identical
    cv = v.toDF("c_id", "c_vec", "_cnrm")
    qv = qd.toDF("q_id", "q_vec", "_qnrm")
    cos = _dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("_qnrm") * F.col("_cnrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    from .dedup import _with_caches

    return _with_caches(
        pairs.join(cv, "c_id")
        .join(F.broadcast(qv), "q_id")
        .withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"),
        [v],
    )


def train_ivf_centroids(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 29,
    max_iter: int = 20,
    round_decimals: int | None = 6,
) -> list[list[float]]:
    """Coarse-quantizer training: seeded k-means (kmeans|| init) over the
    corpus, returning centroid vectors sorted lexicographically so the
    centroid-id assignment is stable regardless of Spark's cluster-index
    order (k-means cluster numbering is not deterministic across
    partitionings; the vectors themselves are, once rounded).

    ``round_decimals`` truncates each coordinate so the centroids embed as
    compact literals and any last-ulp aggregation-order jitter disappears —
    quantizer quality is unaffected (coarse assignment only needs ~2-3
    significant digits). Returns plain Python lists, ready for
    :func:`ivf_flat_topk_trained` and for inlining into oracle SQL."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter, initMode="k-means||").fit(feats)
    cents = [[float(x) for x in c] for c in model.clusterCenters()]
    if round_decimals is not None:
        cents = [[round(x, round_decimals) for x in c] for c in cents]
    return sorted(cents)


def ivf_flat_topk_trained(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-flat top-k under a TRAINED coarse quantizer: ``centroids`` are
    k-means centers (see :func:`train_ivf_centroids`) shipped as one
    JVM-parsed nested literal — the index-build pass is a centroid-table
    broadcast exactly like the sampled variant, but the lists now follow
    the corpus's real density, which is what recovers recall on clustered
    corpora (a uniform id-sample quantizer collapses dense regions into
    few giant lists and probes waste work).

    Training is an offline index-build step; this function only consumes
    its artifact, so query plans stay deterministic and oracle-checkable
    (the same literals inline into generated SQL)."""
    cent_list = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    v = spread(candidates).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    qd = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    return _ivf_topk_core(v, qd, cent_list, k, nprobe, exclude_self)


def lsh_ann_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 13,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: compare only pairs sharing an LSH bucket in any of
    ``num_tables`` hash tables. The candidate-side bucket build is one
    projection pass; the join shuffles on (table, bucket) — at corpus scale
    this replaces the O(n*q) cross product with bucket-local work.

    Recall is tunable: more tables / fewer planes -> higher recall, bigger
    buckets.

    Zero-norm vectors are excluded at the scoring join (cosine
    undefined; ANSI DIVIDE_BY_ZERO otherwise — r17 sweep). A zero
    vector buckets as all-ones (sign(0) >= 0) but its pairs die on the
    inner join with the norm-filtered vector tables, so the result
    matches the oracle's filtered-v formulation; the guard rides the
    per-row scoring norms the plan stages anyway — zero extra folds."""
    if dim is None:
        first = candidates.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]

    # all tables' hyperplanes as ONE nested literal (T x P x D); a single
    # transform emits the (table, bucket) pairs — one expression tree per
    # side keeps Catalyst resolution and codegen cost flat in num_tables
    all_planes = [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]
    planes_lit = _planes_lit(all_planes)
    weights = F.lit([float(1 << j) for j in range(num_planes)])

    def _tables_expr(vec):
        def bucket(planes_t):
            contrib = F.transform(
                planes_t,
                lambda p, j: F.when(
                    _dot(p, vec) >= 0, F.element_at(weights, j + F.lit(1))
                ).otherwise(F.lit(0.0)),
            )
            return F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x).cast("bigint")

        return F.transform(
            planes_lit,
            lambda planes_t, t: F.struct(
                t.alias("table"), bucket(planes_t).alias("bucket")
            ),
        )

    def with_buckets(df, side):
        # candidate side: the T*P projection pass is the expensive stage —
        # fan a narrow scan out before it (no-op on well-split inputs)
        if side == "c":
            df = spread(df)
        staged = df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).cast("array<double>").alias(f"{side}_vec"),
        )
        return staged.select(
            f"{side}_id",
            f"{side}_vec",
            F.explode(_tables_expr(F.col(f"{side}_vec"))).alias("tb"),
        ).select(f"{side}_id", f"{side}_vec", "tb.table", "tb.bucket")

    cb = with_buckets(candidates, "c")
    qb = with_buckets(queries, "q")
    # dedup multi-table collisions on the ID pair only — distinct over the
    # raw vectors would compare 64-element arrays per row
    id_pairs = cb.drop("c_vec").join(qb.drop("q_vec"), ["table", "bucket"]).select(
        "q_id", "c_id"
    ).distinct()
    if exclude_self:
        id_pairs = id_pairs.filter(F.col("q_id") != F.col("c_id"))
    c_vecs = candidates.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
    ).withColumn("_cnrm", _norm(F.col("c_vec"))).filter(F.col("_cnrm") > 0)
    q_vecs = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    ).withColumn("_qnrm", _norm(F.col("q_vec"))).filter(F.col("_qnrm") > 0)
    pairs = id_pairs.join(c_vecs, "c_id").join(F.broadcast(q_vecs), "q_id")
    cos = _dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("_qnrm") * F.col("_cnrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def cosine_topk_np(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Arrow-batched numpy production path for exact brute-force top-k —
    same contract as :func:`cosine_topk` (which stays the oracle-checkable
    baseline; float fold order differs at the last ulp, so this variant is
    pinned by an equivalence test rather than the DuckDB oracle).

    Shape: the (small) query matrix is collected, L2-normalized and
    broadcast; each Arrow batch of candidates is scored as ONE
    ``(batch, dim) @ (dim, n_q)`` BLAS matmul (the ~20x tier over the
    per-element SQL fold, see module note) and reduced to its per-batch
    top-(k+1) rows per query before leaving the worker, so the shuffle
    carries O(k * n_q * n_batches) rows — never O(n * n_q). A final
    window rank over that small union yields the exact global top-k.

    The per-batch cut is tie-aware: rows are pre-sorted by c_id once,
    then ONE stable argsort on -cos per batch keeps c_id-ascending order
    on similarity ties for every query simultaneously — a bare
    argpartition breaks ties arbitrarily and could drop the smaller c_id
    the contract keeps (duplicate vectors make such ties common in
    near-dup corpora).

    The query-matrix broadcast is registered on the returned plan —
    callers running many scoring rounds should
    ``release_plan_caches(result)`` after materializing, like the dedup
    builders."""
    import numpy as np
    import pandas as pd

    q_pd = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).toPandas()
    q_ids = q_pd["q_id"].to_numpy()
    qm = np.stack(q_pd["q_vec"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, qm))
    take = k + 1 if exclude_self else k

    def score(batches):
        ids_b, qm_b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf["c_vec"].to_numpy()).astype(np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            c_ids = pdf["c_id"].to_numpy()
            # pre-order rows by c_id so ONE stable sort per batch breaks
            # cos ties by c_id asc for all queries (no per-query Python loop)
            order0 = np.argsort(c_ids, kind="stable")
            c_ids = c_ids[order0]
            sims = cm[order0] @ qm_b.T  # (batch, n_q)
            top = min(take, sims.shape[0])
            sel = np.argsort(-sims, axis=0, kind="stable")[:top]  # (top, n_q)
            out = pd.DataFrame(
                {
                    "q_id": np.repeat(ids_b, top),
                    "c_id": c_ids[sel].T.ravel(),
                    "cos_sim": np.take_along_axis(sims, sel, axis=0).T.ravel(),
                }
            )
            yield out

    staged = spread(candidates).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    partial = staged.mapInPandas(
        score, "q_id long, c_id long, cos_sim double"
    )
    if exclude_self:
        partial = partial.filter(F.col("q_id") != F.col("c_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    from .dedup import _with_caches

    out = (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )
    # Broadcast.unpersist shares the cache-release signature
    return _with_caches(out, [bc])


def ann_recall(
    exact: DataFrame, approx: DataFrame, k: int, nprobe: int
) -> DataFrame:
    """Measured recall@k of an ANN result against the exact top-k on the
    same query set — the number the approximation's cost is judged by,
    computed instead of asserted. Both inputs are (q_id, c_id, ...) rank
    frames (:func:`cosine_topk` / :func:`ivf_flat_topk`); both are
    deterministic, so recall itself is deterministic and fully
    oracle-checkable. recall_fp = 1e6 * |approx ∩ exact| div |exact| in
    exact integer arithmetic; one semi join + two count aggs, all
    map-side combinable. Emits no row when exact is empty (recall over
    nothing is undefined — the ks_drift discipline, not an ANSI
    divide-by-zero)."""
    # One left join + one aggregation (r18): the old semi-join + two
    # separate count aggs referenced `exact` twice, re-running the
    # brute-force cosine derivation per reference. Both rank frames are
    # (q_id, c_id)-unique, so a left join preserves exactly one row per
    # exact pair and the hit indicator sums to |approx ∩ exact|.
    joined = exact.select("q_id", "c_id").join(
        approx.select("q_id", "c_id", F.lit(1).alias("_h")),
        ["q_id", "c_id"],
        "left",
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum("_h"), F.lit(0)).cast("long").alias("n_hits"),
    )
    from .dedup import _with_caches

    # propagate BOTH inputs' cache handles (the IVF side persists its
    # staged-norm frame, r18) so release_plan_caches on the recall frame
    # frees everything — the dedup_components composition discipline
    inner = [
        *getattr(exact, "_spark_graft_caches", []),
        *getattr(approx, "_spark_graft_caches", []),
    ]
    out = (
        agg
        .filter(F.col("n_exact") > 0)
        .select(
            F.lit(k).alias("k"),
            F.lit(nprobe).alias("nprobe"),
            "n_exact",
            "n_hits",
            F.expr("CAST((1000000 * n_hits) div n_exact AS BIGINT)").alias(
                "recall_fp"
            ),
        )
    )
    return _with_caches(out, inner) if inner else out
