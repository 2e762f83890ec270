"""Bounded-round multi-source BFS (shortest hop counts) on an edge list.

The iterative-graph family's traversal member (pagerank = weights,
components = membership, k-core = cohesion, BFS = distance): from a seed
set, label every node with its minimum hop distance up to ``max_hops``.

Plan shape per round: one equi-join frontier×edges (the frontier is the
small side and shrinks as the graph saturates), one ``distinct``, one
anti-join against the visited set — all shuffles keyed on the node id.
Per-round ``localCheckpoint`` (eager) truncates lineage: the visited
frame is referenced twice per round (anti-join + union), which under
plain ``persist`` leaves a 3^rounds STATIC analyzer plan (the k-core
lesson, operators/graph.py:100 / DESIGN.md round 7).

Reference parity: the reference walks clinical linkage one hop at a time
in pandas merges (`/root/reference/workflows/pedmatch-clinical-vcf-workflow.py`
subject→sample→file chains); bounded BFS is the same reachability
computation stated once over an arbitrary edge list.

The oracle twin is a recursive CTE (``WITH RECURSIVE`` + UNION-dedup on
(node, hop), then MIN(hop)) — DuckDB-executable, so the iterative Spark
loop is value-certifiable round for round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """(node, hops) for every node within ``max_hops`` of any seed.

    ``edges`` is treated as undirected (both directions are unioned in);
    ``seeds`` must have a ``node`` column. Hop 0 rows are the seeds
    themselves. Deterministic: BFS distance is partition-independent.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    from ..llm.dedup import _CheckpointHandle, _with_caches

    und = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
        .persist()
    )
    visited = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    # release superseded round snapshots as soon as the next round is
    # materialized (the k-core discipline, r18): un-released, a 4-hop run
    # left 9 eager checkpoint RDDs behind for async GC — measured as
    # pass-over-pass GC pressure in the bench loop. The final visited
    # handle rides the returned plan's cache list.
    v_handle = _CheckpointHandle(visited)
    f_handle = None
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint(eager=True)
        )
        if f_handle is not None:
            f_handle.unpersist()
        f_handle = _CheckpointHandle(nxt)
        visited = visited.union(nxt).localCheckpoint(eager=True)
        v_handle.unpersist()
        v_handle = _CheckpointHandle(visited)
        frontier = nxt
    und.unpersist()
    if f_handle is not None:
        f_handle.unpersist()  # the final visited checkpoint is independent
    return _with_caches(visited, [v_handle])


def sssp_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "wt",
    node: str = "node",
) -> DataFrame:
    """Hop-bounded single-source(-set) shortest paths with integer edge
    weights (Bellman-Ford relaxation): (node, dist) where dist is the
    minimum total weight over any path of ≤ ``max_hops`` edges from a
    seed. The weighted sibling of :func:`bfs_hops` — per round one
    frontier×edges equi-join plus a min-aggregate, per-round
    ``localCheckpoint`` (the same lineage discipline), deterministic
    because min-over-paths is partition-independent.

    Weights must be non-negative integers (exact BIGINT sums — no float
    path costs for engines to disagree over)."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    from ..llm.dedup import _CheckpointHandle, _with_caches

    und = (
        edges.select(
            F.col(src).alias("_s"), F.col(dst).alias("_d"),
            F.col(weight).cast("bigint").alias("_w"),
        )
        .union(
            edges.select(
                F.col(dst).alias("_s"), F.col(src).alias("_d"),
                F.col(weight).cast("bigint").alias("_w"),
            )
        )
        .distinct()
        .persist()
    )
    dist = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    # per-round snapshot release — see bfs_hops above (r18)
    d_handle = _CheckpointHandle(dist)
    f_handle = None
    # frontier relaxation: any path that improves a label must extend a
    # label that itself improved last round, so relaxing ONLY from the
    # improved set is equivalent for hop-bounded Bellman-Ford and keeps
    # per-round cost proportional to the (shrinking) frontier, not the
    # whole labeled set — the same shape as bfs_hops above
    frontier = dist
    for _ in range(max_hops):
        relaxed = frontier.join(und, frontier["node"] == und["_s"]).select(
            F.col("_d").alias("node"), (F.col("dist") + F.col("_w")).alias("dist")
        )
        merged = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        # improved = labels that are new or strictly better this round
        new_frontier = merged.join(dist, ["node", "dist"], "left_anti").localCheckpoint(
            eager=True
        )
        if f_handle is not None:
            f_handle.unpersist()
        f_handle = _CheckpointHandle(new_frontier)
        d_handle.unpersist()
        d_handle = _CheckpointHandle(merged)
        frontier, dist = new_frontier, merged
    und.unpersist()
    if f_handle is not None:
        f_handle.unpersist()  # the returned dist checkpoint is independent
    return _with_caches(dist, [d_handle])
