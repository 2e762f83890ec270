"""Hierarchy flattening by pointer doubling: root + tree rollup in
O(log depth) rounds.

Org charts, BOM trees, category taxonomies and thread hierarchies all
need "which root does each node belong to" before any per-tree
aggregation. The naive plan chases one parent edge per round (O(depth)
shuffles); pointer doubling composes the ancestor map with ITSELF each
round, so covered depth doubles — 2, 4, 8, … — and a depth-d hierarchy
flattens in ⌈log₂ d⌉ self-joins. This is the same doubling idea as the
large-star/small-star component contraction (llm/dedup) specialized to
forests, where it is exact and simple: every node has one parent, roots
are the parent-of-self fixpoints.

Per round: one self equi-join of the (node → ancestor) map plus a
``localCheckpoint`` (the map is referenced twice per round — the k-core
lineage lesson). Shuffle payload is always exactly one row per node.
The recursive-CTE oracle climbs edges one at a time; agreement
certifies the doubling arithmetic end to end.

Reference parity: the reference resolves participant → sample → file
chains by repeated pandas merges (`/root/reference/workflows/
pedmatch-clinical-vcf-workflow.py` manifest joins); pointer doubling is
the same chain resolution stated once for arbitrary-depth hierarchies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tree_roots(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    rounds: int,
) -> DataFrame:
    """(node, root) for every node of a forest. ``rounds`` doubling
    rounds resolve hierarchies up to depth 2^rounds; a root is a node
    whose parent is itself (encode top-level nodes that way). Nodes
    deeper than 2^rounds resolve to their 2^rounds-th ancestor — pick
    ``rounds`` ≥ ⌈log₂ max-depth⌉ (cheap: each round is one self-join).

    Dangling pointers are healed, not dropped (r8 advice): a node whose
    parent is NULL or absent from ``nodes`` is treated as self-rooted —
    one up-front left join normalizes every parent onto the node set, so
    the doubling rounds' inner self-joins can never lose rows on
    imperfect forests. Every node therefore appears in the output
    exactly once — PROVIDED node ids are unique (the forest contract;
    duplicate ids would fan out the doubling self-joins regardless).
    The healing join's probe side is deduplicated (r9 advice) so a
    contract violation cannot silently amplify rows here."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    from ..llm.dedup import _CheckpointHandle, _with_caches

    raw = nodes.select(
        F.col(id_col).alias("node"), F.col(parent_col).alias("anc")
    )
    ids = raw.select(F.col("node").alias("_pid")).distinct()
    anc = (
        raw.join(ids, raw["anc"] == ids["_pid"], "left")
        .select(
            "node", F.coalesce(F.col("_pid"), F.col("node")).alias("anc")
        )
        .localCheckpoint(eager=True)
    )
    # release each round's blocks once the next round is materialized (the
    # k-core discipline, r18): un-released, every call left rounds+1 eager
    # checkpoint snapshots for async GC to find. The final round's handle
    # rides the returned plan's cache list for release_plan_caches.
    handle = _CheckpointHandle(anc)
    for _ in range(rounds):
        jump = anc.select(F.col("node").alias("_n2"), F.col("anc").alias("_a2"))
        anc = (
            anc.join(jump, anc["anc"] == jump["_n2"])
            .select("node", F.col("_a2").alias("anc"))
            .localCheckpoint(eager=True)
        )
        handle.unpersist()
        handle = _CheckpointHandle(anc)
    return _with_caches(anc.select("node", F.col("anc").alias("root")), [handle])


def hierarchy_rollup(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    value_col: str,
    rounds: int,
) -> DataFrame:
    """Per-tree aggregate: (root, n_nodes, total) where ``total`` sums
    the integer ``value_col`` over every node of the tree (root
    included). One doubling pass + one keyed aggregation."""
    from ..llm.dedup import _with_caches

    roots = tree_roots(nodes, id_col, parent_col, rounds)
    vals = nodes.select(
        F.col(id_col).alias("node"), F.col(value_col).alias("_v")
    )
    return _with_caches(
        roots.join(vals, "node")
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.col("_v").cast("decimal(38,0)")).cast("bigint").alias("total"),
        ),
        getattr(roots, "_spark_graft_caches", []),
    )
