"""Graph analytics over pair lists (the near-dup graph's second face).

:func:`pagerank_fixed` is a bounded-iteration PageRank in FIXED-POINT
integer arithmetic — every rank is a bigint in ``unit`` micro-units, every
step is floor division and integer sums, so two engines running the same
recurrence produce BIT-IDENTICAL ranks (floating-point PageRank cannot be
oracle-diffed: per-node sums reorder across partitionings). The price is
a deterministic rounding-down bias of < iters·(deg+1) units per node —
irrelevant at unit=1e9 for ranking purposes.

Scale shape: each iteration is one join (ranks onto edge sources) + one
aggregation (sum contributions per destination) — two shuffles over the
edge list, the same shape as one large-star round in components; driver
holds only loop control, never data. Iterations are bounded by the
caller (ranking use-cases need few); convergence detection would add a
per-round distributed diff exactly like star_contraction's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_fixed(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 3,
    unit: int = 1_000_000_000,
    damp_pct: int = 85,
) -> DataFrame:
    """PageRank over the undirected graph of ``pairs`` (each pair becomes
    two directed edges), ``iters`` fixed iterations, returning
    (id, rank_fp) with rank_fp in integer ``unit`` units.

    Recurrence (all integer):
      r0        = floor(unit / n)
      teleport  = floor((100-damp) * unit / (100 * n))
      r_{t+1}(v) = teleport + floor(damp * S_v / 100),
      S_v = sum over in-neighbors u of floor(r_t(u) / deg(u)).
    The divisions run as ``floor(x / y)`` over doubles whose inputs are
    exact integers below 2^53 — IEEE division + floor is deterministic,
    so any engine evaluating the same expressions agrees exactly."""
    e = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d")).unionByName(
        pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d"))
    ).distinct()
    # materialize the edge list ONCE: it feeds every iteration's contrib
    # join, and an unmaterialized lineage re-executes the (potentially
    # expensive) pair-derivation upstream per reference — observed as 86
    # exchanges in the 3-iteration plan over the jaccard pair pipeline,
    # vs 8 once persisted (the star_contraction lineage lesson)
    e = e.persist()
    e.count()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    n_df = deg.agg(F.count(F.lit(1)).alias("n"))
    nodes = deg.crossJoin(F.broadcast(n_df))
    from ..llm.dedup import _CheckpointHandle, _with_caches

    # rank-state lineage is truncated per round (the bfs/kcore
    # discipline): each round references r twice (contrib join + the
    # rank update), so an un-checkpointed chain doubles the analyzed
    # plan per iteration — measured 2,870 plan lines / 258 Exchange
    # nodes at iters=3 vs ~60 lines checkpointed, with ~2 s of pure
    # driver analysis time per build. r is one small row per node.
    r = nodes.select(
        F.col("s").alias("id"),
        "deg",
        "n",
        F.floor(F.lit(float(unit)) / F.col("n")).cast("long").alias("r"),
    ).localCheckpoint(eager=True)
    r_handle = _CheckpointHandle(r)
    teleport = F.floor(
        F.lit(float((100 - damp_pct) * unit)) / (F.lit(100.0) * F.col("n"))
    ).cast("long")
    for _ in range(iters):
        contrib = (
            e.join(r, e["s"] == r["id"])
            .select(
                F.col("d"),
                F.floor(F.col("r").cast("double") / F.col("deg"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("d")
            .agg(F.sum("c").alias("S"))
        )
        r = (
            r.select("id", "deg", "n")
            .join(contrib, r["id"] == contrib["d"], "left")
            .select(
                "id",
                "deg",
                "n",
                (
                    teleport
                    + F.floor(
                        F.lit(float(damp_pct))
                        * F.coalesce(F.col("S"), F.lit(0)).cast("double")
                        / F.lit(100.0)
                    ).cast("long")
                ).alias("r"),
            )
        ).localCheckpoint(eager=True)
        r_handle.unpersist()
        r_handle = _CheckpointHandle(r)

    return _with_caches(r.select("id", F.col("r").alias("rank_fp")), [e, r_handle])


def kcore_peel(
    pairs: DataFrame,
    k: int = 2,
    iters: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Bounded-iteration k-core peeling over the undirected graph of
    ``pairs``: each round removes every node whose current degree is
    below ``k`` (and the edges touching it), ``iters`` fixed rounds —
    the same bounded-loop discipline as :func:`pagerank_fixed`, so the
    result is deterministic and oracle-diffable whether or not the peel
    has converged (full k-core = run until no node drops; the registered
    face documents convergence on its corpus). Returns surviving
    (id, deg) — degree within the peeled subgraph.

    Scale shape: per round one map-side-combined degree count + two
    LEFT SEMI joins of the edge list against the (shrinking) survivor
    set. Each round's edge list is ``localCheckpoint``ed, not merely
    persisted: every round references the previous round's edges THREE
    times (the edge scan + both survivor sides), so an unpersisted
    lineage grows 3^rounds analyzer nodes — checkpointing truncates the
    plan to one round deep (the star-contraction discipline; plain
    persist keeps runtime fine but leaves the exponential STATIC plan).
    Driver holds loop control only."""
    from ..llm.dedup import _CheckpointHandle, _with_caches

    e = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d")).unionByName(
        pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d"))
    ).distinct()
    e = e.localCheckpoint(eager=True)
    caches = [_CheckpointHandle(e)]
    for _ in range(iters):
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        nxt = (
            e.join(keep, "s", "left_semi")
            .join(keep.toDF("d"), "d", "left_semi")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        caches[0].unpersist()
        e = nxt
        caches = [_CheckpointHandle(e)]
    out = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("s").alias("id"), "deg"
    )
    return _with_caches(out, caches)


def kcore_peel_sql(pairs_cte: str, k: int = 2, iters: int = 3) -> str:
    """DuckDB oracle for :func:`kcore_peel`: the same peel unrolled as
    chained CTEs (the pagerank-oracle pattern)."""
    sql = f"""WITH pairs AS ({pairs_cte}), e0 AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
)"""
    prev = "e0"
    for t in range(1, iters + 1):
        sql += f""", k{t} AS (
  SELECT s FROM {prev} GROUP BY s HAVING COUNT(*) >= {k}
), e{t} AS (
  SELECT {prev}.s, {prev}.d
  FROM {prev}
  JOIN k{t} ka ON {prev}.s = ka.s
  JOIN k{t} kb ON {prev}.d = kb.s
)"""
        prev = f"e{t}"
    sql += f"""
SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM {prev} GROUP BY s"""
    return sql


def pagerank_fixed_sql(pairs_cte: str, iters: int = 3, unit: int = 1_000_000_000,
                       damp_pct: int = 85) -> str:
    """DuckDB oracle for :func:`pagerank_fixed`: ``pairs_cte`` must be the
    body of a CTE producing (id_a, id_b); the same integer recurrence is
    unrolled as chained CTEs."""
    tele = f"CAST(FLOOR({(100 - damp_pct) * unit} / (100.0 * n)) AS BIGINT)"
    sql = f"""WITH RECURSIVE pairs AS ({pairs_cte}), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), deg AS (
  SELECT s, COUNT(*) AS deg FROM e GROUP BY s
), nn AS (
  SELECT COUNT(*) AS n FROM deg
), r0 AS (
  SELECT deg.s AS id, deg.deg, nn.n,
         CAST(FLOOR({unit} / (1.0 * nn.n)) AS BIGINT) AS r
  FROM deg, nn
)"""
    prev = "r0"
    for t in range(1, iters + 1):
        sql += f""", c{t} AS (
  SELECT e.d, CAST(SUM(CAST(FLOOR(CAST({prev}.r AS DOUBLE) / {prev}.deg)
                            AS BIGINT)) AS BIGINT) AS S
  FROM e JOIN {prev} ON e.s = {prev}.id
  GROUP BY e.d
), r{t} AS (
  SELECT {prev}.id, {prev}.deg, {prev}.n,
         {tele} + CAST(FLOOR({damp_pct}.0 * COALESCE(c{t}.S, 0) / 100.0)
                       AS BIGINT) AS r
  FROM {prev} LEFT JOIN c{t} ON {prev}.id = c{t}.d
)"""
        prev = f"r{t}"
    sql += f"\nSELECT id, r AS rank_fp FROM {prev}"
    return sql
