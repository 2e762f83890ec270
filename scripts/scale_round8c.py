#!/usr/bin/env python3
"""Round-8c probe: alpha exponents for the six new analytics operators.

Claims under test (each operator's docstring):
* heavy_hitters — the MG candidate pass bounds the shuffle by k per
  partition, so cost grows with the base SCAN, not the vocabulary; the
  probe grows vocabulary ~n/10 (the naive groupBy's worst case) while
  the heavy set stays fixed.
* mad_anomalies — both median passes collapse onto the per-key distinct-
  value lattice (fixed here), so post-shuffle work is constant while
  rows grow 16x.
* sorted_neighborhood — pair fan-out is exactly `window` per row
  (exploded equi-join), so pairs and cost grow LINEARLY in rows.
* decayed_trending — one scalar broadcast + one keyed agg; pure scan.
* bfs_hops — bounded rounds of keyed joins; linear in edges.

    python scripts/scale_round8c.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        bfs_hops,
        decayed_scores,
        heavy_hitters,
        mad_anomalies,
        sorted_neighborhood_pairs,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, fn, sizes, warm):
        fn(warm)  # codegen + JIT warmup at the smallest size
        ts = []
        for n in sizes:
            t0 = time.monotonic()
            fn(n)
            ts.append(time.monotonic() - t0)
        import math

        alpha = math.log(ts[-1] / ts[0]) / math.log(sizes[-1] / sizes[0])
        print(
            f"{label}: "
            + " ".join(f"{n}={t:.2f}s" for n, t in zip(sizes, ts))
            + f" alpha={alpha:.2f}"
        )

    # -------------------------------------------------- heavy hitters
    def hh(n):
        # 10 fixed giants hold half the mass; tail vocab grows ~ n/10
        df = spark.range(n, numPartitions=64).select(
            F.when(
                F.col("id") % 2 == 0, F.concat(F.lit("g"), (F.col("id") % 10))
            )
            .otherwise(F.concat(F.lit("t"), ((F.xxhash64("id") % (n // 10) + (n // 10)) % (n // 10))))
            .alias("x")
        )
        heavy_hitters(df, "x", support_inv=50).count()

    timed("heavy_hitters (vocab ~ n/10)", hh, [500_000, 2_000_000, 8_000_000], 500_000)

    # -------------------------------------------------- mad anomalies
    def mad(n):
        df = spark.range(n, numPartitions=64).select(
            (F.col("id") % 50).cast("string").alias("k"),
            ((F.xxhash64("id") % 5000 + 5000) % 5000).alias("x"),
        )
        mad_anomalies(df, "k", "x").count()

    timed("mad_anomalies (5k lattice)", mad, [200_000, 800_000, 3_200_000], 200_000)

    # -------------------------------------------- sorted neighborhood
    def snb(n):
        df = spark.range(n, numPartitions=64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat(F.lit("w"), ((F.xxhash64("id") % 997 + 997) % 997)),
                F.concat(F.lit("w"), ((F.xxhash64("id", F.lit(1)) % 997 + 997) % 997)),
                F.concat(F.lit("w"), ((F.xxhash64("id", F.lit(2)) % 997 + 997) % 997)),
                F.concat(F.lit("w"), ((F.xxhash64("id", F.lit(3)) % 997 + 997) % 997)),
            ).alias("text"),
        )
        sorted_neighborhood_pairs(df, "doc_id", "text", window=3).count()

    timed("sorted_neighborhood (w=3)", snb, [50_000, 200_000, 800_000], 50_000)

    # ------------------------------------------------ decayed trending
    def dec(n):
        df = spark.range(n, numPartitions=64).select(
            (F.col("id") % 20).cast("string").alias("k"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.xxhash64("id") % 2_500_000 + 2_500_000) % 2_500_000
            ).alias("ts"),
        )
        decayed_scores(df, "k", "ts").count()

    timed("decayed_trending", dec, [500_000, 2_000_000, 8_000_000], 500_000)

    # -------------------------------------------------------- bfs hops
    def bfs(n_edges):
        nodes = n_edges // 4  # avg degree 8 undirected
        e = spark.range(n_edges, numPartitions=64).select(
            ((F.xxhash64("id") % nodes + nodes) % nodes).alias("src"),
            ((F.xxhash64("id", F.lit(1)) % nodes + nodes) % nodes).alias("dst"),
        )
        seeds = spark.range(10).select(F.col("id").alias("node"))
        bfs_hops(e, seeds, max_hops=3).count()

    timed("bfs_hops (3 rounds)", bfs, [100_000, 400_000, 1_600_000], 100_000)

    return 0




def wave3() -> int:
    """Wave-3 probe: pointer-doubling hierarchy (log-depth rounds over a
    deep chain forest) and weighted SSSP (linear in edges, bounded
    rounds). Run: python scripts/scale_round8c.py wave3"""
    from pyspark.sql import SparkSession, functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        hierarchy_rollup,
        sssp_hops,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import math
    import time

    def timed(label, fn, sizes, warm):
        fn(warm)
        ts = []
        for n in sizes:
            t0 = time.monotonic()
            fn(n)
            ts.append(time.monotonic() - t0)
        alpha = math.log(ts[-1] / ts[0]) / math.log(sizes[-1] / sizes[0])
        print(
            f"{label}: "
            + " ".join(f"{n}={t:.2f}s" for n, t in zip(sizes, ts))
            + f" alpha={alpha:.2f}"
        )

    def hier(n):
        # dense 0..n-1, parent = node div 10 (nodes < 100 self-rooted):
        # depth ~ log10(n), covered by 4 doubling rounds up to n = 1e16
        nodes = spark.range(n, numPartitions=64).select(
            F.col("id").alias("node"),
            F.when(F.col("id") < 100, F.col("id"))
            .otherwise(F.expr("id div 10"))
            .alias("parent"),
            (F.col("id") % 1000).alias("v"),
        )
        hierarchy_rollup(nodes, "node", "parent", "v", rounds=4).count()

    timed("hierarchy_rollup (4 doubling rounds)", hier, [500_000, 2_000_000, 8_000_000], 500_000)

    def sssp(n_edges):
        nodes = n_edges // 4
        e = spark.range(n_edges, numPartitions=64).select(
            ((F.xxhash64("id") % nodes + nodes) % nodes).alias("src"),
            ((F.xxhash64("id", F.lit(1)) % nodes + nodes) % nodes).alias("dst"),
            ((F.col("id") % 9) + 1).alias("wt"),
        )
        seeds = spark.range(10).select(F.col("id").alias("node"))
        sssp_hops(e, seeds, max_hops=3).count()

    timed("sssp_hops (3 rounds)", sssp, [100_000, 400_000, 1_600_000], 100_000)
    return 0


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == "wave3":
        raise SystemExit(wave3())
    raise SystemExit(main())
