#!/usr/bin/env python3
"""Round-8b probe: alpha exponents for the three new stats-family
operators (grouped_quantiles, simpson_diversity, ks_drift_by_key) on
synthetic lattice-valued data. All three claim the same scale shape —
map-side-combinable agg(s) plus (for two of them) a per-key window
bounded by the distinct-VALUE lattice, never the row count — so alpha
should stay well under 1 while rows grow 16x against a FIXED lattice,
and the grouped-window partition must not grow with n at all.

    python scripts/scale_round8b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [200_000, 800_000, 3_200_000]
N_KEYS = 50
LATTICE = 5_000  # distinct values per key bounded by the value grid


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
        ks_drift_by_key,
        simpson_diversity,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def synth(n):
        # seeded, partition-parallel: key ~ uniform(N_KEYS), value on a
        # 1/100 lattice with LATTICE distinct points, cat ~ zipf-ish
        return (
            spark.range(n, numPartitions=64)
            .select(
                (F.col("id") % N_KEYS).cast("string").alias("k"),
                (F.round((F.xxhash64("id") % LATTICE + LATTICE) % LATTICE)
                 / F.lit(100.0)).alias("value"),
                ((F.xxhash64("id", F.lit(1)) % 20 + 20) % 20)
                .cast("string").alias("cat"),
                (F.col("id") % 2 == 0).alias("side"),
            )
        )

    results: dict[str, list[tuple[int, float]]] = {}

    def run(name, fn, warm_df):
        fn(warm_df).count()  # codegen warmup at smallest size
        for n in SIZES:
            df = synth(n).persist()
            df.count()
            t0 = time.monotonic()
            fn(df).count()
            dt = time.monotonic() - t0
            results.setdefault(name, []).append((n, dt))
            print(f"# {name} @ {n}: {dt:.2f}s", file=sys.stderr)
            df.unpersist()

    warm = synth(SIZES[0]).persist()
    warm.count()
    run("grouped_quantiles",
        lambda d: grouped_quantiles(d, "k", "value", [0.25, 0.5, 0.9]), warm)
    run("simpson_diversity",
        lambda d: simpson_diversity(d, "k", "cat"), warm)
    run("ks_drift_by_key",
        lambda d: ks_drift_by_key(
            d.filter("side"), d.filter("NOT side"), "k", "value"), warm)
    warm.unpersist()

    import math
    for name, rows in results.items():
        (n0, t0), (n1, t1) = rows[0], rows[-1]
        alpha = math.log(t1 / t0) / math.log(n1 / n0)
        pts = ", ".join(f"{n//1000}k:{t:.2f}s" for n, t in rows)
        print(f"{name}: {pts}  alpha={alpha:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
