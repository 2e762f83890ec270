#!/usr/bin/env python3
"""Round-6 scale probe: pin the graph-family alpha exponents at 10x the
edge counts the 5b probe used (the judge's ask: graph rows in SCALE_NOTES
with measured exponents like the dedup families have), plus the totalized
fuzzy join on a mixed-length dictionary.

Protocol matches scale_round5b.py: seeded synthetic data, pre-partitioned
persisted input, noop-sink count-forced, unmeasured warmup pass first
(whole-stage-codegen compilation otherwise lands on the first measured
size), alpha from t ~ |E|^alpha at the two endpoints.

    python scripts/scale_round6.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def triangle_count(edges):
    """The registry's q_triangle_count join core over a ready edge list
    (id_a < id_b canonical): e1(a,b) |><| e2(b,c) |><| e3(a,c)."""
    from pyspark.sql import functions as F

    e = edges.persist()
    e1 = e.toDF("a", "b")
    e2 = e.toDF("b", "c")
    e3 = e.toDF("a", "c")
    out = e1.join(e2, "b").join(e3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    out._probe_cache = e  # released by run()
    return out


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        fuzzy_self_join,
        pagerank_fixed,
    )

    spark = get_spark("scale-6")
    # |E| endpoints: 10x the 5b probe's largest graph (5b: n=20k, |E|=80k
    # measured only as part of pagerank; here edges are the controlled var)
    edge_sizes = (20_000, 200_000)
    warmup_e = 8_000
    results: dict[str, list[float]] = {}

    def run(name, df, measured=True):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)
        if hasattr(df, "_probe_cache"):
            df._probe_cache.unpersist()
        dt = time.time() - t0
        if measured:
            results.setdefault(name, []).append(dt)
        print(f"# {name} @ {df._probe_size}: {dt:.2f}s", file=sys.stderr)

    for m in (warmup_e, *edge_sizes):
        measured = m != warmup_e
        rng = np.random.default_rng(17)
        n = m // 4  # keep mean degree fixed at 8 (undirected) across sizes
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        pg = (
            spark.createDataFrame(pd.DataFrame({"id_a": src, "id_b": dst}))
            .filter("id_a != id_b")
            .repartition(64)
        )
        pg.persist().count()

        d = pagerank_fixed(pg, iters=3)
        d._probe_size = m
        run("pagerank_3iter", d, measured)

        canon = (
            pg.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .distinct()
        )
        t = triangle_count(canon)
        t._probe_size = m
        run("triangle_count", t, measured)
        pg.unpersist()

        # totalized fuzzy join: 30% of the dictionary BELOW the q-gram
        # soundness bound (len < 6 at q=3,k=1) so the short stratum's
        # length-bucket path is actually on the measured path
        dn = m // 10
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        lens = np.where(rng.random(dn) < 0.3, rng.integers(2, 6, dn), 12)
        names = pd.DataFrame(
            {
                "id": np.arange(dn, dtype=np.int64),
                "name": [
                    "".join(rng.choice(letters, int(ln))) for ln in lens
                ],
            }
        )
        nd = spark.createDataFrame(names).repartition(64)
        nd.persist().count()
        f = fuzzy_self_join(nd, "id", "name", max_dist=1)
        f._probe_size = dn
        run("fuzzy_mixed_lengths", f, measured)
        nd.unpersist()

    print("| op | edge sizes | times (s) | alpha |")
    print("|---|---|---|---|")
    for name, ts in results.items():
        alpha = math.log(max(ts[-1], 1e-3) / max(ts[0], 1e-3)) / math.log(
            edge_sizes[-1] / edge_sizes[0]
        )
        times = " → ".join(f"{t:.2f}" for t in ts)
        print(
            f"| {name} | {' → '.join(str(s) for s in edge_sizes)} | {times} | {alpha:.2f} |"
        )


if __name__ == "__main__":
    main()
