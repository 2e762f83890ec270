#!/usr/bin/env python3
"""Scale-stress probe for the round-5b operator family: as-of join, LOCF
resampling, prefix-filtered vs naive Jaccard, containment, random
projection, int8 quantization. Protocol matches scale_experiment.py:
seeded synthetic data, pre-partitioned input, count-forced, alpha in
t ~ n^alpha from the two endpoint sizes.

    python scripts/scale_round5b.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _synth import synth_documents, synth_embeddings  # noqa: E402
from _synth import synth_events_daily as synth_events  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        containment_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
        quantize_embeddings,
        random_projection,
        release_plan_caches,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        asof_join,
        fuzzy_self_join,
        pagerank_fixed,
        resample_locf,
    )

    spark = get_spark("scale-5b")
    sizes = (5000, 20000)
    warmup_n = 2000  # codegen/JIT warmup pass, not measured
    results: dict[str, list[float]] = {}

    def run(name, df, measured=True):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)
        dt = time.time() - t0
        if measured:
            results.setdefault(name, []).append(dt)
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    for n in (warmup_n, *sizes):
        measured = n != warmup_n
        docs = spark.createDataFrame(synth_documents(n, seed=1)).repartition(64)
        docs.persist().count()
        ev = spark.createDataFrame(synth_events(n, seed=2)).repartition(64)
        ev.persist().count()
        emb = spark.createDataFrame(synth_embeddings(n, 64, seed=3)).repartition(64)
        emb.persist().count()

        left = ev.filter(F.col("event_type") == "purchase")
        right = ev.filter(F.col("event_type") == "click")
        run(
            "asof_join",
            asof_join(left, right, ["user_id"], "ts", ["value"], tiebreak="event_id"),
            measured,
        )
        run(
            "resample_locf",
            resample_locf(ev, ["user_id"], "ts", "value", tiebreak="event_id"),
            measured,
        )
        run("jaccard_naive", ngram_jaccard_pairs(docs, threshold=0.5), measured)
        run("jaccard_prefix", ngram_jaccard_pairs_prefix(docs, threshold=0.5), measured)
        run("containment", containment_pairs(docs, threshold=0.8), measured)
        run("random_projection", random_projection(emb, k=8, dim=64), measured)
        run("quantize", quantize_embeddings(emb), measured)
        # fuzzy join over a DIVERSE name dictionary (12-char random strings)
        import pandas as pd
        rng2 = np.random.default_rng(17)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        names = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "name": ["".join(rng2.choice(letters, 12)) for _ in range(n)],
        })
        nd = spark.createDataFrame(names).repartition(64)
        nd.persist().count()
        run("fuzzy_join", fuzzy_self_join(nd, "id", "name", max_dist=1), measured)
        nd.unpersist()
        # pagerank over a random sparse pair graph, |E| = 4n
        src = rng2.integers(0, n, 4 * n)
        dst = rng2.integers(0, n, 4 * n)
        pg = spark.createDataFrame(
            pd.DataFrame({"id_a": src, "id_b": dst})
        ).filter("id_a != id_b").repartition(64)
        pg.persist().count()
        run("pagerank_3iter", pagerank_fixed(pg, iters=3), measured)
        pg.unpersist()
        for c in (docs, ev, emb):
            c.unpersist()

    print("| op | sizes | times (s) | alpha |")
    print("|---|---|---|---|")
    for name, ts in results.items():
        alpha = math.log(max(ts[-1], 1e-3) / max(ts[0], 1e-3)) / math.log(
            sizes[-1] / sizes[0]
        )
        times = " → ".join(f"{t:.2f}" for t in ts)
        print(f"| {name} | {' → '.join(str(s) for s in sizes)} | {times} | {alpha:.2f} |")


if __name__ == "__main__":
    main()
