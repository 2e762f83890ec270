#!/usr/bin/env python3
"""Round-6b scale probe: alpha exponents for the operators added this
round — boilerplate n-grams, PMI collocations, temperature mix, soft
dedup weights, BPE round-1 pair counts, and the full BPE trainer at a
fixed merge count. Protocol matches scale_round5b/6: seeded synthetic
docs, persisted pre-partitioned input, noop sink, unmeasured warmup.

    python scripts/scale_round6b.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _synth import synth_documents  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        collocations,
        curriculum_buckets_approx,
        release_plan_caches,
        temperature_sample,
        train_bpe_merges,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.bpe import (
        _initial_vocab,
        _pair_counts,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        boilerplate_ngrams,
        ngram_jaccard_pairs,
        soft_dedup_weights,
    )

    spark = get_spark("scale-6b")
    sizes = (5000, 20000)
    warmup_n = 2000
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
        docs = (
            spark.createDataFrame(synth_documents(n, seed=1))
            # skewed synthetic domains: source_i holds ~2^i-proportional mass
            .withColumn(
                "source",
                F.concat(
                    F.lit("src"),
                    F.floor(F.log2(F.col("doc_id") + 1)).cast("int").cast("string"),
                ),
            )
            .repartition(64)
        )
        docs.persist().count()

        run("boilerplate_ngrams", boilerplate_ngrams(docs, n=5), measured)
        run("pmi_collocations", collocations(docs, min_count=5), measured)
        run(
            "temperature_mix",
            temperature_sample(docs.select("doc_id", "source")),
            measured,
        )
        run("curriculum_approx", curriculum_buckets_approx(docs), measured)
        run("bpe_pair_counts", _pair_counts(_initial_vocab(docs, "text")), measured)
        small = docs.filter(F.col("doc_id") % 20 == 0)  # pair graph stays tiny
        run(
            "soft_dedup_weights",
            soft_dedup_weights(docs, ngram_jaccard_pairs(small, threshold=0.5)),
            measured,
        )
        # full trainer at fixed merges: wall ∝ rounds x per-round agg
        t0 = time.time()
        merges, vocab = train_bpe_merges(docs, n_merges=4)
        release_plan_caches(vocab)
        dt = time.time() - t0
        if measured:
            results.setdefault("bpe_train_4merges", []).append(dt)
        print(f"# bpe_train_4merges: {dt:.2f}s ({len(merges)} merges)", file=sys.stderr)
        docs.unpersist()

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
