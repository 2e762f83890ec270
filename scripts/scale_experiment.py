#!/usr/bin/env python3
"""Scale-stress experiment: measure how the LLM dedup/ANN operators scale
with corpus size on iid synthetic data (seeded, matching the testdata
shape), and report the per-op scaling exponent alpha in t ~ n^alpha.

Near-linear (alpha ~ 1) means the plan survives a 100x scale-up; alpha ~ 2
means a hidden all-pairs blowup. Run standalone:

    python scripts/scale_experiment.py [--out /tmp/scale]

Results append a markdown table to stdout; SCALE_NOTES.md records one run.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _synth import synth_documents, synth_embeddings  # noqa: E402,F401


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale")
    args = ap.parse_args()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        embedding_dup_pairs_lsh,
        exact_dedup,
        minhash_dedup_pairs_universal,
        release_plan_caches,
        simhash_dedup_pairs_md5,
    )

    spark = get_spark("scale-experiment")
    spark.range(1).write.format("noop").mode("overwrite").save()  # warm

    def materialize(name, n, maker):
        # write pre-partitioned: a single-file corpus scans as ONE task and
        # serializes the per-doc hashing — real corpora arrive in thousands
        # of splits, so the experiment should too
        path = os.path.join(args.out, f"{name}_{n}.parquet")
        if not os.path.exists(path):
            spark.createDataFrame(maker(n)).repartition(64).write.mode(
                "overwrite"
            ).parquet(path)
        return spark.read.parquet(path)

    ops = {}  # op -> list of (n, seconds, rows)

    def bench(op, n, df_fn, warm=False):
        df = df_fn()
        t0 = time.time()
        rows = df.count()
        dt = time.time() - t0
        release_plan_caches(df)
        if warm:  # first invocation pays whole-stage codegen compilation
            return
        ops.setdefault(op, []).append((n, dt, rows))
        print(f"# {op} n={n}: {dt:.2f}s rows={rows}", flush=True)

    warm_docs = materialize("documents", 1_000, lambda k: synth_documents(k, seed=3))
    bench("exact_dedup", 0, lambda: exact_dedup(warm_docs), warm=True)
    bench("minhash_universal", 0, lambda: minhash_dedup_pairs_universal(warm_docs), warm=True)
    bench("simhash_md5", 0, lambda: simhash_dedup_pairs_md5(warm_docs), warm=True)
    warm_emb = materialize("embeddings", 1_000, lambda k: synth_embeddings(k, 64, seed=5))
    bench(
        "embedding_dups_lsh(auto-P)",
        0,
        lambda: embedding_dup_pairs_lsh(warm_emb, threshold=0.45, num_planes=None),
        warm=True,
    )

    for n in (5_000, 20_000):
        docs = materialize("documents", n, lambda k: synth_documents(k, seed=3))
        bench("exact_dedup", n, lambda: exact_dedup(docs))
        bench("minhash_universal", n, lambda: minhash_dedup_pairs_universal(docs))
        bench("simhash_md5", n, lambda: simhash_dedup_pairs_md5(docs))

    for n in (2_000, 8_000, 32_000):
        emb = materialize("embeddings", n, lambda k: synth_embeddings(k, 64, seed=5))
        bench(
            "embedding_dups_lsh(auto-P)",
            n,
            lambda: embedding_dup_pairs_lsh(emb, threshold=0.45, num_planes=None),
        )

    # round-4 ops
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
        pack_sequences,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        star_contraction,
    )

    bench("ngram_jaccard(stoplist)", 0,
          lambda: ngram_jaccard_pairs(warm_docs, max_doc_freq=5), warm=True)
    bench("pack_sequences", 0, lambda: pack_sequences(warm_docs), warm=True)
    for n in (5_000, 20_000):
        docs = materialize("documents", n, lambda k: synth_documents(k, seed=3))
        bench("ngram_jaccard(stoplist)", n,
              lambda: ngram_jaccard_pairs(docs, max_doc_freq=5))
        bench("pack_sequences", n, lambda: pack_sequences(docs))

    # round-5 ops: corpus hygiene
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        build_vocab,
        decontaminate,
        encode_tokens,
    )

    def hygiene_bench(docs):
        # fixed small benchmark (the realistic shape: eval set ~ constant
        # while the corpus grows), vocab rebuilt per size (it grows with n)
        bench_docs = warm_docs.limit(200)
        return {
            "decontaminate": lambda: decontaminate(docs, bench_docs, n=4),
            "encode_tokens": lambda: encode_tokens(docs, build_vocab(docs, min_df=5)),
        }

    for op, fn in hygiene_bench(warm_docs).items():
        bench(op, 0, fn, warm=True)
    for n in (5_000, 20_000):
        docs = materialize("documents", n, lambda k: synth_documents(k, seed=3))
        for op, fn in hygiene_bench(docs).items():
            bench(op, n, fn)

    # round-5b ops: relevance, LM quality, semantic dedup, incremental dedup
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        bm25_topk,
        incremental_dedup,
        semantic_dup_pairs,
        unigram_logprob_profile,
    )
    from pyspark.sql import functions as F

    bm_terms = ["w3", "w17", "w256", "w4099"]

    def r5b_bench(docs, n):
        half = docs.filter(F.col("doc_id") % 2 == 0)
        rest = docs.filter(F.col("doc_id") % 2 == 1)
        seen = exact_dedup(half).select("fp")
        return {
            "bm25_topk": lambda: bm25_topk(docs, bm_terms, k=20),
            "unigram_logprob": lambda: unigram_logprob_profile(docs),
            "incremental_dedup": lambda: incremental_dedup(rest, seen),
        }

    for op, fn in r5b_bench(warm_docs, 1_000).items():
        bench(op, 0, fn, warm=True)
    for n in (5_000, 20_000):
        docs = materialize("documents", n, lambda k: synth_documents(k, seed=3))
        for op, fn in r5b_bench(docs, n).items():
            bench(op, n, fn)

    # semantic dedup: K grows with n (the SemDeDup recipe — constant
    # expected cluster size), quantizer is a seeded random matrix (assignment
    # cost is what scales; quantizer quality is irrelevant to timing)
    def rand_cents(k, dim, seed=17):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((k, dim)).tolist()

    bench("semantic_dedup(K=n/500)", 0,
          lambda: semantic_dup_pairs(warm_emb, rand_cents(4, 64), threshold=0.45),
          warm=True)
    for n in (2_000, 8_000, 32_000):
        emb = materialize("embeddings", n, lambda k: synth_embeddings(k, 64, seed=5))
        k = max(4, n // 500)
        bench("semantic_dedup(K=n/500)", n,
              lambda: semantic_dup_pairs(emb, rand_cents(k, 64), threshold=0.45))

    # star contraction: chain graphs (worst case); rounds must stay O(log n)
    import pandas as pd

    for n in (1_000, 4_000, 16_000):
        chain = pd.DataFrame(
            {"src": np.arange(n - 1, dtype=np.int64),
             "dst": np.arange(1, n, dtype=np.int64)}
        )
        edges = spark.createDataFrame(chain).repartition(16)
        t0 = time.time()
        labels, rounds = star_contraction(edges)
        rows = labels.count()
        dt = time.time() - t0
        ops.setdefault("star_contraction(chain)", []).append((n, dt, rows))
        print(f"# star_contraction(chain) n={n}: {dt:.2f}s rounds={rounds} rows={rows}",
              flush=True)

    print("\n| op | sizes | times (s) | scaling exponent |")
    print("|---|---|---|---|")
    for op, rows in ops.items():
        ns = [r[0] for r in rows]
        ts = [r[1] for r in rows]
        alpha = math.log(ts[-1] / ts[0]) / math.log(ns[-1] / ns[0])
        print(
            f"| {op} | {ns} | {[round(t, 2) for t in ts]} | {alpha:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
