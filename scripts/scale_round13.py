#!/usr/bin/env python3
"""Round-13 probe (r12 verdict task 1): soft_dedup_weights under a
HEAVY-dup corpus, forced-broadcast vs Catalyst/AQE-decided.

The r12 broadcast audit flagged ``llm/dedup.soft_dedup_weights`` as the
last conditional scale-killer: it force-broadcast the weight table,
which is PAIR-GRAPH-sized — fine while dup pairs are sparse (the r6b
probe's regime), corpus-scaled on a heavy-dup corpus. This probe builds
exactly that regime — 50% of documents sit in 2-doc dup clusters, so
the weight table is corpus/2 rows — at 10x and 100x the sf0.1
documents row count, and times the full weight computation both ways:

- ``broadcast=True``  — the pre-r13 forced hint (driver collect + a
  per-task hash build of a multi-million-row table);
- ``broadcast=None``  — the r13 default: Catalyst/AQE picks, which at
  these sizes means shuffled SMJ/hash instead of a broadcast.

Docs and pairs are generated distributively (``spark.range`` + modular
arithmetic, no driver materialization) so the measured work is only
components + weight join + corpus join. A same-generator small anchor
(sparse regime) shows the two arms tie when the broadcast IS right —
the fix must not tax the common case.

    python scripts/scale_round13.py [n_docs ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _synth import get_spark, noop_time  # noqa: E402


def heavy_dup_inputs(spark, n_docs: int):
    """50%-dup corpus: even doc 2i pairs with 2i+1 for the first half of
    the id space -> n/4 pairs, n/2 docs in clusters of size 2. The
    weight table soft_dedup_weights builds is therefore n/2 rows —
    corpus-scaled, the audit's failure precondition."""
    from pyspark.sql import functions as F

    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(n_docs // 4)
        .select(
            (F.col("id") * 2).alias("id_a"),
            (F.col("id") * 2 + 1).alias("id_b"),
        )
    )
    return docs, pairs


def main() -> int:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        soft_dedup_weights,
    )

    spark = get_spark()
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [
        150_000,     # sparse-anchor scale (~10x sf0.1 documents rows)
        1_500_000,   # 10x
        15_000_000,  # 100x: 7.5M-row weight table, past executor broadcast
    ]

    # warm JVM/codegen on a tiny corpus so the first row isn't startup
    wd, wp = heavy_dup_inputs(spark, 20_000)
    noop_time(soft_dedup_weights(wd, wp, broadcast=None))

    print("n_docs | weight rows | forced bcast | aqe-decided | forced/aqe")
    prev = {}
    for n in sizes:
        walls = {}
        for mode, label in ((True, "forced"), (None, "aqe")):
            docs, pairs = heavy_dup_inputs(spark, n)
            walls[label] = noop_time(
                soft_dedup_weights(docs, pairs, broadcast=mode)
            )
        alpha = {
            k: (
                math.log(walls[k] / prev[k]) / math.log(n / prev["n"])
                if prev
                else float("nan")
            )
            for k in walls
        }
        print(
            f"{n:>10,} | {n // 2:>9,} | {walls['forced']:7.2f}s "
            f"(a={alpha['forced']:4.2f}) | {walls['aqe']:7.2f}s "
            f"(a={alpha['aqe']:4.2f}) | {walls['forced'] / walls['aqe']:5.2f}"
        )
        prev = {**walls, "n": n}
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
