#!/usr/bin/env python3
"""Round-7 STREAMING scale probe (VERDICT r6 task 6): per-batch wall time
of the incremental near-dup sink across 100 micro-batches at fixed batch
size. The design claim under test: per-batch cost tracks the BATCH's
bucket set (constant here), not the store size — the brange partition
prune + bucket min/max pruning keep history cost out of the hot path.
Also records the store-file-count curve and the effect of running
compact_band_store every 10 batches.

    python scripts/scale_round7.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _synth import synth_documents  # noqa: E402

N_BATCHES = 100
BATCH_DOCS = 20
COMPACT_EVERY = 10


def count_parquet_files(root: str) -> int:
    n = 0
    for _dir, _sub, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def run(spark, base: str, compact: bool) -> tuple[list[float], list[int]]:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.streaming.corpus import (
        _minhash_batch,
        compact_band_store,
    )

    store, pairs = os.path.join(base, "store"), os.path.join(base, "pairs")
    shutil.rmtree(base, ignore_errors=True)
    pdf = synth_documents(N_BATCHES * BATCH_DOCS, seed=7)
    times: list[float] = []
    files: list[int] = []
    for b in range(N_BATCHES):
        chunk = pdf.iloc[b * BATCH_DOCS : (b + 1) * BATCH_DOCS]
        batch = spark.createDataFrame(chunk)
        t0 = time.monotonic()
        _minhash_batch(
            batch,
            b,
            store_path=store,
            pairs_path=pairs,
            threshold=0.8,
            num_hashes=32,
            bands=8,
            shingle_words=3,
            text_col="text",
            id_col="doc_id",
            n_ranges=64,
            bucket_prune_limit=1024,
        )
        times.append(time.monotonic() - t0)
        if compact and b and b % COMPACT_EVERY == 0:
            compact_band_store(spark, store, max_files_per_range=2)
        files.append(count_parquet_files(store))
    return times, files


def main() -> None:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )

    spark = get_spark("scale-7-streaming")
    base = "/tmp/scale7"
    # warmup (unmeasured): JIT + first-parquet-commit costs
    run_times, _ = run(spark, os.path.join(base, "warm"), compact=False)
    del run_times

    for label, compact in (("no-compaction", False), ("compact-every-10", True)):
        times, files = run(spark, os.path.join(base, label), compact)
        # per-batch growth exponent: fit t_b ~ b^alpha over batches 5..100
        # (skip the store-less first batches)
        xs = np.log(np.arange(5, N_BATCHES) + 1.0)
        ys = np.log(np.array(times[5:]))
        alpha = float(np.polyfit(xs, ys, 1)[0])
        def w(sl):  # mean wall of a batch window
            return sum(times[sl]) / len(times[sl])
        print(
            f"{label}: per-batch mean b5-15={w(slice(5,15)):.3f}s "
            f"b45-55={w(slice(45,55)):.3f}s b90-100={w(slice(90,100)):.3f}s "
            f"alpha(batch-index)={alpha:.2f} "
            f"store files @b10/50/100 = {files[9]}/{files[49]}/{files[99]}"
        )
    print("load1", os.getloadavg()[0])


if __name__ == "__main__":
    main()
