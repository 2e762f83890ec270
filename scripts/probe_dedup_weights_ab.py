#!/usr/bin/env python3
"""r19 VERDICT task 3: re-baseline dedup_weights in isolation.

One fresh session; the face's exact plan built both ways — shingle cache
ON (the r18 batch-2 form) and OFF (the r18 batch-5 opt-out that shipped)
— run ALTERNATING (A/B/A/B…) for --reps each so box drift lands on both
arms equally. Reports per-arm wall and process-tree CPU (min/median) and
the executed-plan shape counters, so the r18 regression (0.99 -> 2.18 s
wall, CPU ~2x, plan byte-identical) either reproduces with a named cause
or closes as measurement context.

Usage: python scripts/probe_dedup_weights_ab.py [--reps 5] [--sf DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _proc_tree_cpu  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
        load_table,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        ngram_jaccard_pairs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        release_plan_caches,
        soft_dedup_weights,
    )
    from pyspark.sql import functions as F

    spark = get_spark("probe-dedup-weights-ab")

    def build(cache: bool):
        d = load_table(spark, args.sf, "documents").filter(F.col("doc_id") < 1000)
        return soft_dedup_weights(
            d, ngram_jaccard_pairs(d, threshold=0.5, cache=cache)
        )

    def run(cache: bool) -> tuple[float, float]:
        spark.sparkContext.setJobDescription(
            f"dedup_weights cache={'on' if cache else 'off'}"
        )
        c0 = _proc_tree_cpu()
        t0 = time.time()
        df = build(cache)
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)
        return round(time.time() - t0, 3), round(_proc_tree_cpu() - c0, 3)

    # one untimed warmup per arm (JIT/codegen)
    run(True)
    run(False)
    walls: dict[str, list[float]] = {"on": [], "off": []}
    cpus: dict[str, list[float]] = {"on": [], "off": []}
    for _ in range(args.reps):
        for arm, cache in (("on", True), ("off", False)):
            w, c = run(cache)
            walls[arm].append(w)
            cpus[arm].append(c)
    out = {
        arm: {
            "wall_min": min(walls[arm]),
            "wall_med": round(statistics.median(walls[arm]), 3),
            "walls": walls[arm],
            "cpu_min": min(cpus[arm]),
            "cpu_med": round(statistics.median(cpus[arm]), 3),
            "cpus": cpus[arm],
        }
        for arm in ("on", "off")
    }
    with open("/proc/loadavg") as f:
        out["loadavg"] = f.read().split()[:3]
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
