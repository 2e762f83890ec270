#!/usr/bin/env python3
"""r19 VERDICT task 8: pin per-face plan-shape counters so later edits
cannot silently re-inflate what the optimization rounds flattened.

For every face named in PINNED_FACES (the r18+r19 optimized set — the
faces whose plan shape IS the optimization evidence), build the plan
under the test suite's session config (shuffle_partitions=8, AQE on) at
a fixed sf dir and record the robust counters from explain("formatted"):
Exchange / BroadcastExchange / join strategies / Python-eval nodes /
scans / windows. tests/test_plan_shape_guard.py rebuilds the plans under
the same config and fails on ANY counter drift.

Counters are config- and data-size-dependent (join strategy flips on
size estimates), so the pin records the sf dir and shuffle partitioning
it was generated under and the guard re-uses exactly those.

Usage: python scripts/gen_plan_shape_pins.py   (writes plans/plan_shape_pins.json)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_faces import plan_shape  # noqa: E402

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

PIN_SF_DIR = "/root/testdata/sf0.001"
PIN_SHUFFLE_PARTITIONS = 8
PINNED_COUNTERS = (
    "exchanges",
    "broadcast_ex",
    "smj",
    "bhj",
    "shj",
    "bnlj",
    "cartesian",
    "py_eval",
    "scans",
    "window",
)

# The r18-optimized faces (OPTIMIZATION_r18.md checklist) plus the faces
# the r19 round touched — the set whose plan shapes carry the two
# optimization rounds' evidence.
PINNED_FACES = [
    "pagerank", "ann_recall", "lsh_recall", "bpe_merges", "somatic_calls",
    "somatic_calls_bucketed", "mad_anomalies", "countmin_tokens",
    "distribution_drift", "ngram_jaccard", "ngram_jaccard_stoplist",
    "containment_dedup", "embedding_dups", "ann_ivf", "ann_ivf_trained",
    "minhash_lsh", "simhash_pairs", "substring_dedup", "hash_sample",
    "dataset_split", "sequence_pack", "temperature_mix",
    "quality_weighted_sample", "group_sample", "llm_corpus_pipeline",
    "curation_pipeline", "bfs_hops", "sssp_weighted", "kcore",
    "triangle_count", "dedup_components", "dedup_canonical",
    "dedup_weights", "hierarchy_rollup", "heavy_hitters",
    "jaccard_estimate", "clinical_merge_flow", "grouped_quantiles",
    "weighted_quantiles", "drift_by_segment", "anomaly_flags",
    "maf_reconcile", "bloom_pruned_dedup",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    spark = get_spark(
        "gen-plan-shape-pins", shuffle_partitions=PIN_SHUFFLE_PARTITIONS
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    pins: dict[str, dict[str, int]] = {}
    for name in PINNED_FACES:
        df = qs[name](spark, PIN_SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        shape = plan_shape(txt)
        pins[name] = {k: shape[k] for k in PINNED_COUNTERS}
        release_plan_caches(df)
        print(f"# {name}: {pins[name]}", file=sys.stderr)
    out = {
        "sf_dir": PIN_SF_DIR,
        "shuffle_partitions": PIN_SHUFFLE_PARTITIONS,
        "counters": list(PINNED_COUNTERS),
        "faces": pins,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "plan_shape_pins.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(pins)} faces")
    spark.stop()


if __name__ == "__main__":
    main()
