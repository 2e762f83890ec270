#!/usr/bin/env python3
"""Per-face optimization profiler (r18 measurement harness, guide §1).

For each requested face: wall + process-tree CPU via repeated noop-sink
runs (same methodology as bench.py), plus plan-shape counters from
explain("formatted") — Exchange count, join strategies, Python-eval
nodes, scan count — and the Spark job/stage counts the face's action
spawned (statusTracker before/after). Writes explain text to --plan-dir
as <face>_<tag>.txt so before/after snapshots are diffable.

Usage:
  python scripts/profile_faces.py --faces simhash_pairs,bpe_merges --tag before
  python scripts/profile_faces.py --all --tag before --reps 1
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _proc_tree_cpu  # noqa: E402


def plan_shape(explain_text: str) -> dict:
    c = lambda pat: len(re.findall(pat, explain_text))  # noqa: E731
    return {
        "exchanges": c(r"\bExchange\b"),
        "broadcast_ex": c(r"BroadcastExchange"),
        "smj": c(r"SortMergeJoin"),
        "bhj": c(r"BroadcastHashJoin"),
        "shj": c(r"ShuffledHashJoin"),
        "bnlj": c(r"BroadcastNestedLoopJoin"),
        "cartesian": c(r"CartesianProduct"),
        "sorts": c(r"\bSort\b"),
        "py_eval": c(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|PythonMapInArrow"),
        "scans": c(r"Scan parquet|FileScan|Scan ExistingRDD|InMemoryTableScan"),
        "window": c(r"\bWindow\b"),
        "aqe": c(r"AdaptiveSparkPlan"),
        "codegen_spans": c(r"WholeStageCodegen"),
        "plan_lines": explain_text.count("\n"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plan-dir", default="")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--conf", action="append", default=[], help="extra k=v spark conf")
    args = ap.parse_args()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("ccdi-profile", extra_conf=extra or None)
    sc = spark.sparkContext
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = list(qs) if args.all else [n for n in args.faces.split(",") if n]
    bad = [n for n in names if n not in qs]
    if bad:
        sys.exit(f"unknown faces: {bad}")

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)

    out = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        rec: dict = {"runs": []}
        t_build0 = time.time()
        df = qs[name](spark, args.sf_dir)
        rec["build_s"] = round(time.time() - t_build0, 3)

        t_ex0 = time.time()
        explain_text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        rec["explain_s"] = round(time.time() - t_ex0, 3)
        rec["shape"] = plan_shape(explain_text)
        if args.plan_dir:
            with open(os.path.join(args.plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(explain_text)

        for rep in range(args.reps):
            # fresh plan each rep (bench methodology: the face function
            # re-runs per pass, including any driver-side loop/collect work
            # it does at build time — time build + noop together)
            c0 = _proc_tree_cpu()
            t0 = time.time()
            if rep > 0:
                df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            cpu = round(_proc_tree_cpu() - c0, 3)
            release_plan_caches(df)
            rec["runs"].append({"wall": wall, "cpu": cpu})
        rec["min_wall"] = min(r["wall"] for r in rec["runs"])
        rec["min_cpu"] = min(r["cpu"] for r in rec["runs"])
        out[name] = rec
        print(f"# {name}: build {rec['build_s']}s explain {rec['explain_s']}s "
              f"wall {[r['wall'] for r in rec['runs']]} cpu {[r['cpu'] for r in rec['runs']]} "
              f"ex={rec['shape']['exchanges']} smj={rec['shape']['smj']} "
              f"bhj={rec['shape']['bhj']} py={rec['shape']['py_eval']} "
              f"lines={rec['shape']['plan_lines']}", file=sys.stderr)
        sc.setJobDescription(None)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
