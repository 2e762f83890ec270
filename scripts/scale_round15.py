#!/usr/bin/env python3
"""Round-15 probe (r14 verdict task 4): the somatic bucketed decade
probe re-run with BOUNDED heap pressure.

The r14 run (`scale_round11.py merge 1 10 100`) put all three scales
and both arms through ONE JVM: at 100x the in-flight merge caught a
GCLocker retry warning and the 10x in-flight row visibly GC-thrashed
(6.3x/decade vs 1.8x at the next decade), so the in-flight-vs-rerun
ratios at depth were noisy. This probe runs every (scale, arm) cell in
its OWN fresh subprocess JVM — heap dies with the cell, no arm inherits
another's old-gen — and the parent greps each cell's stderr for GC
warnings so the table itself certifies the run was clean.

Each cell warms its own arm's full path at 1x before measuring (a
fresh JVM would otherwise pay first-execution C2 compilation in the
measured row — the lsh_recall/pass-0 mechanism).

Arms per scale (same generator `_synth.synth_cohort`, same 32 buckets,
broadcast disabled, as r11/r14):
  * inflight  — the two-sided shuffle merge (snv_somatic)
  * bucketed  — one-time bucketed ingest (write_snv_sides_bucketed),
                then the exchange-free re-run (snv_somatic_bucketed)

    python scripts/scale_round15.py [mult ...]      # parent (default 1 10 100)
    python scripts/scale_round15.py --cell ARM MULT # one child cell (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = 500_000
N_BUCKETS = 32
WH = "/tmp/scale_r15_bucketed"
GC_MARKERS = ("GCLocker", "Full GC", "OutOfMemory")


def run_cell(arm: str, mult: int) -> int:
    """One (arm, scale) measurement in this (fresh) JVM; prints a JSON
    line the parent parses."""
    from _synth import get_spark, noop_time, synth_cohort

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        pair_patients,
        snv_somatic,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch_bucketed import (
        snv_somatic_bucketed,
        write_snv_sides_bucketed,
    )

    spark = get_spark()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # Warmup runs THIS ARM's full path at 1x (BASE) scale so the measured
    # row never pays first-in-JVM C2 compilation. A fresh JVM per cell
    # removes the r14 GC cross-talk but would otherwise ADD cold-JIT tax
    # (first run of this probe showed the 10x bucketed re-run at 14.5s
    # cold vs 2.65s warm — the exact lsh_recall/pass-0 mechanism bench.py
    # discards); warming the same code path at 1x restores the r14
    # warm-path comparability while keeping each cell's heap isolated.
    w_vcf, w_manifest = synth_cohort(spark, BASE, n_pat=20)
    w_pairs = pair_patients(w_manifest)
    if arm == "inflight":
        noop_time(snv_somatic(w_vcf, w_pairs))
    else:
        write_snv_sides_bucketed(
            w_vcf, w_pairs, "snv_t_warm", "snv_n_warm", n_buckets=N_BUCKETS,
            tumor_path=f"{WH}/t_warm_{mult}", normal_path=f"{WH}/n_warm_{mult}",
        )
        noop_time(snv_somatic_bucketed(spark, "snv_t_warm", "snv_n_warm"))
        spark.sql("DROP TABLE IF EXISTS snv_t_warm")
        spark.sql("DROP TABLE IF EXISTS snv_n_warm")

    n = BASE * mult
    vcf, manifest = synth_cohort(spark, n, n_pat=max(20, n // 25_000))
    pairs = pair_patients(manifest)
    out: dict[str, float | int | str] = {"arm": arm, "mult": mult}

    if arm == "inflight":
        out["merge_s"] = round(noop_time(snv_somatic(vcf, pairs)), 2)
    elif arm == "bucketed":
        tt, nt = f"snv_t_{mult}", f"snv_n_{mult}"
        t0 = time.time()
        write_snv_sides_bucketed(
            vcf, pairs, tt, nt, n_buckets=N_BUCKETS,
            tumor_path=f"{WH}/t{mult}", normal_path=f"{WH}/n{mult}",
        )
        out["ingest_s"] = round(time.time() - t0, 2)
        rerun = snv_somatic_bucketed(spark, tt, nt)
        plan = rerun._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed merge plan has an Exchange"
        out["rerun_s"] = round(noop_time(snv_somatic_bucketed(spark, tt, nt)), 2)
        spark.sql(f"DROP TABLE IF EXISTS {tt}")
        spark.sql(f"DROP TABLE IF EXISTS {nt}")
    else:
        print(f"unknown arm {arm!r}", file=sys.stderr)
        return 2
    print("CELL " + json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        return run_cell(sys.argv[2], int(sys.argv[3]))

    bad = [a for a in sys.argv[1:] if not (a.isdigit() and int(a) > 0)]
    if bad:
        print(f"usage: scale_round15.py [mult ...]; bad arg(s) {bad}",
              file=sys.stderr)
        return 2
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    shutil.rmtree(WH, ignore_errors=True)
    os.makedirs(WH, exist_ok=True)
    rows: dict[int, dict[str, object]] = {m: {} for m in mults}
    try:
        for mult in mults:
            for arm in ("inflight", "bucketed"):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--cell", arm, str(mult)],
                    capture_output=True, text=True, cwd=ROOT,
                )
                cell = None
                for line in p.stdout.splitlines():
                    if line.startswith("CELL "):
                        cell = json.loads(line[5:])
                if p.returncode != 0 or cell is None:
                    print(f"{arm} {mult}x FAILED rc={p.returncode}\n"
                          f"{p.stderr[-2000:]}", file=sys.stderr)
                    return 1
                gc_hits = [m for m in GC_MARKERS if m in p.stderr]
                cell[f"gc_clean_{arm}"] = not gc_hits
                if gc_hits:
                    print(f"# {arm} {mult}x stderr GC markers: {gc_hits}",
                          file=sys.stderr)
                rows[mult].update(cell)
                print(f"# done {arm} {mult}x: {cell}", file=sys.stderr)
    finally:
        shutil.rmtree(WH, ignore_errors=True)

    print(f"base={BASE:,} buckets={N_BUCKETS} (fresh JVM per cell)")
    print("scale | ingest (write bkt) | in-flight merge | bucketed re-run "
          "| in-flight/re-run | gc-clean")
    for mult in mults:
        r = rows[mult]
        # rerun_s is rounded to 2 decimals upstream: a sub-1x smoke run
        # can legitimately read 0.0 — don't lose the whole table to a
        # ZeroDivisionError after every cell has already run (r15 advice)
        ratio = float(r["merge_s"]) / max(float(r["rerun_s"]), 0.01)
        clean = r["gc_clean_inflight"] and r["gc_clean_bucketed"]
        print(f"{mult:4}x ({BASE * mult / 1e6:g}M) | {r['ingest_s']:7.2f}s | "
              f"{r['merge_s']:7.2f}s | {r['rerun_s']:7.2f}s | {ratio:5.2f} | "
              f"{'yes' if clean else 'NO'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
