#!/usr/bin/env python3
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall-clock seconds. Results are forced with the noop sink (full
execution, no driver collect).

Self-defending against load contamination (r4 verdict #3, tightened per
the r9 verdict: the driver's BENCH_r09 started at load1 5.32 yet reported
contended=false because only the post-settle load was consulted):
- records /proc/loadavg (1-min AND 5-min) before starting, and waits
  (bounded) for the 1-min load to settle below a threshold before
  measuring;
- a high START load now REFUSES the settle: the box stays measurably slow
  until the 5-min average drains (the r7 contaminated-run lesson), so the
  artifact is flagged contended whenever the start load1, the settled
  load1, or the settled load5 exceeds the threshold — drift is then
  diagnosable from the artifact alone;
- runs up to $SPARK_GRAFT_BENCH_REPS (default 3) full passes inside the
  driver's time budget; pass 0 is untimed JVM/JIT warmup (r13
  adjudication) and the per-query statistic is the MIN over the warm
  passes (r14 verdict task 2: background load only ever ADDS time, so
  min is the drift-robust estimator — medians were inflated by one-pass
  load spikes in r12/r13/r14 and cost a hand-adjudication each time).
  The artifact records the spread, per-pass totals, per-pass load
  snapshots and the warm-pass count (n_warm), so an anomalous run is
  diagnosable from the artifact alone.

Methodology note: r14 switched medians from all-pass to warm-only; r15
switched warm-median to warm-min. Artifacts are comparable only within
the same `stat` value ("min_warm" vs earlier medians) — BENCH_NOTES.md
restates the tracked baselines under the current statistic.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

SETTLE_LOAD = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "8.0"))
SETTLE_WAIT_S = 60.0
TIME_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "520"))
MAX_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _loadavg() -> tuple[float, float]:
    """(load1, load5); (-1, -1) when /proc is unreadable."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
            return float(parts[0]), float(parts[1])
    except (OSError, ValueError, IndexError):
        return -1.0, -1.0


def main() -> None:
    start = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    load_at_start, load5_at_start = _loadavg()
    settled_load, settled_load5 = load_at_start, load5_at_start
    while settled_load > SETTLE_LOAD and time.time() - start < SETTLE_WAIT_S:
        print(f"# load {settled_load:.2f} > {SETTLE_LOAD}; settling...", file=sys.stderr)
        time.sleep(5)
        settled_load, settled_load5 = _loadavg()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import get_spark

    spark = get_spark("ccdi-spark-bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm the JVM/codegen paths so the first measured query of each shape
    # doesn't pay session startup or whole-stage-codegen compilation:
    # scan+agg (tpch_q1) and the HOF/text family (doc_quality)
    for warm in ("tpch_q1_agg", "doc_quality"):
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    samples: dict[str, list[float]] = {name: [] for name in qs}
    pass_totals: list[float] = []
    pass_loads: list[list[float]] = []
    for rep in range(MAX_REPS):
        remaining = TIME_BUDGET_S - (time.time() - start)
        if rep > 0 and pass_totals and remaining < pass_totals[-1] * 1.25:
            print(f"# stopping after {rep} pass(es): {remaining:.0f}s left", file=sys.stderr)
            break
        pass_total = 0.0
        for name, fn in qs.items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            release_plan_caches(df)  # dedup plans persist intermediates; drop them
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            pass_total += dt
            print(f"# pass{rep} {name}: {dt:.3f}s", file=sys.stderr)
        pass_totals.append(pass_total)
        # load snapshot at pass END: a spike that landed inside this pass
        # is still visible in load5 here, so per-pass contamination is
        # diagnosable from the artifact alone (r14 verdict task 2)
        pass_loads.append(list(_loadavg()))

    # Discard pass 0 as JVM warmup whenever at least one later pass exists
    # (r13 adjudication: the r13 rotation moved lsh_recall from position
    # 39 to 5 in the run order and its bench median jumped 2.6s -> 8.6s
    # with a BYTE-IDENTICAL physical plan — pass timings 13.1/8.6/2.5
    # were pure C2-JIT maturation that position-39 faces never paid
    # because 35 earlier faces warmed the JIT for them. Median-including-
    # pass0 therefore taxes whichever faces each round's rotation happens
    # to put early; discarding pass 0 makes the per-face number
    # position-independent and rotation-proof. Single-pass runs keep
    # pass 0 and are flagged warm=false.)
    warm = len(pass_totals) > 1
    n_warm = max(0, len(pass_totals) - 1)  # warm passes per query (r14 advice:
    # with reps=2 the 'median' was a single sample yet looked as trustworthy
    # as a 3-rep run; n_warm in the artifact makes the sample count explicit)
    timed = {name: (ts[1:] if len(ts) > 1 else ts) for name, ts in samples.items()}
    # Per-face statistic = MIN over warm passes (r14 verdict task 2: the
    # recurring single-box load drift inflates medians — r12/r13/r14 each
    # burned wall-clock hand-adjudicating spikes like the r14 pass-1 load5
    # 4.98 event. A transient background load can only ever ADD time, so
    # min-of-warm-passes is the drift-robust estimator of the true cost;
    # the spread and per-pass loads stay in the artifact so an anomalous
    # run remains diagnosable without prose.)
    timings = {name: round(min(ts), 3) for name, ts in timed.items()}
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)]
        for name, ts in timed.items()
        if len(ts) > 1
    }
    # start load counts: a 60s settle cannot undo load5-scale
    # contamination, so a hot start refuses the settle
    contended = bool(
        load_at_start > SETTLE_LOAD
        or settled_load > SETTLE_LOAD
        or settled_load5 > SETTLE_LOAD
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": len(pass_totals),
                "warm": warm,
                "n_warm": n_warm,
                "stat": "min_warm" if warm else "single_pass",
                "pass_totals": [round(t, 2) for t in pass_totals],
                "pass_loads": pass_loads,
                "spread": spread,
                "load1_at_start": load_at_start,
                "load5_at_start": load5_at_start,
                "load1_after_settle": settled_load,
                "load5_after_settle": settled_load5,
                "contended": contended,
            }
        )
    )
    # LAST line = a self-contained compact summary (r12 verdict task 5):
    # the driver's BENCH_rNN.json keeps only the LAST 2000 BYTES of
    # stdout, and both r11/r12 artifacts lost the totals/head to that
    # truncation (parsed: null). A full 163-query dict is ~3.6 KB and can
    # NEVER fit, so the final line carries what grading needs — total,
    # n, distribution, load, contended — plus the slowest 25 faces, and
    # is sized (~0.9 KB) so the tail always contains it whole. The full
    # per-query line above remains first for the committed local
    # artifacts.
    vals = sorted(timings.values())
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:25]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(sum(vals), 2),
                "unit": "sec",
                "sf": sf,
                "n": len(vals),
                "reps": len(pass_totals),
                "warm": warm,
                "n_warm": n_warm,
                "stat": "min_warm" if warm else "single_pass",
                "load1": settled_load,
                "load5": settled_load5,
                "contended": contended,
                "q_median": round(statistics.median(vals), 3) if vals else None,
                "q_p90": round(vals[int(0.9 * (len(vals) - 1))], 3) if vals else None,
                "slowest": {n: round(v, 2) for n, v in slowest.items()},
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
