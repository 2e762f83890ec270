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

r15 hardening (the official BENCH_r15 headline was one contaminated warm
pass — 75 s of box contention landed on three consecutive faces and the
settle gate let the run start at load1 5.98 yet stamp contended:false):
- single-warm-pass hole CLOSED: with n_warm == 1 the per-face statistic
  is the min over ALL passes INCLUDING warmup (JIT inflates pass 0 by
  seconds; contention inflated pass 1 by 75 s — min-over-all strictly
  dominates one unprotected sample);
- honest contended stamp: also true when any warm pass TOTAL exceeds the
  warmup total (later passes are JIT-faster unless load intervened) or
  consecutive pass-end load5 snapshots ramp >1.5x (+2.0 absolute) — a
  relative bar because the bench's own executors dominate any static one;
- settle threshold tightened 8.0 -> 2.0 (a 32-cpu box at load 6 is not
  quiet, it is 6 runnable cores of someone else's work);
- variance flags (r15 advice): min is blind to regressions that raise
  variance, not the floor — faces whose warm spread max/min > 3 (and
  max-min > 1 s) are listed in `variance_flags`;
- warm passes start OPTIMISTICALLY and bail mid-pass when the budget
  nears (partial pass discarded, completed passes kept): the old
  remaining < last*1.25 gate refused pass 1 whenever the cold pass ate
  ~55% of the budget — the exact 520 s driver shape — leaving a
  JIT-inflated single_pass headline;
- opt-in outlier self-heal (r15 verdict task 7): with
  $SPARK_GRAFT_BENCH_SELFHEAL=<prior artifact.json>, any face whose
  statistic exceeds 3x its value in that artifact is re-run once at the
  very end and both numbers are recorded — a box-drift event becomes a
  same-run footnote instead of a next-round adjudication.

r17 hardening (BENCH_NOTES.md "Round 17" carries the full rules):
- load-immune secondary statistic `queries_cpu`/`value_cpu`: per-face
  process-tree CPU seconds (live Spark JVM via /proc jiffies +
  getrusage children). Headline rule: wall when clean, CPU ratios when
  `contended: true`;
- mid-pass bail margin sized from the slowest observed face (1.25x,
  floor 10 s); warm_pass_slower_than_warmup needs >2% AND >1 s over the
  warmup total (both r16 advice);
- self-heal DEFAULT-ON: references the newest committed local artifact
  at the same sf; env path overrides, =off disables.

Methodology note: r14 switched medians from all-pass to warm-only; r15
switched warm-median to warm-min; r16 extends min to all passes when
n_warm == 1. Artifacts are comparable only within the same `stat` value —
BENCH_NOTES.md restates the tracked baselines under the current statistic.
`spread` shares the statistic's sample slice (`spread_slice` names it);
`variance_flags` needs >= 2 warm samples, so the two diagnostics agree on
slice whenever both exist (r16 advice).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

SETTLE_LOAD = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
SETTLE_WAIT_S = 60.0
TIME_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "520"))
MAX_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# JVM/codegen warmup faces, one per plan family whose first compile is
# expensive: scan+agg (tpch_q1), HOF/text (doc_quality), and the
# shingle/join family (ngram_jaccard — r15 verdict task 4: lsh_recall/
# dedup_canonical/triangle faces paid C2 maturation inside their first
# timed pass every round their rotation slot came early).
WARMUP_FACES = ("tpch_q1_agg", "doc_quality", "ngram_jaccard")

SELFHEAL_RATIO = 3.0
VARIANCE_RATIO = 3.0
VARIANCE_MIN_SPREAD_S = 1.0


def face_statistic(ts: list[float]) -> float:
    """Per-face statistic from per-pass samples (warmup pass first).

    min over warm passes when >= 2 warm passes exist; min over ALL
    passes (warmup INCLUDED) when only one warm pass exists (r15 verdict
    task 1: JIT can only inflate the warmup pass by seconds, while box
    contention inflated the single warm pass by 75 s in BENCH_r15 — with
    one warm sample, min-over-all strictly dominates); the lone sample
    for a single-pass run.
    """
    if len(ts) >= 3:
        return min(ts[1:])
    return min(ts)


def contention_reasons(
    pass_totals: list[float],
    pass_loads: list[list[float]],
    load1_start: float,
    load5_start: float,
    settled1: float,
    settled5: float,
    threshold: float = None,
) -> list[str]:
    """Why this run should be stamped contended ([] = clean).

    Beyond the r9-era load-threshold checks, two signals that caught the
    r15 contamination after the fact are now stamped at run time: a warm
    pass slower IN TOTAL than the warmup pass (JIT makes later passes
    faster; only external load makes them slower — BENCH_r15's warmup was
    46% faster than its timed pass), and a RAMP between consecutive
    pass-end load5 snapshots of the WARM passes. The ramp is deliberately
    relative, not a static bar: loadavg during the run includes the
    bench's OWN local[n] executors, which push load5 past any fixed
    threshold on a perfectly quiet box — but self-load is the same every
    pass, so consecutive pass-end snapshots hold near ratio 1.0 unless
    external work arrives mid-run. The warmup-end -> pass1-end pair is
    excluded: load5's 5-minute exponential window is still SATURATING
    with self-load across the first pass (a ~155 s pass captures ~40% of
    steady state, two passes ~64%), so that pair ramps 1.5x+ on a clean
    run by arithmetic alone.
    """
    if threshold is None:
        threshold = SETTLE_LOAD
    reasons = []
    if load1_start > threshold:
        reasons.append("start_load1")
    if settled1 > threshold:
        reasons.append("settled_load1")
    if settled5 > threshold:
        reasons.append("settled_load5")
    # Margin (r16 advice): a warm total within noise of the warmup total
    # must not stamp contended — require BOTH >2% relative and >1 s
    # absolute over pass 0 (the genuine signals this check exists for,
    # e.g. BENCH_r15's 197 -> 287 s, clear it by two orders).
    if len(pass_totals) > 1 and any(
        t > pass_totals[0] * 1.02 and t > pass_totals[0] + 1.0
        for t in pass_totals[1:]
    ):
        reasons.append("warm_pass_slower_than_warmup")
    warm_ends = pass_loads[1:]
    for prev, cur in zip(warm_ends, warm_ends[1:]):
        if cur[1] > 1.5 * prev[1] and cur[1] - prev[1] > 2.0:
            reasons.append("pass_end_load5_ramp")
            break
    return reasons


def variance_flags(timed: dict[str, list[float]]) -> dict[str, list[float]]:
    """Faces whose warm-pass spread says 'min is hiding something' (r15
    advice: intermittent spill / GC pressure raises variance, never the
    floor). Flag when max/min > VARIANCE_RATIO and the absolute spread
    exceeds VARIANCE_MIN_SPREAD_S (sub-second jitter on cheap faces is
    scheduler noise, not a regression)."""
    flags = {}
    for name, ts in timed.items():
        if len(ts) < 2:
            continue
        lo, hi = min(ts), max(ts)
        if lo > 0 and hi / lo > VARIANCE_RATIO and hi - lo > VARIANCE_MIN_SPREAD_S:
            flags[name] = [round(lo, 3), round(hi, 3)]
    return flags


def selfheal_candidates(
    timings: dict[str, float], reference: dict[str, float]
) -> list[str]:
    """Faces whose statistic exceeds SELFHEAL_RATIO x the prior artifact's
    value — candidates for one on-the-spot re-run."""
    return [
        name
        for name, v in timings.items()
        if name in reference
        and reference[name] > 0
        and v > SELFHEAL_RATIO * reference[name]
    ]


def _loadavg() -> tuple[float, float]:
    """(load1, load5); (-1, -1) when /proc is unreadable."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
            return float(parts[0]), float(parts[1])
    except (OSError, ValueError, IndexError):
        return -1.0, -1.0


_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _proc_tree_cpu() -> float:
    """Cumulative CPU seconds (utime+stime) of this process and every
    LIVE descendant — the Spark JVM holds all executor compute in local
    mode, and getrusage alone never sees it (a child folds into
    RUSAGE_CHILDREN only after wait()), hence the /proc walk (r16
    verdict task 3). Load-immune: other processes never increment it.
    Returns -1.0 when /proc is unavailable (callers drop the sample).
    Cost ~5 ms per call, noise against multi-second faces."""
    try:
        kids: dict[int, list[int]] = {}
        cpu: dict[int, float] = {}
        ccpu: dict[int, float] = {}
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as f:
                    data = f.read()
            except OSError:
                continue  # process exited mid-scan
            # comm (field 2) may contain spaces/parens: fields are
            # positional only after the LAST ')'
            rest = data[data.rindex(")") + 2:].split()
            ppid = int(rest[1])      # stat field 4
            jiffies = int(rest[11]) + int(rest[12])  # utime+stime (14,15)
            kids.setdefault(ppid, []).append(int(entry))
            cpu[int(entry)] = jiffies / _CLK_TCK
            # cutime+cstime (16,17): CPU of the process's REAPED children
            # — counted for descendants only (r17 advice: a short-lived
            # process the JVM spawned and waited on folds in here and is
            # in no live /proc entry). Reaped processes left /proc, so
            # this never double-counts a live descendant.
            ccpu[int(entry)] = (int(rest[13]) + int(rest[14])) / _CLK_TCK
        me = os.getpid()
        total, stack = 0.0, [me]
        while stack:
            p = stack.pop()
            total += cpu.get(p, 0.0)
            if p != me:
                # the root's own reaped children are already covered by
                # RUSAGE_CHILDREN below — adding cutime would double-count
                total += ccpu.get(p, 0.0)
            stack.extend(kids.get(p, []))
        import resource

        ru = resource.getrusage(resource.RUSAGE_CHILDREN)
        return total + ru.ru_utime + ru.ru_stime
    except (OSError, ValueError, IndexError):
        return -1.0


# self-heal references must share the current statistic family (r17
# advice): artifacts through r13 record per-face MEDIANS (stat absent),
# which systematically inflate the baseline vs today's warm-min and can
# mask a genuine 3x regression. min-family = warm-min and the honest
# contended single pass (a degenerate min over one sample).
_MIN_FAMILY_STATS = {"min_warm", "min_all_single_warm", "single_pass"}


def _default_selfheal_ref(sf: float | None) -> str:
    """Newest committed LOCAL bench artifact at the same sf — the
    default self-heal reference (r16 verdict task 7: default-on). Local
    artifacts are the engine-true ones; driver BENCH_rNN.json files are
    the very measurements contention contaminates, so healing against
    them would under-fire. Median-stat artifacts (pre-r15, no 'stat'
    field) are skipped — cross-stat healing compares unlike numbers
    (r17 advice). Highest round wins; within a round an explicit suffix
    priority prefers *_local_final > *_local > *_local_midround (the
    midround file can be a discarded first attempt — r12 lesson; plain
    lexicographic ordering would pick it, 'm' > 'f')."""
    import glob as _glob

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_key = "", (-1, -1, "")
    for path in _glob.glob(os.path.join(here, "BENCH_r*_local*.json")):
        name = os.path.basename(path)
        m = re.search(r"BENCH_r(\d+)", name)
        if not m:
            continue
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, ValueError):
            continue
        if art.get("sf") != sf or not art.get("queries"):
            continue
        if art.get("stat") not in _MIN_FAMILY_STATS:
            continue
        suffix_rank = (
            2 if name.endswith("_local_final.json")
            else 1 if name.endswith("_local.json") else 0
        )
        key = (int(m.group(1)), suffix_rank, name)
        if key > best_key:
            best, best_key = path, key
    return best


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
    for warm in WARMUP_FACES:
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    def run_face(name: str) -> tuple[float, float]:
        """(wall seconds, process-tree CPU seconds; cpu -1 if unreadable)."""
        c0 = _proc_tree_cpu()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)  # dedup plans persist intermediates; drop them
        wall = round(time.time() - t0, 3)
        c1 = _proc_tree_cpu()
        cpu = round(c1 - c0, 3) if c0 >= 0 and c1 >= 0 else -1.0
        return wall, cpu

    samples: dict[str, list[float]] = {name: [] for name in qs}
    cpu_samples: dict[str, list[float]] = {name: [] for name in qs}
    slowest_face_s = 10.0  # sizes the mid-pass bail margin (r16 advice)
    pass_totals: list[float] = []
    pass_loads: list[list[float]] = []
    aborted_pass = False
    for rep in range(MAX_REPS):
        remaining = TIME_BUDGET_S - (time.time() - start)
        # Start a warm pass OPTIMISTICALLY (warm passes run ~0.8x the cold
        # pass, and the mid-pass bail below makes an overrun harmless —
        # the partial pass is discarded and the artifact still prints).
        # The old gate (remaining < last * 1.25) refused pass 1 whenever
        # the cold pass consumed ~55% of the budget, which is exactly the
        # 520 s driver shape — and a refused pass 1 means a JIT-inflated
        # single_pass headline.
        if rep > 0 and pass_totals and remaining < pass_totals[-1] * 0.3:
            print(f"# stopping after {rep} pass(es): {remaining:.0f}s left", file=sys.stderr)
            break
        pass_total = 0.0
        done_this_pass: list[str] = []
        for name in qs:
            # Mid-pass budget bail (warm passes only — pass 0 must finish
            # or there is nothing to report): discard the partial pass and
            # keep every COMPLETED pass for the statistic. Bailing beats
            # being killed by the driver with no JSON on stdout. Margin
            # sized from the slowest face seen so far (r16 advice: a
            # fixed 10 s margin let a >10 s face starting just under the
            # threshold overrun the budget anyway).
            if rep > 0 and time.time() - start > TIME_BUDGET_S - max(
                10.0, 1.25 * slowest_face_s
            ):
                aborted_pass = True
                for done in done_this_pass:
                    samples[done].pop()
                    cpu_samples[done].pop()
                print(
                    f"# pass{rep} aborted at {name} (budget); partial pass discarded",
                    file=sys.stderr,
                )
                break
            dt, dcpu = run_face(name)
            samples[name].append(dt)
            cpu_samples[name].append(dcpu)
            slowest_face_s = max(slowest_face_s, dt)
            done_this_pass.append(name)
            pass_total += dt
            print(f"# pass{rep} {name}: {dt:.3f}s cpu {dcpu:.3f}s", file=sys.stderr)
        if aborted_pass:
            break
        pass_totals.append(pass_total)
        # load snapshot at pass END: a spike that landed inside this pass
        # is still visible in load5 here, so per-pass contamination is
        # diagnosable from the artifact alone (r14 verdict task 2)
        pass_loads.append(list(_loadavg()))

    # Discard pass 0 as JVM warmup whenever at least TWO later passes exist
    # (r13 adjudication: the r13 rotation moved lsh_recall from position
    # 39 to 5 in the run order and its bench median jumped 2.6s -> 8.6s
    # with a BYTE-IDENTICAL physical plan — pure C2-JIT maturation that
    # position-39 faces never paid. Discarding pass 0 makes the per-face
    # number position-independent and rotation-proof. With only ONE warm
    # pass, face_statistic() keeps pass 0 in the min — see its docstring.)
    warm = len(pass_totals) > 1
    n_warm = max(0, len(pass_totals) - 1)
    timed = {name: (ts[1:] if len(ts) > 2 else ts) for name, ts in samples.items()}
    timings = {name: round(face_statistic(ts), 3) for name, ts in samples.items()}
    # spread shares face_statistic's slice (`spread_slice` names it);
    # variance_flags needs >= 2 warm samples so it is empty whenever the
    # slices could differ (r16 advice).
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)]
        for name, ts in timed.items()
        if len(ts) > 1
    }
    # Load-immune CPU column (r16 verdict task 3): same slice rule as
    # face_statistic, min over valid samples (-1 = /proc unreadable).
    def cpu_statistic(ts: list[float]) -> float | None:
        sl = ts[1:] if len(ts) >= 3 else ts
        valid = [t for t in sl if t >= 0]
        return round(min(valid), 3) if valid else None

    timings_cpu = {
        name: cpu_statistic(ts) for name, ts in cpu_samples.items()
    }
    # variance flags compare WARM passes only (pass 0 is legitimately
    # slower under JIT — flagging warmup-vs-warm would be pure noise)
    vflags = variance_flags(
        {name: ts[1:] for name, ts in samples.items() if len(ts) > 2}
    )

    # Outlier self-heal, DEFAULT-ON since r17: one extra run for any face
    # >3x its reference value, both numbers recorded. Reference: env path
    # if set, 'off'/'0'/'none' disables, else newest local artifact.
    selfheal: dict[str, dict[str, float]] = {}
    heal_ref = os.environ.get("SPARK_GRAFT_BENCH_SELFHEAL", "")
    if heal_ref.lower() in ("off", "0", "none"):
        heal_ref = ""
    elif not heal_ref:
        heal_ref = _default_selfheal_ref(sf)
    heal_ref_stat = ""
    if heal_ref:
        try:
            with open(heal_ref) as f:
                _ref_art = json.load(f)
            reference = _ref_art.get("queries", {})
            # recorded so cross-stat healing stays auditable (r17 advice;
            # an env-forced reference may carry any statistic)
            heal_ref_stat = str(_ref_art.get("stat") or "median_era")
        except (OSError, ValueError):
            reference = {}
        for name in selfheal_candidates(timings, reference):
            if time.time() - start > TIME_BUDGET_S:
                print(f"# selfheal budget exhausted before {name}", file=sys.stderr)
                break
            rerun, rerun_cpu = run_face(name)
            print(f"# selfheal {name}: {timings[name]:.3f}s -> {rerun:.3f}s", file=sys.stderr)
            selfheal[name] = {"before": timings[name], "rerun": rerun}
            timings[name] = round(min(timings[name], rerun), 3)
            prior_cpu = timings_cpu.get(name)
            if rerun_cpu >= 0 and (prior_cpu is None or rerun_cpu < prior_cpu):
                timings_cpu[name] = rerun_cpu

    reasons = contention_reasons(
        pass_totals,
        pass_loads,
        load_at_start,
        load5_at_start,
        settled_load,
        settled_load5,
    )
    contended = bool(reasons)
    if n_warm == 1:
        stat = "min_all_single_warm"
    elif warm:
        stat = "min_warm"
    else:
        stat = "single_pass"
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_cpu": timings_cpu,
                "value_cpu": round(
                    sum(v for v in timings_cpu.values() if v is not None), 3
                ),
                "cpu_source": "proc_tree+rusage_children",
                "sf": sf,
                "reps": len(pass_totals),
                "warm": warm,
                "n_warm": n_warm,
                "stat": stat,
                "spread_slice": "all_passes" if n_warm <= 1 else "warm_only",
                "pass_totals": [round(t, 2) for t in pass_totals],
                "pass_loads": pass_loads,
                "aborted_pass": aborted_pass,
                "spread": spread,
                "variance_flags": vflags,
                "selfheal": selfheal,
                "selfheal_ref": os.path.basename(heal_ref) if heal_ref else "",
                "selfheal_ref_stat": heal_ref_stat,
                "load1_at_start": load_at_start,
                "load5_at_start": load5_at_start,
                "load1_after_settle": settled_load,
                "load5_after_settle": settled_load5,
                "contended": contended,
                "contention_reasons": reasons,
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
                "stat": stat,
                "load1": settled_load,
                "load5": settled_load5,
                "contended": contended,
                "reasons": reasons,
                "cpu_total": round(
                    sum(v for v in timings_cpu.values() if v is not None), 2
                ),
                "vflags": len(vflags),
                "healed": len(selfheal),
                "q_median": round(statistics.median(vals), 3) if vals else None,
                "q_p90": round(vals[int(0.9 * (len(vals) - 1))], 3) if vals else None,
                "slowest": {n: round(v, 2) for n, v in slowest.items()},
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
