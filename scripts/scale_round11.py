#!/usr/bin/env python3
"""Round-11 probe (r10 verdict task 2): the exchange-free bucketed
somatic variant merge.

SCALE_NOTES r10 measured the tumor/normal full-outer merge at ~50% of
``somatic_calls`` wall — a shuffle of both cohort-sized sides on the
near-unique variant-identity key, nothing to broadcast, no skew to
salt. The claimed 100 TB knob: write both VCF sides bucketed on
``SNV_MERGE_KEYS`` at ingest and every later merge (re-runs, re-gating
with new thresholds, per-study reprocessing) plans with zero Exchange.
The plan contract is pinned in
tests/test_partitioning.py::test_snv_merge_bucketed_exchange_free; this
probe records what the exchange-free re-run is WORTH at 1x/4x synthetic
cohort scale, plus the one-time ingest cost that pays for it.

Broadcast is disabled for the measured merges: at cohort scale neither
side fits an executor broadcast, so the in-flight plan's true shape is
the two-sided shuffle + SMJ this probe times.

Also `flows`: the two new r11 composition faces (clinical_merge_flow,
maf_reconcile) timed across the shipped SFs (sf0.01 → sf0.1, 10x orders
rows) for their scaling alpha — the composed-flow discipline the r10
probe applied to somatic_calls.

    python scripts/scale_round11.py [merge|flows|all] [mult ...]

Extra integer args override the merge probe's scale multipliers
(default ``1 4``); r12 verdict task 4 runs ``merge 1 10 100`` for the
two-decade table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _synth import get_spark, noop_time, synth_cohort  # noqa: E402


def probe_flows(spark) -> None:
    import math

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry.flows import (
        q_clinical_merge_flow,
        q_maf_reconcile,
    )

    print("face | sf0.01 | sf0.1 (10x rows) | alpha")
    for name, fn in (
        ("clinical_merge_flow", q_clinical_merge_flow),
        ("maf_reconcile", q_maf_reconcile),
    ):
        noop_time(fn(spark, "/root/testdata/sf0.001"))  # warm
        w1 = noop_time(fn(spark, "/root/testdata/sf0.01"))
        w2 = noop_time(fn(spark, "/root/testdata/sf0.1"))
        print(
            f"{name} | {w1:5.2f}s | {w2:5.2f}s | "
            f"{math.log(w2 / w1) / math.log(10):.2f}"
        )


def probe_merge(mults: list[int] | None = None) -> int:
    """``mults`` is the VALIDATED multiplier list from main() (r14
    advice: re-reading sys.argv here made safety depend entirely on the
    caller's upstream validation — a direct call now gets the default
    instead of an unvalidated ValueError)."""
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
    wh = "/tmp/scale_r11_bucketed"
    shutil.rmtree(wh, ignore_errors=True)
    os.makedirs(wh, exist_ok=True)

    # warmup: JVM/codegen costs land here, not in the 1x row
    w_vcf, w_manifest = synth_cohort(spark, 50_000, n_pat=20)
    noop_time(snv_somatic(w_vcf, pair_patients(w_manifest)))

    base = 500_000
    mults = mults or [1, 4]
    print("scale | ingest(write bkt) | in-flight merge | bucketed merge | x")
    for mult in mults:
        n = base * mult
        vcf, manifest = synth_cohort(spark, n, n_pat=max(20, n // 25_000))
        pairs = pair_patients(manifest)

        # in-flight: sides recomputed + both shuffled on the merge key
        t_flight = noop_time(snv_somatic(vcf, pairs))

        # one-time ingest: sides computed once, shuffled once, persisted
        tt, nt = f"snv_t_{mult}", f"snv_n_{mult}"
        t0 = time.time()
        write_snv_sides_bucketed(
            vcf, pairs, tt, nt, n_buckets=32,
            tumor_path=f"{wh}/t{mult}", normal_path=f"{wh}/n{mult}",
        )
        t_write = time.time() - t0

        # re-run: exchange-free merge straight off the bucketed layout
        t_bkt = noop_time(snv_somatic_bucketed(spark, tt, nt))
        plan = (
            snv_somatic_bucketed(spark, tt, nt)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, "bucketed merge plan has an Exchange"

        print(
            f"{mult:4}x | {t_write:8.2f}s | {t_flight:8.2f}s | "
            f"{t_bkt:8.2f}s | {t_flight / t_bkt:5.2f}"
        )
        spark.sql(f"DROP TABLE IF EXISTS {tt}")
        spark.sql(f"DROP TABLE IF EXISTS {nt}")
    shutil.rmtree(wh, ignore_errors=True)
    return 0


def main() -> int:
    # Strict argv validation (r13 advice): a typo'd multiplier ('1O') or a
    # misplaced flag must error loudly, never silently fall back to the
    # default [1, 4] and run the wrong probe table.
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which not in ("merge", "flows", "all"):
        print(
            f"usage: scale_round11.py [merge|flows|all] [mult ...]; "
            f"got mode {which!r}",
            file=sys.stderr,
        )
        return 2
    bad = [a for a in sys.argv[2:] if not (a.isdigit() and int(a) > 0)]
    if bad:
        print(
            f"unrecognized multiplier arg(s) {bad}: every extra arg must "
            "be a positive integer (e.g. `merge 1 10 100`)",
            file=sys.stderr,
        )
        return 2
    if which == "flows" and len(sys.argv) > 2:
        print("multiplier args only apply to the merge probe", file=sys.stderr)
        return 2
    if which in ("merge", "all"):
        probe_merge([int(a) for a in sys.argv[2:]])
    if which in ("flows", "all"):
        probe_flows(get_spark())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
