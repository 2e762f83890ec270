"""Round-12 storage-layout faces (r11 verdict tasks 2 and 3).

The two named 100 TB exchange-elimination claims — the somatic variant
merge and the megaMAF dedup window over bucketed ingest — were
plan-asserted and parity-tested locally in r11 (tests/test_partitioning
.py); these faces put the SAME layouts under the driver's CORRECTNESS
gate. Each writes its input bucketed to a session-temp warehouse path,
runs the merge off the bucketed scans, and reuses the IN-FLIGHT face's
oracle verbatim (``SQL_SOMATIC_CALLS`` / ``SQL_CLINICAL_MERGE_FLOW``):
identical output from a different physical layout is the entire claim,
so the strongest possible certificate is hash-equality against the
unchanged oracle. The zero-Exchange plan asserts stay in pytest — a
driver face must stay correct under ANY session conf, so it never pins
planner knobs.

At 100 TB the bucket count is sized so one bucket of the larger side
fits an executor core's working set (sources/bucketed.py contract, e.g.
4096); here 8 buckets exercise the same code path at test SF.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import tempfile
import time

from ._common import *  # noqa: F401,F403

_N_BUCKETS = 8

# Session dirs whose cleanup is already registered (one atexit hook per
# session, however many faces run).
_CLEANUP_REGISTERED: set[str] = set()

_STALE_AFTER_S = 6 * 3600
# Hard ceiling on how long a pidfile can defer the sweep (r15 advice: pid
# recycling — a crashed owner's pid reused by ANY unrelated live process
# would otherwise mark the dir immortally alive, re-opening the unbounded
# /tmp accretion). Generous vs the 6 h stale bar: a real session that old
# has long since re-touched the dir via os.utime in _bucket_path.
_PIDFILE_TRUST_S = 7 * 24 * 3600
_PIDFILE = "owner.pid"


def _read_owner_pid(path: str) -> int:
    """Parsed, range-validated owner pid, or 0 when absent/invalid. The
    pidfile lives in world-writable /tmp, so its content is untrusted
    (r15 advice): pid 0 would make ``os.kill(0, 0)`` signal OUR OWN
    process group (always alive), a negative pid signals a process
    group, and anything past the kernel's pid space (e.g. a squatted
    10**20) raises OverflowError out of ``os.kill`` — none of those may
    reach the liveness probe."""
    try:
        with open(os.path.join(path, _PIDFILE)) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return 0
    try:
        with open("/proc/sys/kernel/pid_max") as f:
            pid_max = int(f.read().strip())
    except (OSError, ValueError):
        pid_max = 2**22  # kernel compile-time ceiling
    return pid if 0 < pid <= pid_max else 0


def _owner_alive(path: str) -> bool:
    """True when ``path``'s ``owner.pid`` names a live process AND the
    dir was touched within the pidfile trust window. A dir's mtime only
    refreshes when a direct child is created/removed or _bucket_path
    utimes it, so a session >6 h old that registered its tables early
    and is still READING them would look stale by mtime alone (r14
    advice) — the pidfile is the liveness signal that survives read-only
    use. The mtime bound caps pid recycling (r15 advice): a recycled pid
    can defer the sweep for at most the trust window, not forever."""
    pid = _read_owner_pid(path)
    if pid <= 0:
        return False
    try:
        if time.time() - os.path.getmtime(path) > _PIDFILE_TRUST_S:
            return False
    except OSError:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except (PermissionError, OSError, OverflowError, ValueError):
        return True  # exists but not ours — treat as alive
    return True


def _sweep_stale_bucket_dirs(keep: str) -> None:
    """Delete ``spark_graft_bucketed_*`` dirs older than 6 h (r13 advice:
    session-keyed paths fixed the concurrent-overwrite race but made the
    accretion unbounded — a crashed session's dir would otherwise live in
    /tmp forever). ``keep`` (the live session's own dir) is never touched;
    a dir whose ``owner.pid`` names a live process is skipped regardless
    of age (r14 advice: mtime alone misses a >6 h session that is still
    reading); the glob is prefix-scoped so a shared /tmp with many
    tenants is never listed wholesale (r14 verdict task 6)."""
    now = time.time()
    for path in glob.glob(
        os.path.join(tempfile.gettempdir(), "spark_graft_bucketed_*")
    ):
        if path == keep or _owner_alive(path):
            continue
        try:
            if now - os.path.getmtime(path) > _STALE_AFTER_S:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def _bucket_path(spark: SparkSession, table: str) -> str:
    """Session-keyed temp external-table location: the directory embeds
    ``applicationId``, so two concurrent sessions running the gate can
    never race each other's overwrite (one scan reading files the other
    just deleted) and a pre-created world-shared /tmp dir cannot be
    squatted to capture our writes (r12 advice). WITHIN a session the
    path is stable, so the writers' mode('overwrite') still reuses it
    across repeated face runs (driver gate, bench, tests) instead of
    accreting tempdirs; the table names live in the session's own
    in-memory catalog, so they need no suffix."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_bucketed_{spark.sparkContext.applicationId}",
    )
    os.makedirs(base, exist_ok=True)
    if base not in _CLEANUP_REGISTERED:
        # Bounded accretion (r13 advice): this session's dir dies with the
        # process, and anything a crashed session left behind is swept once
        # it ages past the stale bar AND its owner pid is dead (r14
        # advice: the pidfile keeps a read-only long-lived session safe
        # from a newly started session's sweep).
        _CLEANUP_REGISTERED.add(base)
        try:
            with open(os.path.join(base, _PIDFILE), "w") as f:
                f.write(str(os.getpid()))
        except OSError:
            pass
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        _sweep_stale_bucket_dirs(keep=base)
    try:
        # Belt-and-braces freshness: every face run touches the base dir,
        # so even without the pidfile a dir in active use never ages.
        os.utime(base)
    except OSError:
        pass
    return os.path.join(base, table)


def q_somatic_calls_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``somatic_calls`` through the exchange-free bucketed merge
    (plans/pedmatch_bucketed.py; r10 SCALE_NOTES measured the in-flight
    tumor/normal full-outer merge at ~50% of somatic_calls wall): the
    same synthetic cohort (registry/_synth_pedmatch.py) has both VCF
    sides written bucketed + bucket-sorted on ``SNV_MERGE_KEYS`` — the
    variant-identity shuffle paid ONCE at ingest — and the somatic chain
    re-run off the bucketed scans. The fusion branch is untouched (the
    layout targets the SNV merge); output must hash-match
    ``SQL_SOMATIC_CALLS`` exactly."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        fusion_germline_subtract,
        fusion_prep,
        pair_patients,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch_bucketed import (
        snv_somatic_bucketed,
        write_snv_sides_bucketed,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry._synth_pedmatch import (
        pedmatch_fusion_vcf,
        pedmatch_manifest,
        pedmatch_snv_vcf,
        somatic_summary,
    )

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        _with_caches,
    )

    # Same persist rationale as q_somatic_calls: pairs feeds both
    # bucketed side-writes plus the fusion branch, fusions is read twice
    # by the germline subtract — one derivation each instead of per-use.
    pairs = pair_patients(pedmatch_manifest(spark, sf_dir)).persist()
    write_snv_sides_bucketed(
        pedmatch_snv_vcf(spark, sf_dir),
        pairs,
        "sg_snv_tumor_bkt",
        "sg_snv_normal_bkt",
        n_buckets=_N_BUCKETS,
        tumor_path=_bucket_path(spark, "sg_snv_tumor_bkt"),
        normal_path=_bucket_path(spark, "sg_snv_normal_bkt"),
    )
    somatic = snv_somatic_bucketed(spark, "sg_snv_tumor_bkt", "sg_snv_normal_bkt")
    fusions = fusion_prep(pedmatch_fusion_vcf(spark, sf_dir)).persist()
    kept = fusion_germline_subtract(fusions, pairs)
    return _with_caches(somatic_summary(somatic, kept), [pairs, fusions])


def q_clinical_merge_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``clinical_merge_flow`` through the bucketed megaMAF layout
    (plans/clinical_merge_bucketed.py): same prep-filter + provider
    annotation + union as the in-flight flow, but the union is
    normalized (float positions -> bigint, the ingest contract the
    float-key guard enforces) and written bucketed on the 7-column MAF
    identity; the dedup-with-preference window AND the mci:294 stats
    aggregate then run off the bucketed scan with no corpus-wide
    exchange. Output — per-sample summary + merge-stats literals — must
    hash-match ``SQL_CLINICAL_MERGE_FLOW`` exactly."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.annotation import (
        LookupAnnotator,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        annotate_clinical_variants,
        clin_file_prep,
        clin_union,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge_bucketed import (
        merge_clinical_variants_bucketed,
        normalize_positions_bigint,
        write_maf_bucketed,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry.flows import (
        _clin_inputs,
    )

    maf, clin, lookup = _clin_inputs(spark, sf_dir)
    prepped = clin_file_prep(
        clin, maf.select("Tumor_Sample_Barcode"), reference_genome="GRCh38"
    )
    anno = annotate_clinical_variants(prepped, LookupAnnotator(lookup, ["query"]))
    unioned = normalize_positions_bigint(clin_union(maf, anno))
    write_maf_bucketed(
        unioned,
        "sg_megamaf_bkt",
        n_buckets=_N_BUCKETS,
        path=_bucket_path(spark, "sg_megamaf_bkt"),
        extra_keys=(),
    )
    deduped, stats = merge_clinical_variants_bucketed(spark, "sg_megamaf_bkt")

    # summary tail mirrors q_clinical_merge_flow line-for-line — the
    # shared oracle hash-checks that the two layouts cannot drift apart
    out = deduped.groupBy("Tumor_Sample_Barcode").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.sum(
            F.when(F.col("`Reported.Significance`") != "Not Reported", 1)
            .otherwise(0)
        ).alias("n_reported"),
        F.sum(F.col("Start_Position").cast("bigint")).alias("sum_start"),
        F.sum(
            F.when(F.col("Entrez_Gene_Id") != "", 1).otherwise(0)
        ).alias("n_entrez"),
    )
    for name in ("raw_maf_rows", "merged_rows", "clin_deduped",
                 "clin_added_uniquely"):
        out = out.withColumn(name, F.lit(stats[name]).cast("bigint"))
    return out
