#!/usr/bin/env python3
"""Round-12 probe (r11 verdict task 5): the composition flows one
decade past shipped SF.

``clinical_merge_flow`` (alpha 0.30) and ``maf_reconcile`` (alpha 0.17)
were measured in r11 only across the shipped span sf0.01 -> sf0.1 (10x
orders rows). Both faces are pure modular arithmetic over ``orders``'
(o_orderkey, o_custkey), so an orders-shaped generator at 10x/100x the
sf0.1 row count (150k -> 1.5M -> 15M) extends the measurement a decade
(and two) past shipped SF — the spans where the clinical merge's dedup
window and the reconcile's concat counts dominate, which is exactly
where the alphas were claimed to hold.

The generator is deterministic in (n, seed-free): o_orderkey =
rowid % 999_983 + 1 — the modulus keeps k*10 under the faces' 1e7
double->string contract (flows.py builds Start_Position as an
exact-integer DOUBLE; past 1e7 Spark's string cast goes scientific and
the ``.0``-strip bigint cast throws), at the price of ~15x key reuse at
100x (mild extra dedup-key collisions: the 7-column identity also
includes the 50-valued barcode, so mean multiplicity stays ~1).
o_custkey is xxhash64-derived (non-negative residue fold). A
same-generator 150k baseline anchors the alphas so generator-vs-TPCH
shape differences cannot masquerade as scaling.

    python scripts/scale_round12.py [--flows-only] [--keep]

``--flows-only`` (bare ``flows-only`` also accepted) skips the
expensive megaMAF re-run probe; ``--keep`` retains the generated
parquet between runs.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _synth import get_spark, noop_time  # noqa: E402

BASE = "/tmp/scale_r12"
SIZES = [150_000, 1_500_000, 15_000_000]  # ~sf0.1, 10x, 100x


def synth_orders_dir(spark, n: int) -> str:
    """orders-shaped parquet (only the two columns the flow faces
    read) at /tmp/scale_r12/n{n}/orders.parquet; reused if present."""
    from pyspark.sql import functions as F

    d = os.path.join(BASE, f"n{n}")
    out = os.path.join(d, "orders.parquet")
    if not os.path.exists(out):
        (
            spark.range(n)
            .select(
                (F.col("id") % 999_983 + 1).alias("o_orderkey"),
                # non-negative residue fold: xxhash64 % m can be negative
                (
                    (F.xxhash64(F.col("id")) % 100_000 + 100_000) % 100_000
                ).alias("o_custkey"),
            )
            .write.mode("overwrite")
            .parquet(out)
        )
    return d


def clinical_merge_composed(spark, sf_dir: str):
    """The q_clinical_merge_flow composition with one probe-only change:
    the synthetic lookup is keyed (dropDuplicates on query). The face's
    lookup inherits the generator's o_orderkey reuse, and a NON-keyed
    lookup explodes the annotation left-join (3.7M prep rows -> 50M at
    100x — a 14x multiplicity artifact, not engine scaling); a real
    annotation snapshot is keyed by construction (one Genome Nexus
    response per query), so the keyed composition is the honest
    measurement. Duplicate MAF/clinical rows are KEPT — re-reported
    variants are exactly the dedup window's job."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.annotation import (
        LookupAnnotator,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        annotate_clinical_variants,
        clin_file_prep,
        merge_clinical_variants_to_maf,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry.flows import (
        _clin_inputs,
    )

    maf, clin, lookup = _clin_inputs(spark, sf_dir)
    prepped = clin_file_prep(
        clin, maf.select("Tumor_Sample_Barcode"), reference_genome="GRCh38"
    )
    anno = annotate_clinical_variants(
        prepped, LookupAnnotator(lookup.dropDuplicates(["query"]), ["query"])
    )
    deduped, stats = merge_clinical_variants_to_maf(maf, anno)
    out = deduped.groupBy("Tumor_Sample_Barcode").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.sum(F.col("Start_Position").cast("bigint")).alias("sum_start"),
    )
    for name in stats:
        out = out.withColumn(name, F.lit(stats[name]).cast("bigint"))
    return out


def probe_maf_rerun(spark, dirs: list[str]) -> None:
    """What the bucketed megaMAF layout is WORTH at decade scale (the
    r11 somatic-merge table, applied to the clinical merge): one-time
    bucketed ingest of the normalized union vs the per-merge cost of
    (a) the in-flight merge (localCheckpoint + window shuffle) and
    (b) the re-run off the bucketed scan (exchange-free window +
    exchange-free stats). The re-run is the reference's actual pattern —
    every new clinical sheet re-merges into the standing megaMAF."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.annotation import (
        LookupAnnotator,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge import (
        annotate_clinical_variants,
        clin_file_prep,
        clin_union,
        dedup_preferring_clinical,
        merge_clinical_variants_to_maf,
        merge_stats,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.clinical_merge_bucketed import (
        merge_clinical_variants_bucketed,
        normalize_positions_bigint,
        write_maf_bucketed,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry.flows import (
        _clin_inputs,
    )

    print("union rows | one-time ingest | in-flight merge | bucketed re-run | x")
    for d in dirs[1:]:
        maf, clin, lookup = _clin_inputs(spark, d)
        prepped = clin_file_prep(
            clin, maf.select("Tumor_Sample_Barcode"), reference_genome="GRCh38"
        )
        anno = annotate_clinical_variants(
            prepped, LookupAnnotator(lookup.dropDuplicates(["query"]), ["query"])
        )
        unioned = normalize_positions_bigint(clin_union(maf, anno))
        n = unioned.count()

        t0 = time.time()
        write_maf_bucketed(unioned, "r12_probe_maf", n_buckets=32,
                           path=os.path.join(BASE, "probe_maf"))
        ingest = time.time() - t0

        # time the WHOLE merge in both arms — the eager pieces (the
        # union localCheckpoint + stats in-flight; the stats aggregate
        # in the re-run) happen inside the merge call, so timing only
        # the returned frame's materialization would flatter whichever
        # arm front-loads more work
        def inflight():
            t0 = time.time()
            dd, _st = merge_clinical_variants_to_maf(maf, anno)
            noop_time(dd)
            return time.time() - t0

        def rerun():
            t0 = time.time()
            dd, _st = merge_clinical_variants_bucketed(spark, "r12_probe_maf")
            noop_time(dd)
            return time.time() - t0

        w_in = sorted(inflight() for _ in range(3))[1]
        w_re = sorted(rerun() for _ in range(3))[1]
        print(f"{n} | {ingest:5.1f}s | {w_in:5.2f}s | {w_re:5.2f}s | "
              f"{w_in / w_re:.1f}")
        spark.sql("DROP TABLE IF EXISTS r12_probe_maf")


def main() -> None:
    spark = get_spark()
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry.flows import (
        q_maf_reconcile,
    )

    dirs = [synth_orders_dir(spark, n) for n in SIZES]
    print("face | 150k | 1.5M (10x) | 15M (100x) | alpha 1->10x | alpha 10->100x")
    for name, fn in (
        ("clinical_merge_flow", lambda s, d: clinical_merge_composed(s, d)),
        ("maf_reconcile", q_maf_reconcile),
    ):
        noop_time(fn(spark, dirs[0]))  # warm
        # median of 3 per size (the bench.py discipline): the eager
        # localCheckpoint inside the merge makes single passes noisy
        # under block-manager GC
        walls = [
            sorted(noop_time(fn(spark, d)) for _ in range(3))[1] for d in dirs
        ]
        a1 = math.log(walls[1] / walls[0]) / math.log(10)
        a2 = math.log(walls[2] / walls[1]) / math.log(10)
        print(
            f"{name} | {walls[0]:5.2f}s | {walls[1]:5.2f}s | "
            f"{walls[2]:6.2f}s | {a1:.2f} | {a2:.2f}"
        )
    if not ({"--flows-only", "flows-only"} & set(sys.argv)):
        probe_maf_rerun(spark, dirs)
    if "--keep" not in sys.argv:
        shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
