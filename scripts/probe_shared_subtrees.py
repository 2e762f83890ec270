#!/usr/bin/env python3
"""r19 VERDICT task 7: structural-sharing probe for the two composed
faces with the widest Exchange counts — maf_reconcile (32 Exchanges) and
bloom_pruned_dedup (44). Each face is timed AS-IS (arm "base") and with
its shared subtree materialized once (arm "shared": persist + eager
count at the root — rows_all for maf_reconcile; the md5 batch/snap
frames for bloom_pruned_dedup), alternating A/B so box drift lands on
both arms. The r18 adjudication discipline applies: keep the sharing
only on CPU evidence; otherwise record numbers and leave the faces
alone (the re-derived subtrees are cheap string/md5 projections over one
pruned scan — the r18 judgment this probe tests).

Usage: python scripts/probe_shared_subtrees.py [--reps 4] [--sf DIR]
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


def _maf_reconcile(spark, sf_dir: str, shared: bool):
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        load_table,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.vcf_anno import (
        concat_maf_check,
        per_file_counts,
    )

    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    i = c % 40
    suffix = F.when(i % 2 == 0, F.lit(".vcf")).otherwise(F.lit(".vcf.gz"))
    rows_all = o.select(
        F.concat(F.lit("f"), i, suffix).alias("file_name"),
        F.when(k % 97 == 0, F.lit(""))
        .when(k % 89 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("S"), i))
        .alias("Tumor_Sample_Barcode"),
        F.when(k % 17 == 0, F.lit("FAILED"))
        .otherwise(F.lit("SUCCESS"))
        .alias("Annotation_Status"),
        F.when(k % 34 == 0, F.lit("KI270713.1"))
        .otherwise((k % 22 + 1).cast("string"))
        .alias("Chromosome"),
        F.concat(F.lit("G"), k % 200).alias("Hugo_Symbol"),
        k.alias("_k"),
    )
    caches = []
    if shared:
        rows_all = rows_all.persist()
        rows_all.count()
        caches.append(rows_all)
    concat_maf = (
        rows_all.filter(F.col("_k") % 2 == 0)
        .unionByName(rows_all.filter(F.col("_k") % 2 == 1))
        .filter(F.col("_k") % 41 != 0)
        .drop("_k")
    )
    pfc = per_file_counts(rows_all.drop("_k"))
    si = o.select(i.alias("i")).distinct()
    manifest = si.select(
        F.concat(F.lit("S"), F.col("i")).alias("sample"),
        F.concat(
            F.lit("http://data.example/in/f"),
            F.col("i"),
            F.when(F.col("i") % 2 == 0, F.lit(".vcf")).otherwise(
                F.lit(".vcf.gz")
            ),
        ).alias("file_url"),
    )
    chk = concat_maf_check(concat_maf, manifest, pfc)
    failed = chk["failed"].withColumnRenamed("Tumor_Sample_Barcode", "_fb")
    cleaned_counts = (
        chk["cleaned_maf"]
        .groupBy("Tumor_Sample_Barcode")
        .agg(F.count(F.lit(1)).alias("_nc"))
        .withColumnRenamed("Tumor_Sample_Barcode", "_cb")
    )
    mis = chk["misformatted"].agg(F.count(F.lit(1)).alias("n_misformatted"))
    ledger = chk["ledger"]
    out = (
        ledger.join(failed, ledger["sample"] == failed["_fb"], "left")
        .join(cleaned_counts, ledger["sample"] == cleaned_counts["_cb"], "left")
        .select(
            "sample",
            F.col("line_count_individual").alias("n_individual"),
            F.col("line_count_concat").alias("n_concat"),
            F.col("mismatch").cast("int").alias("mismatch"),
            F.coalesce(F.col("failed_annotations"), F.lit(0)).alias("n_failed"),
            (
                F.col("mismatch")
                | (F.coalesce(F.col("failed_annotations"), F.lit(0)) > 0)
            )
            .cast("int")
            .alias("is_rerun"),
            F.coalesce(F.col("_nc"), F.lit(0)).alias("n_cleaned"),
        )
        .crossJoin(F.broadcast(mis))
    )
    return out, caches


def _bloom_pruned_dedup(spark, sf_dir: str, shared: bool):
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        load_table,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    snap = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    batch = docs.select("doc_id", "source", F.md5("text").alias("fp"))
    caches = []
    if shared:
        snap = snap.persist()
        batch = batch.persist()
        batch.count()
        snap.count()
        caches += [snap, batch]
    bloom = bloom_build(snap, "fp", k=4, m=16384)
    maybe_fps = (
        bloom_probe(bloom, batch.select("fp").distinct(), "fp")
        .filter(F.col("maybe_member"))
        .select("fp")
    )
    fresh = batch.join(maybe_fps, "fp", "left_anti")
    survivors = batch.join(maybe_fps, "fp", "left_semi").join(
        snap, "fp", "left_anti"
    )
    new = fresh.unionByName(survivors)
    out = new.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum(F.col("doc_id").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("id_sum"),
    )
    return out, caches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )

    spark = get_spark("probe-shared-subtrees")
    builders = {
        "maf_reconcile": _maf_reconcile,
        "bloom_pruned_dedup": _bloom_pruned_dedup,
    }

    def run(face: str, shared: bool) -> tuple[float, float]:
        spark.sparkContext.setJobDescription(
            f"{face} {'shared' if shared else 'base'}"
        )
        c0 = _proc_tree_cpu()
        t0 = time.time()
        df, caches = builders[face](spark, args.sf, shared)
        df.write.format("noop").mode("overwrite").save()
        for fr in caches:
            fr.unpersist()
        return round(time.time() - t0, 3), round(_proc_tree_cpu() - c0, 3)

    report: dict[str, dict] = {}
    for face in builders:
        run(face, False)  # warmup
        run(face, True)
        walls = {"base": [], "shared": []}
        cpus = {"base": [], "shared": []}
        for _ in range(args.reps):
            for arm, shared in (("base", False), ("shared", True)):
                w, c = run(face, shared)
                walls[arm].append(w)
                cpus[arm].append(c)
        report[face] = {
            arm: {
                "wall_min": min(walls[arm]),
                "wall_med": round(statistics.median(walls[arm]), 3),
                "cpu_min": min(cpus[arm]),
                "cpu_med": round(statistics.median(cpus[arm]), 3),
                "walls": walls[arm],
                "cpus": cpus[arm],
            }
            for arm in ("base", "shared")
        }
    with open("/proc/loadavg") as f:
        report["loadavg"] = f.read().split()[:3]
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
