#!/usr/bin/env python3
"""Round-10 probes (r9 verdict tasks 2 and 3).

1. `somatic` — the pedmatch SNV end-to-end (plans/pedmatch.snv_somatic,
   the flagship reference composition and 2nd-slowest bench face) at
   1x / 4x / 16x synthetic cohort size (rows AND patients scale
   together, the way a real cohort grows). Components were probed
   individually in earlier rounds; this pins the COMPOSED alpha and the
   stage breakdown the r9 verdict asked for: ALT explode vs the
   tumor/normal full-outer merge vs FORMAT unpack + somatic gates.
   Cuts are cumulative noop executions of the chain's prefixes, so a
   stage's attribution is the delta to the previous cut.

2. `q21` — the Q21 formulations head-to-head at sf0.1-shape and 10x
   synthetic rows: the textbook semi/anti self-join plan (THREE
   lineitem scans, no reusable exchange — Catalyst pulls the candidate
   distinct above the joins) vs the shipped per-order-counts rewrite
   (ONE scan, two map-side-combinable exchanges). The registered face's
   oracle keeps the correlated EXISTS/NOT-EXISTS form, so cross-engine
   agreement certifies the rewrite; this probe records what the rewrite
   is worth and how it scales.

    python scripts/scale_round10.py [somatic|q21|audio|quantiles|throttle|all]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _synth import get_spark as _spark  # noqa: E402
from _synth import noop_time as _noop  # noqa: E402
from _synth import synth_cohort as _synth_cohort  # noqa: E402


def probe_somatic() -> None:
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        pair_patients,
        snv_somatic,
    )

    spark = _spark()
    base_rows, base_pat = 150_000, 20  # the sf0.1 bench shape
    print("scale | rows | explode | +sides | +merge | +gates | full e2e")
    walls = []
    for scale in (1, 4, 16):
        n_rows, n_pat = base_rows * scale, base_pat * scale
        vcf, manifest = _synth_cohort(spark, n_rows, n_pat)
        pairs = pair_patients(manifest)

        # cumulative cuts replicating snv_somatic's internal chain
        v = vcf.withColumn("ALT", F.explode(F.split(F.col("ALT"), ",")))
        t_explode = _noop(v)

        pair_t = pairs.select("tumor_sample_id", "normal_sample_id")
        t = v.join(
            F.broadcast(pair_t),
            v["sample_id"] == pair_t["tumor_sample_id"],
            "inner",
        ).select(
            "tumor_sample_id", "normal_sample_id",
            "CHROM", "POS", "ID", "REF", "ALT", "QUAL", "INFO", "FORMAT",
            F.col("FILTER").alias("tumor_FILTER"),
            F.col("SAMPLE_FMT").alias("tumor_fmt"),
        )
        n = v.join(
            F.broadcast(pairs.select("normal_sample_id")),
            v["sample_id"] == F.col("normal_sample_id"),
            "inner",
        ).select(
            "normal_sample_id",
            "CHROM", "POS", "ID", "REF", "ALT",
            F.col("FILTER").alias("normal_FILTER"),
            F.col("SAMPLE_FMT").alias("normal_fmt"),
        )
        t_sides = _noop(t) + _noop(n)

        merged = t.join(
            n,
            on=["normal_sample_id", "CHROM", "POS", "ID", "REF", "ALT"],
            how="full_outer",
        )
        t_merge = _noop(merged)

        full = snv_somatic(vcf, pairs).groupBy("tumor_sample_id").agg(
            F.count(F.lit(1)).alias("n_somatic")
        )
        t_full = _noop(full)
        walls.append(t_full)
        print(
            f"{scale:>5}x | {n_rows:>9,} | {t_explode:6.2f}s | "
            f"{t_sides:6.2f}s | {t_merge:6.2f}s | "
            f"{max(0.0, t_full - t_merge):6.2f}s | {t_full:6.2f}s"
        )
    a_full = math.log(walls[-1] / walls[0]) / math.log(16)
    print(f"end-to-end alpha over 16x: {a_full:.2f}")


from _synth import synth_lineitem as _synth_lineitem  # noqa: E402


def _q21_joins(li, F):
    """The replaced semi/anti formulation (kept here for the probe)."""
    r1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    ).distinct()
    other_r = r1.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    cand = r1.join(
        other,
        (r1["l_orderkey"] == other["_ok"]) & (r1["l_suppkey"] != other["_sk"]),
        "left_semi",
    )
    sole = cand.join(
        other_r,
        (cand["l_orderkey"] == other_r["_ok"])
        & (cand["l_suppkey"] != other_r["_sk"]),
        "left_anti",
    )
    return sole.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))


def _q21_counts(li, F):
    """The shipped single-scan formulation (registry/tpch.py)."""
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("is_r")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum("is_r").alias("n_r"),
        F.max(F.when(F.col("is_r") == 1, F.col("l_suppkey"))).alias(
            "l_suppkey"
        ),
    )
    sole = per_order.filter((F.col("n_sup") > 1) & (F.col("n_r") == 1))
    return sole.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))


def probe_q21() -> None:
    from pyspark.sql import functions as F

    spark = _spark()
    print("rows | joins(3-scan) | counts(1-scan) | speedup | equal")
    for n_rows in (600_000, 6_000_000):
        li = _synth_lineitem(spark, n_rows).persist()
        li.count()
        try:
            t_join = _noop(_q21_joins(li, F))
            t_cnt = _noop(_q21_counts(li, F))
            a = {
                (r["l_suppkey"], r["numwait"])
                for r in _q21_joins(li, F).collect()
            }
            b = {
                (r["l_suppkey"], r["numwait"])
                for r in _q21_counts(li, F).collect()
            }
            print(
                f"{n_rows:>9,} | {t_join:8.2f}s | {t_cnt:8.2f}s | "
                f"{t_join / t_cnt:5.2f}x | {a == b}"
            )
        finally:
            li.unpersist()




def probe_audio() -> None:
    """Audio twin of the r9 media probe: in-plan WAV synthesis ->
    RIFF decode -> RMS/ZCR at growing clip counts; pins the same
    1:1 row-bounded claim (payload bytes never shuffle)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.audiofeat import (
        audio_rms_zcr,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.codecs import (
        wav_encode,
    )

    spark = _spark()
    print("clips | wall | clips/s")
    walls = []
    for n in (50_000, 200_000, 800_000):
        base = spark.range(n).select(F.col("id").alias("media_id"))

        def gen(batches):
            for pdf in batches:
                keys = pdf["media_id"].to_numpy()
                i = np.arange(64)[None, :]
                pcm = (keys[:, None] * 37 + i * 101) % 4096 - 2048
                payloads = [
                    wav_encode(pcm[r] / 32768.0, 8000)
                    for r in range(len(keys))
                ]
                yield pd.DataFrame(
                    {"media_id": keys, "payload": payloads}
                )

        media = base.mapInPandas(
            gen, schema="media_id long, payload binary"
        )
        agg = audio_rms_zcr(media).agg(
            F.sum("zero_crossings").alias("z"), F.sum("rms").alias("r")
        )
        t = _noop(agg)
        walls.append(t)
        print(f"{n:>7,} | {t:6.2f}s | {n / t:,.0f}")
    a = math.log(walls[-1] / walls[0]) / math.log(16)
    print(f"audio alpha over 16x: {a:.2f}")


def probe_quantiles() -> None:
    """Pins grouped_quantiles' lattice-bound claim: the ordered window
    is bounded by the group's DISTINCT-VALUE lattice (grid points), not
    its row count — so rows x16 at a FIXED 1000-point lattice should
    scale like the scan (alpha well under 1), while lattice x16 at
    fixed rows is the shape that actually grows the window."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        grouped_quantiles,
    )

    spark = _spark()
    # warm the JVM/codegen path so the first measured point is honest
    warm = spark.range(100_000).select(
        (F.col("id") % 8).alias("k"), (F.col("id") % 100 / 100.0).alias("value")
    )
    _noop(grouped_quantiles(warm, "k", "value", [0.5]))
    print("rows | lattice | wall")
    walls = []
    for n_rows, lattice in ((1_000_000, 1000), (4_000_000, 1000),
                            (16_000_000, 1000), (1_000_000, 16000)):
        df = spark.range(n_rows).select(
            (F.col("id") % 8).alias("k"),
            (
                ((F.xxhash64("id") % lattice + lattice) % lattice) / 100.0
            ).alias("value"),
        )
        q = grouped_quantiles(df, "k", "value", [0.25, 0.5, 0.99])
        t = _noop(q)
        walls.append(t)
        print(f"{n_rows:>11,} | {lattice:>6,} | {t:6.2f}s")
    a = math.log(walls[2] / walls[0]) / math.log(16)
    print(f"rows-alpha at fixed lattice: {a:.2f}; "
          f"lattice x16 at fixed rows: {walls[3] / walls[0]:.2f}x")


def probe_throttle() -> None:
    """Pins the r10 partition-fold rewrite's two claims: (a) wall rides
    the scan (alpha < 1) as rows x16 at fixed keys-per-row density;
    (b) per-key cost is O(kept . log events) — an AGGRESSIVE gap (fewer
    kept events) is cheaper at equal input size, where the old per-row
    fold was gap-independent."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    spark = _spark()

    def events(n):
        return spark.range(n).select(
            (F.col("id") % (n // 64)).alias("user_id"),
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1_600_000_000)
                + ((F.xxhash64("id") % 5_000_000 + 5_000_000) % 5_000_000)
            ).alias("ts"),
        )

    # warm
    _noop(throttle_events(events(50_000), "user_id", "ts", 3600, "event_id"))
    print("rows | gap | kept | wall")
    walls = {}
    for n, gap in ((500_000, 3600), (2_000_000, 3600), (8_000_000, 3600),
                   (8_000_000, 500_000)):
        out = throttle_events(events(n), "user_id", "ts", gap, "event_id")
        t = _noop(out)
        kept = out.count()
        walls[(n, gap)] = t
        print(f"{n:>9,} | {gap:>7,} | {kept:>9,} | {t:6.2f}s")
    a = math.log(walls[(8_000_000, 3600)] / walls[(500_000, 3600)]) / math.log(16)
    print(f"rows-alpha: {a:.2f}; aggressive-gap wall ratio: "
          f"{walls[(8_000_000, 500_000)] / walls[(8_000_000, 3600)]:.2f}x")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("somatic", "all"):
        probe_somatic()
    if which in ("q21", "all"):
        probe_q21()
    if which in ("audio", "all"):
        probe_audio()
    if which in ("quantiles", "all"):
        probe_quantiles()
    if which in ("throttle", "all"):
        probe_throttle()
