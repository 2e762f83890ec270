#!/usr/bin/env python3
"""Round-9 probes (r8 verdict tasks 4 and 6).

1. `skew` — interval join under a REAL chromosome-shaped 80/20 skew
   (chr1 carries 80% of rows; `/root/reference/workflows/cnv.py:430`
   reruns bedtools on exactly this shape). The binning strategy's claim
   is that fine-grained (chrom, bin) keys dissolve chromosome skew
   before the join shuffle; the probe measures (a) the alpha exponent
   under 16x row growth at 80/20 skew, (b) the skewed-vs-uniform
   wall-time ratio at equal size, and (c) the rows-per-output-partition
   spread (max/mean — the direct proxy for per-partition task time on
   this operator). Spread > 4x would mandate salting on (chrom, bin);
   the expectation is ~1x because chr1's rows spread over its ~250 bins.

2. `depth` — hierarchy pointer-doubling at FIXED 2M nodes and growing
   depth 16 / 256 / 4096 (rounds = ceil(log2(depth)) = 4 / 8 / 12).
   The doubling claim is "deeper costs log-many extra rounds, each
   round flat": the probe pins total time ~ rounds (flat per-round
   cost) while depth grows 256x.

    python scripts/scale_round9.py [skew|depth|all]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _synth import get_spark as _spark  # noqa: E402
from _synth import synth_intervals as _intervals  # noqa: E402


def probe_skew(spark) -> None:
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.interval_join import (
        interval_join,
    )

    def run(n: int, skewed: bool) -> tuple[float, int]:
        left = _intervals(spark, n, skewed, seed=1)
        right = _intervals(spark, n // 4, skewed, seed=77)
        t0 = time.monotonic()
        j = interval_join(
            left, right, bin_size=1_000_000,
            left_prefix="g_", right_prefix="s_",
        )
        cnt = j.count()
        return time.monotonic() - t0, cnt

    run(100_000, True)  # warm codegen
    sizes = [500_000, 2_000_000, 8_000_000]
    times = []
    for n in sizes:
        dt, cnt = run(n, skewed=True)
        times.append(dt)
        print(f"skew n={n}: {dt:.2f}s pairs={cnt}")
    alpha = math.log(times[-1] / times[0]) / math.log(sizes[-1] / sizes[0])
    dt_u, _ = run(sizes[-1], skewed=False)
    print(f"uniform n={sizes[-1]}: {dt_u:.2f}s -> skew ratio {times[-1]/dt_u:.2f}x")
    print(f"interval_join skew alpha = {alpha:.2f}")

    # rows-per-output-partition spread of the join at the biggest size
    left = _intervals(spark, sizes[-1], True, seed=1)
    right = _intervals(spark, sizes[-1] // 4, True, seed=77)
    j = interval_join(
        left, right, bin_size=1_000_000, left_prefix="g_", right_prefix="s_"
    )
    per = (
        j.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.mean("count").alias("mean"),
            F.count(F.lit(1)).alias("parts"),
        )
        .first()
    )
    print(
        f"partition spread: max={per['mx']} mean={per['mean']:.0f} "
        f"parts={per['parts']} max/mean={per['mx']/per['mean']:.2f}x"
    )
    # and the join-KEY spread that drives it: rows per (chrom, bin)
    kb = (
        left.filter(F.col("end") > F.col("start"))
        .select(
            "chrom",
            F.explode(
                F.sequence(
                    F.expr("start div 1000000"), F.expr("(end - 1) div 1000000")
                )
            ).alias("bin"),
        )
        .groupBy("chrom", "bin")
        .count()
        .agg(F.max("count").alias("mx"), F.mean("count").alias("mean"))
        .first()
    )
    print(f"key spread: max={kb['mx']} mean={kb['mean']:.0f} max/mean={kb['mx']/kb['mean']:.2f}x")


def probe_depth(spark) -> None:
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        tree_roots,
    )

    n = 2_000_000

    def run(depth: int) -> tuple[float, int, int]:
        rounds = max(1, math.ceil(math.log2(depth)))
        nodes = spark.range(n).select(
            F.col("id").alias("node"),
            F.when(F.col("id") % depth == 0, F.col("id"))
            .otherwise(F.col("id") - 1)
            .alias("parent"),
        )
        t0 = time.monotonic()
        roots = tree_roots(nodes, "node", "parent", rounds)
        n_roots = roots.select("root").distinct().count()
        return time.monotonic() - t0, rounds, n_roots

    run(16)  # warm
    for depth in (16, 256, 4096):
        dt, rounds, n_roots = run(depth)
        assert n_roots == (n + depth - 1) // depth, (n_roots, depth)
        print(
            f"depth={depth}: rounds={rounds} total={dt:.2f}s "
            f"per-round={dt/rounds:.2f}s roots={n_roots}"
        )


def probe_bloom(spark) -> None:
    """The exact->sketch dedup handoff (bloom_pruned_dedup face) at
    volume: how much of the batch the Bloom pre-pass diverts away from
    the exact anti-join. m is sized 8 bits/key (FP ~2.4% at k=4) — the
    knob a 100 TB run scales with the seen-store."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        bloom_build,
        bloom_probe,
    )

    n_batch, n_seen, m = 8_000_000, 1_000_000, 1 << 23
    batch = spark.range(n_batch).select(
        F.md5(F.col("id").cast("string")).alias("fp")
    )
    seen = spark.range(n_seen).select(
        F.md5(F.col("id").cast("string")).alias("fp")
    )

    t0 = time.monotonic()
    plain = batch.join(seen, "fp", "left_anti").count()
    t_plain = time.monotonic() - t0

    t0 = time.monotonic()
    bloom = bloom_build(seen, "fp", k=4, m=m).localCheckpoint(eager=True)
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    maybe_fps = (
        bloom_probe(bloom, batch, "fp", k=4, m=m)
        .filter(F.col("maybe_member"))
        .select("fp")
        .localCheckpoint(eager=True)
    )
    n_maybe = maybe_fps.count()
    t_probe = time.monotonic() - t0
    t0 = time.monotonic()
    survivors = maybe_fps.join(seen, "fp", "left_anti").count()
    t_anti = time.monotonic() - t0
    fresh = n_batch - n_maybe
    pruned_new = fresh + survivors
    print(
        f"bloom handoff: batch={n_batch} seen={n_seen} "
        f"maybe={n_maybe} ({100*n_maybe/n_batch:.1f}% enter the exact "
        f"anti-join, {100*fresh/n_batch:.1f}% bypass) "
        f"fp_rate={(n_maybe-n_seen)/(n_batch-n_seen)*100:.2f}%"
    )
    assert pruned_new == plain, (pruned_new, plain)
    print(
        f"output identical ({plain} new rows); plain anti-join {t_plain:.2f}s "
        f"vs pruned: build {t_build:.2f}s + probe {t_probe:.2f}s + "
        f"anti-join-on-maybe {t_anti:.2f}s"
    )


def probe_setsketch(spark) -> None:
    """Resemblance-sketch scale shape: signature build cost follows the
    SCAN (one map-side-combinable min per (group, plane)); the all-pairs
    estimate join is CONSTANT (G·64 rows per side) while the exact
    pairwise intersection join grows with the shared vocabulary — the
    gap the sketch exists to close."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.setsketch import (
        jaccard_estimate_pairs,
        minhash_group_signature,
    )

    G = 8

    def data(n):
        # vocab ~ n/4, half shared across groups, half group-private
        return spark.range(n).select(
            (F.col("id") % G).cast("string").alias("g"),
            F.when(
                F.col("id") % 2 == 0,
                # id//G decouples token from group, so shared tokens
                # genuinely cross all G groups
                F.concat(
                    F.lit("shared-"),
                    ((F.col("id") / G).cast("long") % (n // 8)).cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("own-"),
                    (F.col("id") % G).cast("string"),
                    F.lit("-"),
                    (F.col("id") % (n // 8)).cast("string"),
                )
            )
            .alias("tok"),
        )

    def run(n):
        df = data(n)
        t0 = time.monotonic()
        sig = minhash_group_signature(df, "g", "tok", 64).localCheckpoint(
            eager=True
        )
        t_sig = time.monotonic() - t0
        t0 = time.monotonic()
        est_rows = jaccard_estimate_pairs(sig).count()
        t_est = time.monotonic() - t0
        t0 = time.monotonic()
        t = df.distinct()
        ta = t.select(F.col("g").alias("ga"), "tok")
        tb = t.select(F.col("g").alias("gb"), "tok")
        exact_rows = (
            ta.join(tb, "tok")
            .filter(F.col("ga") < F.col("gb"))
            .groupBy("ga", "gb")
            .count()
            .count()
        )
        t_exact = time.monotonic() - t0
        return t_sig, t_est, t_exact, est_rows, exact_rows

    run(200_000)  # warm
    sizes = [500_000, 2_000_000, 8_000_000]
    rows = [run(n) for n in sizes]
    for n, (t_sig, t_est, t_exact, er, xr) in zip(sizes, rows):
        print(
            f"setsketch n={n}: sig {t_sig:.2f}s est {t_est:.2f}s "
            f"exact {t_exact:.2f}s pairs={er}/{xr}"
        )
    a_sig = math.log(rows[-1][0] / rows[0][0]) / math.log(16)
    a_est = math.log(max(rows[-1][1], 1e-3) / max(rows[0][1], 1e-3)) / math.log(16)
    a_ex = math.log(rows[-1][2] / rows[0][2]) / math.log(16)
    print(f"alphas: signature {a_sig:.2f} estimate-join {a_est:.2f} exact {a_ex:.2f}")


def probe_media(spark) -> None:
    """Multimodal decode throughput: per-image cost of the Arrow-batched
    mapInPandas encode->decode->featurize path must be FLAT as the media
    count grows (1:1 row-bounded, no shuffle of payload bytes)."""
    from pyspark.sql import functions as F

    def run(n: int) -> float:
        import numpy as np
        import pandas as pd

        from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.codecs import (
            ppm_encode,
        )
        from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
            decode_and_featurize,
        )

        base = spark.range(n).select(F.col("id").alias("media_id"))

        def gen(batches):
            for pdf in batches:
                keys = pdf["media_id"].to_numpy()
                x = np.arange(16)[None, :, None, None]
                y = np.arange(16)[None, None, :, None]
                c = np.arange(3)[None, None, None, :]
                px = (
                    keys[:, None, None, None] * 7 + x * 13 + y * 31 + c * 5
                ) % 256
                payloads = [
                    ppm_encode(px[i].transpose(1, 0, 2).astype(np.uint8))
                    for i in range(len(keys))
                ]
                yield pd.DataFrame(
                    {
                        "media_id": keys,
                        "payload": payloads,
                        "meta": [{"mime": "image/x-portable-pixmap"}]
                        * len(keys),
                    }
                )

        media = base.mapInPandas(
            gen, schema="media_id long, payload binary, meta struct<mime: string>"
        )
        t0 = time.monotonic()
        decode_and_featurize(media, feat_dim=8).select(
            F.sum(F.element_at("feature", 1)).alias("s")
        ).collect()
        return time.monotonic() - t0

    run(20_000)  # warm
    sizes = [50_000, 200_000, 800_000]
    times = [run(n) for n in sizes]
    for n, dt in zip(sizes, times):
        print(f"media n={n}: {dt:.2f}s ({n/dt/1000:.0f}k img/s)")
    alpha = math.log(times[-1] / times[0]) / math.log(16)
    print(f"media decode alpha = {alpha:.2f}")


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("skew", "all"):
        probe_skew(spark)
    if which in ("depth", "all"):
        probe_depth(spark)
    if which in ("bloom", "all"):
        probe_bloom(spark)
    if which in ("setsketch", "all"):
        probe_setsketch(spark)
    if which in ("media", "all"):
        probe_media(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
