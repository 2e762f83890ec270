#!/usr/bin/env python3
"""Round-14 probe: does one-file-per-bucket BIND on a skewed ingest?

sources/bucketed.write_bucketed's default repartition caps write
parallelism at n_buckets tasks and funnels a hot key into one task
(r12 advice, documented tradeoff with a one_file_per_bucket=False
escape hatch). The r13 verdict kept it "acceptable as a documented
tradeoff; revisit only if a skewed-ingest probe shows it binding."
This probe measures it: the same row count ingested at increasing
hot-key concentration (uniform / 30% / 60% of all rows on ONE bucket
key), written both ways, timing

  * the bucketed WRITE (where the skew penalty would bind),
  * the downstream exchange-free groupBy over the bucketed scan
    (where the False arm's extra files would bind), and
  * the file count (the False arm's permanent cost).

    python scripts/scale_round14.py [n_rows]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 32


def main() -> int:
    if len(sys.argv) > 2 or (len(sys.argv) == 2 and not sys.argv[1].isdigit()):
        print("usage: scale_round14.py [n_rows]", file=sys.stderr)
        return 2
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    spark = get_spark("scale-r14-skew")
    wh = "/tmp/scale_r14_skew"
    shutil.rmtree(wh, ignore_errors=True)
    os.makedirs(wh, exist_ok=True)

    def synth(hot_pct: int):
        """n_rows rows over ~100k string keys; the first hot_pct% land
        on the single key 'HOT' (one bucket), the rest uniform."""
        return (
            spark.range(n_rows)
            .withColumn(
                "k",
                F.when(
                    (F.col("id") % 100) < hot_pct, F.lit("HOT")
                ).otherwise(F.concat(F.lit("key_"), F.col("id") % 100_000)),
            )
            .withColumn("v", (F.col("id") * 37 % 1000).cast("long"))
            .select("k", "v")
        )

    def file_count(path: str) -> int:
        return len(glob.glob(os.path.join(path, "*.parquet")))

    # warmup: JVM/codegen for the write + agg paths
    synth(0).limit(100_000).write.mode("overwrite").parquet(f"{wh}/warm")
    print(f"n_rows={n_rows:,} buckets={N_BUCKETS}")
    print("hot% | write 1f/bkt | write free | files 1f | files free | "
          "read 1f | read free")
    for hot in (0, 30, 60):
        row = [f"{hot:3}%"]
        reads = []
        for arm, ofpb in (("one", True), ("free", False)):
            tbl = f"skew_{hot}_{arm}"
            path = f"{wh}/{tbl}"
            df = synth(hot)
            t0 = time.time()
            write_bucketed(
                df, tbl, ["k"], N_BUCKETS, path=path,
                one_file_per_bucket=ofpb,
            )
            row.append(f"{time.time() - t0:7.2f}s")
            row.append(f"{file_count(path):5d}")
            # downstream: exchange-free agg over the bucketed scan
            agg = read_bucketed(spark, tbl).groupBy("k").agg(
                F.sum("v").alias("s")
            )
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, f"{tbl}: agg plan has Exchange"
            t0 = time.time()
            agg.write.format("noop").mode("overwrite").save()
            reads.append(f"{time.time() - t0:6.2f}s")
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # reorder: writes+files first, then reads
        print(f"{row[0]} | {row[1]} | {row[3]} | {row[2]} | {row[4]} | "
              f"{reads[0]} | {reads[1]}")
    shutil.rmtree(wh, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
