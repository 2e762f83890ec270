#!/usr/bin/env python3
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall-clock seconds. Results are forced with the noop sink (full
execution, no driver collect)."""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import get_spark

    spark = get_spark("ccdi-spark-bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM/codegen paths so the first measured query of each shape
    # doesn't pay session startup or whole-stage-codegen compilation:
    # scan+agg (tpch_q1) and the HOF/text family (doc_quality)
    for warm in ("tpch_q1_agg", "doc_quality"):
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    total = 0.0
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)  # dedup plans persist intermediates; drop them
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
