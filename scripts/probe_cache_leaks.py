"""Leak probe: run every registered face once through the bench's own
run/release cycle and report the persistent-RDD population after each,
naming any face that leaves blocks behind. A clean engine ends every face
at zero live cached/checkpointed RDDs (modulo the async ContextCleaner,
which a System.gc() + sleep flushes).

Run on a quiet box: python scripts/probe_cache_leaks.py [face ...]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
    get_spark,
)


def live_rdds(spark):
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    return jmap.size()


def main():
    spark = get_spark("probe-cache-leaks")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        release_plan_caches,
    )

    qs = entrymod.queries()
    wanted = sys.argv[1:] or list(qs)
    leaks = {}
    for name in wanted:
        before = live_rdds(spark)
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)
        del df
        gc.collect()  # drop py4j refs so the ContextCleaner can act
        after = live_rdds(spark)
        if after > before:
            # give the async cleaner one chance before declaring a leak
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
            after = live_rdds(spark)
        status = "LEAK" if after > before else "ok"
        if after > before:
            leaks[name] = after - before
        print(f"{status:>4} {name}: live RDDs {before} -> {after}", flush=True)
    print(f"\nleaking faces: {leaks or 'none'}")


if __name__ == "__main__":
    main()
