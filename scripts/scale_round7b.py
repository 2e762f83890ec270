#!/usr/bin/env python3
"""Round-7b scale probe: alpha exponents (t ~ n^alpha) for the operator
families added this round. Protocol matches scale_round5b/6/6b: seeded
synthetic inputs shaped like the testdata, persisted pre-partitioned
input frames, noop sink, one unmeasured warmup per family, quiet window.

    python scripts/scale_round7b.py
"""

from __future__ import annotations

import math
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _synth import synth_documents, synth_edges  # noqa: E402
from _synth import synth_events_stream as synth_events  # noqa: E402


def run(noop, fn, df):
    t0 = time.monotonic()
    noop(fn(df))
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
        get_spark,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        exact_substring_spans,
        phrase_search,
        release_plan_caches,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        kcore_peel,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.stats import (
        anomaly_flags,
        ks_drift,
        trend_slopes,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.throttle import (
        throttle_events,
    )

    spark = get_spark("scale-7b")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)

    results: dict[str, list[float]] = {}
    doc_sizes = (5000, 20000)
    ev_sizes = (50_000, 200_000)
    edge_sizes = (20_000, 200_000)

    # --- document family -------------------------------------------------
    doc_frames = {}
    for n in doc_sizes:
        d = spark.createDataFrame(synth_documents(n, seed=7)).repartition(64).persist()
        d.count()
        doc_frames[n] = d
    warm = doc_frames[doc_sizes[0]]
    noop(exact_substring_spans(warm, gram_words=8))
    noop(phrase_search(warm, ["w1", "w2"]))
    for n in doc_sizes:
        d = doc_frames[n]
        results.setdefault("substring_dedup", []).append(
            run(noop, lambda x: exact_substring_spans(x, gram_words=8), d)
        )
        results.setdefault("phrase_search", []).append(
            run(noop, lambda x: phrase_search(x, ["w1", "w2"]), d)
        )

    # --- events family ---------------------------------------------------
    ev_frames = {}
    for n in ev_sizes:
        e = spark.createDataFrame(
            synth_events(n, n_users=n // 600, seed=11)
        ).repartition(64).persist()
        e.count()
        ev_frames[n] = e
    we = ev_frames[ev_sizes[0]]
    noop(trend_slopes(we, "user_id", "ts", "value"))
    for n in ev_sizes:
        e = ev_frames[n]
        a = e.filter(F.col("event_type") == "click").select("value")
        b = e.filter(F.col("event_type") == "view").select("value")
        results.setdefault("ks_drift", []).append(
            run(noop, lambda _: ks_drift(a, b, "value"), e)
        )
        results.setdefault("trend_slopes", []).append(
            run(noop, lambda x: trend_slopes(x, "user_id", "ts", "value"), e)
        )
        results.setdefault("anomaly_flags", []).append(
            run(
                noop,
                lambda x: anomaly_flags(x, "user_id", "value", "event_id"),
                e,
            )
        )
        results.setdefault("throttle_events", []).append(
            run(
                noop,
                lambda x: throttle_events(
                    x.select("user_id", "event_id", "ts"),
                    "user_id",
                    "ts",
                    3600,
                    "event_id",
                ),
                e,
            )
        )

    # --- graph family ----------------------------------------------------
    edge_frames = {}
    for n in edge_sizes:
        g = spark.createDataFrame(synth_edges(n, 8, seed=13)).repartition(32).persist()
        g.count()
        edge_frames[n] = g
    noop(kcore_peel(spark.createDataFrame(synth_edges(8000, 8, seed=5)), k=2, iters=3))
    for n in edge_sizes:
        results.setdefault("kcore", []).append(
            run(noop, lambda x: kcore_peel(x, k=2, iters=3), edge_frames[n])
        )

    scale = {
        "substring_dedup": doc_sizes, "phrase_search": doc_sizes,
        "ks_drift": ev_sizes, "trend_slopes": ev_sizes,
        "anomaly_flags": ev_sizes, "throttle_events": ev_sizes,
        "kcore": edge_sizes,
    }
    print("| op | sizes | times (s) | alpha |")
    print("|---|---|---|---|")
    for op, ts in results.items():
        s = scale[op]
        alpha = math.log(ts[1] / ts[0]) / math.log(s[1] / s[0])
        print(
            f"| {op} | {s[0]} -> {s[1]} | {ts[0]:.2f} -> {ts[1]:.2f} "
            f"| {alpha:.2f} |"
        )
    print("load1", os.getloadavg()[0])


if __name__ == "__main__":
    main()
