#!/usr/bin/env python3
"""Round-8 probe: throttle_stream state-store growth under a GROWING key
universe (r7 verdict task 6). The batch probe measured alpha ~ 0 in data
size; this one checks the STREAMING claim — that event-time timeout
expiry keeps state rows flat while total distinct keys grow linearly.

Protocol: 100 micro-batches dropped as json files; batch i carries
ROWS_PER_BATCH events for KEYS_PER_BATCH fresh keys (universe grows by
K per batch) with event time advancing STEP_MIN minutes per batch.
Watermark 30 min, gap 60 s: a key last seen in batch i times out once
the watermark passes, so numRowsTotal must plateau near
K * (watermark/step + O(1)) instead of tracking i*K. Reports per-batch
wall time and the state-operator numRowsTotal curve.

    python scripts/scale_round8.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 100
KEYS_PER_BATCH = 200
ROWS_PER_BATCH = 1000
STEP_MIN = 10
WATERMARK = "30 minutes"
GAP_S = 60.0


def main() -> int:
    from pyspark.sql import SparkSession

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.streaming import (
        read_event_stream,
        throttle_stream,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="throttle_probe_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    t0_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00
    stream = read_event_stream(spark, src, fmt="json", max_files_per_trigger=1)
    q = (
        throttle_stream(stream, gap_seconds=GAP_S, watermark=WATERMARK)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .outputMode("append")
        .start()
    )
    times, state_rows = [], []
    try:
        for i in range(N_BATCHES):
            base_us = t0_us + i * STEP_MIN * 60 * 1_000_000
            with open(os.path.join(src, f"b{i:04d}.json"), "w") as f:
                for r in range(ROWS_PER_BATCH):
                    key = i * KEYS_PER_BATCH + (r % KEYS_PER_BATCH)
                    ts_us = base_us + (r // KEYS_PER_BATCH) * 25_000_000
                    ts = time.strftime(
                        "%Y-%m-%dT%H:%M:%S", time.gmtime(ts_us // 1_000_000)
                    )
                    f.write(
                        json.dumps(
                            {
                                "event_id": i * ROWS_PER_BATCH + r,
                                "ts": ts,
                                "user_id": key,
                                "event_type": "a",
                                "value": 1.0,
                                "props": "{}",
                            }
                        )
                        + "\n"
                    )
            t = time.monotonic()
            q.processAllAvailable()
            times.append(time.monotonic() - t)
            prog = q.lastProgress
            n_state = (
                prog["stateOperators"][0]["numRowsTotal"]
                if prog and prog.get("stateOperators")
                else None
            )
            state_rows.append(n_state)
            if (i + 1) % 10 == 0:
                print(
                    f"batch {i + 1:3d}: t={times[-1]:.2f}s state_rows={n_state}"
                    f" distinct_keys_seen={(i + 1) * KEYS_PER_BATCH}"
                )
    finally:
        q.stop()
        shutil.rmtree(work, ignore_errors=True)
    early = statistics.median(times[5:15])
    late = statistics.median(times[-10:])
    print(
        json.dumps(
            {
                "probe": "throttle_stream_state",
                "batches": N_BATCHES,
                "keys_per_batch": KEYS_PER_BATCH,
                "rows_per_batch": ROWS_PER_BATCH,
                "median_batch_s_early": round(early, 3),
                "median_batch_s_late": round(late, 3),
                "state_rows_b10": state_rows[9],
                "state_rows_b50": state_rows[49],
                "state_rows_b100": state_rows[-1],
                "distinct_keys_total": N_BATCHES * KEYS_PER_BATCH,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
