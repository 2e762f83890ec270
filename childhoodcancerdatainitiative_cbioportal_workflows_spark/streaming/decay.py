"""Streaming twin of the exact decayed-trending operator.

The right streaming design for exponential decay is to NEVER store
decayed values: a stored score stales the moment time advances, so the
store keeps per-(key, day) COUNTS — which are decay-free and therefore
incrementally maintainable by a watermarked windowed aggregation — and
the decay weights are folded in at publish time against the newest day
in the store. This is the same counts-store-then-derive shape as
events.trending_sink (latest-window-count-wins merge + batch-side
derivation per trigger), specialized to the decay fold of
operators/decay.decayed_scores: weights are powers of two on half-life
buckets, products ride DECIMAL(38,0), so the published board is
bit-identical to running the batch operator over the full replayed
history (pinned by test).

Store size is horizon-bounded: the merge prunes days older than
``horizon_days`` behind the newest stored day, so per-trigger cost is
``keys × horizon`` rows regardless of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _decay_update(
    batch: DataFrame,
    batch_id: int,
    *,
    store_path: str,
    board_path: str,
    key_col: str,
    half_life_days: int,
    horizon_days: int,
    max_b: int,
) -> None:
    """One foreachBatch trigger of the counts-store merge + board publish
    (module-level so the replay-idempotence test can re-deliver a
    micro-batch directly — the test_minhash_batch_replay discipline).

    Idempotent under at-least-once redelivery BY CONSTRUCTION: update-mode
    counts are cumulative per (day, key), so the merge keeps exactly one
    row per (day, key) — the one with the newest ``_bid`` — and a replayed
    batch carries the same (day, k, n, _bid) rows it carried the first
    time, leaving both store and board byte-identical in content.

    NOTE: this store-merge (fs-exists check, _bid stamping, latest-wins
    row_number, event-time horizon prune) intentionally mirrors
    events.trending_sink; it is not extracted into a shared helper yet
    because editing streaming/events.py would flip the certification
    fingerprints of its faces mid-round (REGISTRY_FPR rule) — consolidate
    at the next certification boundary. Twin desync is guarded by the
    batch-equality e2e test either way."""
    spark = batch.sparkSession
    jpath = spark._jvm.org.apache.hadoop.fs.Path(store_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    batch = batch.withColumn("_bid", F.lit(batch_id))
    if fs.exists(jpath):
        merged = spark.read.parquet(store_path).unionByName(
            batch, allowMissingColumns=True
        )
    else:
        merged = batch
    from pyspark.sql import Window

    # counts are cumulative per (day, key) in update mode: the newest
    # batch's row is the correct one
    w = Window.partitionBy("day", "k").orderBy(F.col("_bid").desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # horizon prune against EVENT time (newest stored day), so
    # replays prune identically; one-row agg broadcast back
    bounds = latest.agg(F.max("day").alias("_ref"))
    latest = (
        latest.join(F.broadcast(bounds))
        .filter(
            F.datediff(F.col("_ref"), F.col("day")) < F.lit(horizon_days)
        )
        .localCheckpoint(eager=True)
    )
    latest.drop("_ref").write.mode("overwrite").parquet(store_path)
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators.decay import (
        decay_weight_expr,
    )

    board = (
        latest.withColumn("_age", F.datediff(F.col("_ref"), F.col("day")))
        .withColumn("_w", decay_weight_expr("_age", half_life_days, max_b))
        .groupBy(F.col("k").alias(key_col))
        .agg(
            F.sum(F.expr("CAST(n AS DECIMAL(38,0))") * F.col("_w"))
            .cast("bigint")
            .alias("score_fp")
        )
    )
    board.write.mode("overwrite").parquet(board_path)


def decayed_trending_sink(
    events: DataFrame,
    store_path: str,
    board_path: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    half_life_days: int = 2,
    horizon_days: int = 30,
    watermark: str = "2 hours",
    checkpoint: str | None = None,
):
    """Maintain per-(key, day) counts incrementally; publish the exact
    decayed leaderboard (key, score_fp) to ``board_path`` per trigger."""
    max_b = (horizon_days - 1) // half_life_days
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, "1 day").alias("w"), F.col(key_col).alias("k")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("date").alias("day"), "k", "n")
    )

    def _update(batch: DataFrame, batch_id: int) -> None:
        _decay_update(
            batch,
            batch_id,
            store_path=store_path,
            board_path=board_path,
            key_col=key_col,
            half_life_days=half_life_days,
            horizon_days=horizon_days,
            max_b=max_b,
        )

    writer = agg.writeStream.foreachBatch(_update).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
