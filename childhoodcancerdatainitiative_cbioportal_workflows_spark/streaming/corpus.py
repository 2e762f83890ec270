"""Streaming corpus ingest: continuous incremental dedup (SURVEY §7 P7).

The streaming face of :func:`..llm.dedup.incremental_dedup`: documents
arrive continuously (landing-zone files, or any source producing the
document schema) and each micro-batch must emit only content never seen
before — neither in the historical corpus nor earlier in the stream.

Composition, all engine-native so state stays bounded:

* fingerprint = the batch operator's md5 normalization (one narrow
  projection — identical bits to the batch path, so a backfill and the
  live stream agree);
* intra-stream dedup via ``dropDuplicatesWithinWatermark`` on the
  fingerprint — state holds only fingerprints younger than the watermark
  (16 B + timestamp per entry), the unbounded-state trap of a plain
  ``dropDuplicates`` documented away;
* seen-corpus subtraction via a stream-static LEFT ANTI join against the
  fingerprint-only snapshot (one of the stream-static join types Spark
  executes without state — the static side is re-scanned per micro-batch,
  so a snapshot refresh is picked up on the next trigger).

At 100 TB-corpus scale the static side is the fingerprint store (bucketed
by ``fp`` at write time so the per-batch anti join is shuffle-one-sided),
NOT the corpus itself — the stream never reads old text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.text import fingerprint

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, fmt: str = "json", max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream over a landing directory of document files."""
    reader = spark.readStream.schema(DOCS_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    return getattr(reader, fmt)(path)


def incremental_dedup_stream(
    docs: DataFrame,
    seen_fingerprints: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Continuously emit first-seen documents: (doc_id, ts, fp) for every
    stream row whose fingerprint is new to both the stream (within the
    watermark horizon) and the static seen-store.

    ``seen_fingerprints`` needs one column ``fp`` (as written by the batch
    operators). Works identically on a batch frame (no watermark state;
    ``dropDuplicates`` degenerates to the batch groupBy shape) — the
    one-code-path-for-batch-and-stream contract the rest of the streaming
    surface keeps."""
    staged = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if staged.isStreaming:
        fresh = staged.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fp"]
        )
    else:
        fresh = staged.dropDuplicates(["fp"])
    return fresh.join(seen_fingerprints.select("fp"), "fp", "left_anti").select(
        id_col, ts_col, "fp"
    )


def _banded_signatures(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_words: int,
) -> DataFrame:
    """(id, band, bucket, signature) band rows for a (micro-)batch —
    the unit the incremental near-dup store holds."""
    from ..llm.dedup import minhash_signatures

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_words=shingle_words,
    ).filter(F.size("signature") > 0)
    bb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.slice(
                            F.col("signature"), b * rows_per_band + 1, rows_per_band
                        ).cast("string")
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    )
    return sigs.select("id", bb.alias("bb"), "signature").select(
        "id", "bb.band", "bb.bucket", "signature"
    )


def _verified_pairs(cand: DataFrame, num_hashes: int, threshold: float) -> DataFrame:
    """(id_a, id_b, est_jaccard) from candidate rows carrying both
    signatures — estimated Jaccard = fraction of matching minhashes."""
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.lit(num_hashes)
    )
    return (
        cand.select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


BAND_RANGE_COL = "brange"  # bucket-range partition column of the band store
BAND_BATCH_COL = "batch_id"  # micro-batch partition column (replay idempotency)
_COMPACTED_BATCH = -1  # sentinel batch_id partition holding compacted rows


def incremental_minhash_sink(
    stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint: str | None = None,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_ranges: int = 64,
    bucket_prune_limit: int = 1024,
):
    """Continuous NEAR-duplicate detection — the LSH complement of
    :func:`incremental_dedup_stream`'s exact dedup: each micro-batch's
    documents are minhash-banded, joined against the accumulated band
    store (and themselves) on (band, bucket), signature-verified, and the
    surviving pairs written to ``pairs_path``; the batch's band rows are
    then written to the store. A document arriving today is flagged
    against every near-duplicate ingested before it without re-reading
    any old text — the store holds (id, band, bucket, signature) rows
    only, ~(bands·16 + num_hashes·8) bytes per document.

    Idempotent replay: foreachBatch is only at-least-once, so after a
    failure/restart Spark re-runs the last micro-batch with the same
    ``batch_id``. Both outputs are therefore partitioned by ``batch_id``
    and written with dynamic partition OVERWRITE — a replayed batch
    replaces exactly its own partitions instead of double-appending
    (minhashing is deterministic, so the replay produces identical
    rows). The store read also excludes the current batch_id partition,
    so a replay whose first attempt committed the store write does not
    see its own rows as "history".

    Scale shape: the store is partitioned by ``brange = pmod(bucket,
    n_ranges)`` so the per-batch scan prunes whole directories, then
    row-group min/max stats on the 64-bit ``bucket`` skip files inside
    surviving ranges. The bucket predicate is size-guarded: up to
    ``bucket_prune_limit`` distinct batch buckets it is an IN-literal
    (static pushdown into the parquet scan); above that a broadcast
    LEFT SEMI join — a million-doc micro-batch must not build a
    multi-million-element IN expression. The candidate join keys on
    (band, bucket) — the same fine-grained-key argument as the batch LSH
    operator; the cross-batch pair set grows append-only (a pair
    re-emits only if BOTH members are re-ingested). Single writer
    enforced by checkpointing; run :func:`compact_band_store` between
    batches to keep files-per-range bounded."""

    def _per_batch(batch: DataFrame, batch_id: int) -> None:
        _minhash_batch(
            batch,
            batch_id,
            store_path=store_path,
            pairs_path=pairs_path,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_words=shingle_words,
            text_col=text_col,
            id_col=id_col,
            n_ranges=n_ranges,
            bucket_prune_limit=bucket_prune_limit,
        )

    writer = stream.writeStream.foreachBatch(_per_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def _minhash_batch(
    batch: DataFrame,
    batch_id: int,
    *,
    store_path: str,
    pairs_path: str,
    threshold: float,
    num_hashes: int,
    bands: int,
    shingle_words: int,
    text_col: str,
    id_col: str,
    n_ranges: int,
    bucket_prune_limit: int,
) -> None:
    """One micro-batch of :func:`incremental_minhash_sink` — module-level
    so replay idempotency is directly testable (invoke twice with the
    same ``batch_id``; the outputs must be unchanged)."""
    spark = batch.sparkSession
    banded = _banded_signatures(
        batch, text_col, id_col, num_hashes, bands, shingle_words
    ).localCheckpoint(eager=True)  # reused by 3 consumers below
    jpath = spark._jvm.org.apache.hadoop.fs.Path(store_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    new_side = banded.toDF("id_b", "band", "bucket", "sig_b")
    pairs = []
    if fs.exists(jpath):
        store = spark.read.parquet(store_path)
        if BAND_BATCH_COL in store.columns:  # replay must not see itself
            store = store.filter(F.col(BAND_BATCH_COL) != F.lit(batch_id))
        # ---- size-guarded bucket prune ------------------------------
        # Distinct batch buckets ≤ docs·bands; the collect is bounded
        # by limit(N+1) regardless of batch size. Small set → IN
        # literal (static partition + row-group pruning); large set →
        # broadcast semi-join (no giant IN expression), with the
        # brange partition prune kept as a literal since it is bounded
        # by n_ranges whatever the batch size.
        bucket_df = banded.select("bucket").distinct()
        sample = bucket_df.limit(bucket_prune_limit + 1).collect()
        if BAND_RANGE_COL in store.columns:
            branges = sorted({r[0] % n_ranges for r in sample})
            if len(sample) > bucket_prune_limit:
                branges = [
                    r[0]
                    for r in banded.select(
                        F.pmod(F.col("bucket"), F.lit(n_ranges)).alias("r")
                    )
                    .distinct()
                    .collect()
                ]  # bounded by n_ranges
            store = store.filter(F.col(BAND_RANGE_COL).isin(branges))
        if len(sample) <= bucket_prune_limit:
            store = store.filter(
                F.col("bucket").isin([r[0] for r in sample])
            )
        else:
            store = store.join(F.broadcast(bucket_df), "bucket", "left_semi")
        store = store.select(
            F.col("id").alias("id_a"),
            "band",
            "bucket",
            F.col("signature").alias("sig_a"),
        )
        cross = (
            store.join(new_side, ["band", "bucket"])
            .filter(F.col("id_a") != F.col("id_b"))
        )
        pairs.append(_verified_pairs(cross, num_hashes, threshold))
    intra = (
        banded.toDF("id_a", "band", "bucket", "sig_a")
        .join(new_side, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
    )
    pairs.append(_verified_pairs(intra, num_hashes, threshold))
    from functools import reduce

    out = reduce(DataFrame.unionByName, pairs)
    (
        out.withColumn(BAND_BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BAND_BATCH_COL)
        .parquet(pairs_path)
    )
    (
        banded.withColumn(
            BAND_RANGE_COL,
            F.pmod(F.col("bucket"), F.lit(n_ranges)).cast("int"),
        )
        .withColumn(BAND_BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BAND_RANGE_COL, BAND_BATCH_COL)
        .parquet(store_path)
    )


def compact_band_store(
    spark: SparkSession,
    store_path: str,
    max_files_per_range: int = 4,
) -> list[int]:
    """Small-file compaction for the band store — the
    ``compact_upsert_store`` discipline applied to the
    ``brange=X/batch_id=N`` layout: every micro-batch leaves one-plus
    parquet files per touched range, so thousands of micro-batches erode
    the min/max pruning the per-batch scan depends on. This maintenance
    pass folds, for each range holding more than ``max_files_per_range``
    data files, all *committed* batch partitions (every ``batch_id``
    except the store-wide maximum, which a restart may still replay)
    into the single ``batch_id=-1`` compacted partition, then deletes
    the folded source partitions. Light ranges are untouched.

    Crash window: between the compacted write and the source deletes a
    row can exist in both ``batch_id=-1`` and its source partition.
    That is harmless to emitted pairs — duplicate store rows produce
    duplicate candidates that collapse in ``_verified_pairs``'s
    ``distinct()`` — and self-heals on the next compaction via the
    ``dropDuplicates`` below. Run under the sink's single-writer lock
    (between batches). Returns the compacted range ids."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(store_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    heavy: list[int] = []
    max_batch = _COMPACTED_BATCH
    range_dirs: dict[int, list] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(f"{BAND_RANGE_COL}=")):
            continue
        rid = int(name.split("=", 1)[1])
        n_files = 0
        batch_dirs = []
        for bst in fs.listStatus(st.getPath()):
            bname = bst.getPath().getName()
            if not (bst.isDirectory() and bname.startswith(f"{BAND_BATCH_COL}=")):
                continue
            bid = int(bname.split("=", 1)[1])
            max_batch = max(max_batch, bid)
            batch_dirs.append((bid, bst.getPath()))
            n_files += sum(
                1
                for f in fs.listStatus(bst.getPath())
                if f.getPath().getName().endswith(".parquet")
            )
        range_dirs[rid] = batch_dirs
        if n_files > max_files_per_range:
            heavy.append(rid)
    if not heavy:
        return []
    folded = (
        spark.read.parquet(store_path)
        .filter(
            F.col(BAND_RANGE_COL).isin(heavy)
            & (F.col(BAND_BATCH_COL) != F.lit(max_batch))
        )
        .dropDuplicates()  # heals any earlier crash-window duplication
        .withColumn(BAND_BATCH_COL, F.lit(_COMPACTED_BATCH))
        # one task per range → exactly one output file per range
        .repartition(max(1, len(heavy)), F.col(BAND_RANGE_COL))
        .localCheckpoint(eager=True)  # materialize before touching files
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BAND_RANGE_COL, BAND_BATCH_COL)
        .parquet(store_path)
    )
    for rid in heavy:
        for bid, p in range_dirs[rid]:
            if bid not in (_COMPACTED_BATCH, max_batch):
                fs.delete(p, True)
    return sorted(heavy)
