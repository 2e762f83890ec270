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
):
    """Continuous NEAR-duplicate detection — the LSH complement of
    :func:`incremental_dedup_stream`'s exact dedup: each micro-batch's
    documents are minhash-banded, joined against the accumulated band
    store (and themselves) on (band, bucket), signature-verified, and the
    surviving pairs appended to ``pairs_path``; the batch's band rows are
    then appended to the store. A document arriving today is flagged
    against every near-duplicate ingested before it without re-reading
    any old text — the store holds (id, band, bucket, signature) rows
    only, ~(bands·16 + num_hashes·8) bytes per document.

    Scale shape: the store scan is pruned with a ``bucket IN (batch's
    buckets)`` predicate — parquet row-group min/max stats on the 64-bit
    bucket skip everything the batch can't touch (at warehouse scale,
    bucket-range-partition the store so the predicate prunes whole
    files). The candidate join keys on (band, bucket) — the same
    fine-grained-key argument as the batch LSH operator; the cross-batch
    pair set is append-only (a pair re-emits only if BOTH members are
    re-ingested). Single writer enforced by checkpointing."""

    def _per_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        banded = _banded_signatures(
            batch, text_col, id_col, num_hashes, bands, shingle_words
        ).localCheckpoint(eager=True)  # reused by 3 consumers below
        jpath = spark._jvm.org.apache.hadoop.fs.Path(store_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        new_side = banded.toDF("id_b", "band", "bucket", "sig_b")
        pairs = []
        if fs.exists(jpath):
            buckets = [
                r[0] for r in banded.select("bucket").distinct().collect()
            ]
            store = (
                spark.read.parquet(store_path)
                .filter(F.col("bucket").isin(buckets))
                .toDF("id_a", "band", "bucket", "sig_a")
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
        out.write.mode("append").parquet(pairs_path)
        banded.write.mode("append").parquet(store_path)

    writer = stream.writeStream.foreachBatch(_per_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
