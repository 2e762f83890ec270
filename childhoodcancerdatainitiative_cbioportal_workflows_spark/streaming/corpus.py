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
