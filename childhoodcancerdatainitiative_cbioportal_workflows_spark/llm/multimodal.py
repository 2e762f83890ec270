"""Multimodal column plumbing (SURVEY §7 P7).

Media (image/audio/video) ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side contract — schema, partition sizing, Arrow
batch shape, UDF signature — is real and tested; the codec itself is a
deterministic stub behind ``decode_and_featurize`` because decode libraries
(PIL/ffmpeg/torchaudio) are not in this container. Swap ``_decode_stub``
for a real decoder without touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("content_sha1", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding: byte size + content hash
    (JVM-side, used for exact media dedup before any expensive decode)."""
    return df.withColumn("payload_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "content_sha1", F.sha1(F.col(payload_col))
    )


def _decode_stub(payload: bytes, mime: str, feat_dim: int) -> list[float]:
    """Deterministic fake feature vector (stands in for decode+embed).

    Real implementation decodes the payload (PIL for image/*, soundfile for
    audio/*, frame-sampling for video/*) and runs a feature extractor; both
    are unavailable in this container. NotImplementedError would also be
    acceptable per the build contract; a deterministic fake keeps the plan
    shape testable end-to-end."""
    h = hashlib.sha1(payload or b"").digest()
    return [((h[i % len(h)] / 255.0) - 0.5) for i in range(feat_dim)]


def decode_and_featurize(
    df: DataFrame,
    feat_dim: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow-batched, one Python worker
    per partition, bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    so huge payload batches cannot blow worker memory. Repartition upstream
    by byte-budget, not row count, when payloads are large."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": pdf["meta"].map(
                        lambda m: (m or {}).get("mime") if isinstance(m, dict) else m["mime"]
                    ),
                    "payload_bytes": pdf[payload_col].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "content_sha1": pdf[payload_col].map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "feature": pdf.apply(
                        lambda r: _decode_stub(
                            r[payload_col],
                            (r["meta"] or {}).get("mime")
                            if isinstance(r["meta"], dict)
                            else r["meta"]["mime"],
                            feat_dim,
                        ),
                        axis=1,
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
