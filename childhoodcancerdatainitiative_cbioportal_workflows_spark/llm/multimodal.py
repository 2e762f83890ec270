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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling: one input row fans out to <= ``max_frames``
    frame rows at ``every_ms`` spacing — the 1:N mapInPandas shape (a
    Python-side generate/explode). Frame count derives from
    ``meta.duration_ms``; non-video rows produce no frames. The frame
    decode is a deterministic stub (ffmpeg absent in this container): a
    real decoder replaces ``_frame_stub`` only — schema, fan-out and Arrow
    batching stay as tested."""
    import pandas as pd

    def _frame_stub(payload: bytes, idx: int) -> bytes:
        return hashlib.sha1((payload or b"") + idx.to_bytes(4, "big")).digest()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = getattr(r, "meta")
                mime = (meta or {}).get("mime") if isinstance(meta, dict) else meta["mime"]
                dur = (meta or {}).get("duration_ms") if isinstance(meta, dict) else meta["duration_ms"]
                if not mime or not mime.startswith("video/") or not dur:
                    continue
                payload = getattr(r, payload_col)
                n = min(int(dur // every_ms) + 1, max_frames)
                for i in range(n):
                    rows.append(
                        (
                            getattr(r, id_col),
                            i,
                            i * every_ms,
                            _frame_stub(payload, i),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_payload"]
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize: 1:1 mapInPandas over image/* rows; other mimes pass
    through untouched. The pixel work is a deterministic stub (PIL absent);
    the real implementation swaps ``_resize_stub`` for PIL's
    ``Image.resize`` — the plan (schema preserved, meta width/height
    rewritten) is what this pins."""
    import pandas as pd

    def _resize_stub(payload: bytes) -> bytes:
        return hashlib.sha1((payload or b"") + b"resize").digest()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()

            def fix(row):
                meta = row["meta"]
                m = dict(meta) if isinstance(meta, dict) else meta.asDict()
                if m.get("mime", "").startswith("image/"):
                    m["width"], m["height"] = target_w, target_h
                    row[payload_col] = _resize_stub(row[payload_col])
                row["meta"] = m
                return row

            yield out.apply(fix, axis=1)

    return df.mapInPandas(run, schema=df.schema)


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
