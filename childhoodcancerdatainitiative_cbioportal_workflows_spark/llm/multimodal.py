"""Multimodal column plumbing (SURVEY §7 P7).

Media (image/audio/video) ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side contract — schema, partition sizing, Arrow
batch shape, UDF signature — is real and tested. Decode paths, in order:

* **dependency-free real codecs** (:mod:`.codecs`): raw PPM (P6) images
  and PCM16 WAV audio decode with numpy alone — these branches run (and
  are tested un-skipped) in any environment, including this container;
* import-guarded PIL / soundfile for every other image/audio format;
* a clearly-marked deterministic stub otherwise (ffmpeg-class video
  decode is out of scope), which keeps the plan testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # real image codec where available; stub fallback otherwise
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - absent in this container
    _PILImage = None

try:  # real audio codec where available
    import soundfile as _soundfile
except ImportError:  # pragma: no cover - absent in this container
    _soundfile = None

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


def _meta_dict(meta) -> dict | None:
    """Arrow hands the meta struct to Python as a dict, collect() as a Row,
    and MULTIMODAL_SCHEMA declares it nullable — normalize all three.
    (isinstance(None, dict) is False, so a dict/Row two-way dispatch sends
    NULL metas into Row attribute access and raises.)"""
    if meta is None:
        return None
    if isinstance(meta, dict):
        return dict(meta)
    return meta.asDict()


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding: byte size + content hash
    (JVM-side, used for exact media dedup before any expensive decode)."""
    return df.withColumn("payload_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "content_sha1", F.sha1(F.col(payload_col))
    )


def _decode_stub(payload: bytes, mime: str, feat_dim: int) -> list[float]:
    """Deterministic fake feature vector (stands in for decode+embed when no
    codec library is importable). NotImplementedError would also satisfy the
    build contract; a deterministic fake keeps the plan testable end-to-end."""
    h = hashlib.sha1(payload or b"").digest()
    return [((h[i % len(h)] / 255.0) - 0.5) for i in range(feat_dim)]


def _decode_features(payload: bytes, mime: str, feat_dim: int) -> list[float]:
    """Real decode where a codec is importable, stub otherwise.

    image/*: PIL decode -> grayscale -> resize to feat_dim px -> centered
    [-0.5, 0.5] pixel features. audio/*: soundfile decode -> feat_dim
    mean-pooled windows of the first channel. Anything else (or a corrupt
    payload) falls back to the deterministic stub."""
    mime = mime or ""
    try:
        # dependency-free REAL decode paths first (always available):
        # raw PPM images and PCM16 WAV need only numpy
        if mime == "image/x-portable-pixmap":
            from .codecs import ppm_gray_features

            return ppm_gray_features(payload, feat_dim)
        if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
            from .codecs import wav_pooled_features

            return wav_pooled_features(payload, feat_dim)
        if _PILImage is not None and mime.startswith("image/"):
            from io import BytesIO

            img = _PILImage.open(BytesIO(payload)).convert("L").resize((feat_dim, 1))
            return [px / 255.0 - 0.5 for px in img.getdata()]
        if _soundfile is not None and mime.startswith("audio/"):
            from io import BytesIO

            data, _rate = _soundfile.read(BytesIO(payload))
            mono = data if getattr(data, "ndim", 1) == 1 else data[:, 0]
            if len(mono) == 0:
                return [0.0] * feat_dim
            step = max(1, len(mono) // feat_dim)
            return [
                float(mono[i * step : (i + 1) * step].mean()) if i * step < len(mono) else 0.0
                for i in range(feat_dim)
            ]
    except Exception:  # corrupt payload: deterministic fallback, not a crash
        pass
    return _decode_stub(payload, mime, feat_dim)


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
    ``meta.duration_ms``; non-video rows (including NULL meta) produce no
    frames. The frame decode is a deterministic stub (no ffmpeg in this
    container): a real decoder replaces ``_frame_stub`` only — schema,
    fan-out and Arrow batching stay as tested."""
    import pandas as pd

    def _frame_stub(payload: bytes, idx: int) -> bytes:
        return hashlib.sha1((payload or b"") + idx.to_bytes(4, "big")).digest()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = _meta_dict(getattr(r, "meta"))
                if meta is None:
                    continue
                mime, dur = meta.get("mime"), meta.get("duration_ms")
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


def _resize_payload(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Raw-PPM nearest-neighbor resize (dependency-free, always real);
    PIL for other formats where importable; deterministic stub bytes
    otherwise (or on a corrupt payload)."""
    if payload and payload[:2] == b"P6":
        try:
            from .codecs import ppm_resize_nearest

            return ppm_resize_nearest(payload, target_w, target_h)
        except ValueError:
            pass
    if _PILImage is not None:
        try:
            from io import BytesIO

            img = _PILImage.open(BytesIO(payload))
            fmt = img.format or "PNG"
            buf = BytesIO()
            img.resize((target_w, target_h)).save(buf, format=fmt)
            return buf.getvalue()
        except Exception:
            pass
    return hashlib.sha1((payload or b"") + b"resize").digest()


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize: 1:1 mapInPandas over image/* rows; other mimes (and
    NULL-meta rows) pass through untouched. Column-wise vectorized inside
    each Arrow batch — a boolean mime mask selects the rows to rewrite; no
    per-row DataFrame.apply. Pixel work is PIL where importable, else a
    deterministic stub; meta width/height are rewritten either way."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()
            metas = out["meta"].map(_meta_dict)
            is_img = metas.map(
                lambda m: bool(m and str(m.get("mime") or "").startswith("image/"))
            )
            out.loc[is_img, payload_col] = out.loc[is_img, payload_col].map(
                lambda p: _resize_payload(p, target_w, target_h)
            )
            out["meta"] = [
                {**m, "width": target_w, "height": target_h} if flag else m
                for m, flag in zip(metas, is_img)
            ]
            yield out

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
    by byte-budget, not row count, when payloads are large. Decode is the
    import-guarded real path (:func:`_decode_features`) with the stub as
    fallback."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            mimes = pdf["meta"].map(
                lambda m: (_meta_dict(m) or {}).get("mime")
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": mimes,
                    "payload_bytes": pdf[payload_col].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "content_sha1": pdf[payload_col].map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "feature": [
                        _decode_features(p, m, feat_dim)
                        for p, m in zip(pdf[payload_col], mimes)
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
