"""Round-9 multimodal face: the binary-column decode path certified
value-exactly against an ANALYTIC oracle.

The multimodal plumbing (binary payload column + typed metadata →
Arrow-batched mapInPandas decode → feature vectors) was pytest-only
evidence until now (I/O-boundary, per the r8 verdict's certification
table). This face removes the boundary: the payloads are SYNTHESIZED
in-plan (deterministic PPM bytes whose pixel values are integer
arithmetic over p_partkey), so the DuckDB oracle can recompute the
decoded luma features from the generating formula — no binary I/O on the
oracle side, yet the Spark side exercises the REAL codec path
(llm.codecs.ppm_encode → decode_and_featurize → ppm_gray_features) end
to end, Arrow batches and all.
"""

from ._common import *  # noqa: F401,F403


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → Arrow-batched decode → per-pixel luma
    features, certified bit-exactly: each part key becomes a 4×2 P6 PPM
    whose pixel (x, y, c) is ``(key·7 + x·13 + y·31 + c·5) % 256``; the
    codec's ITU-R 601 luma strip (feat_dim=4 → one feature per column of
    row 0) is exploded to (media_id, j, feature) rows. The oracle
    recomputes the same IEEE arithmetic analytically — including the
    float32 rounding the FEATURE_SCHEMA imposes — so agreement certifies
    the whole binary path: encode, Arrow transfer, decode, luma, strip
    sampling. Scale shape: mapInPandas is 1:1 row-bounded with Arrow
    batch caps; payload bytes never shuffle (generated and consumed
    within one stage)."""
    import numpy as np
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.codecs import (
        ppm_encode,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
        decode_and_featurize,
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )

    def gen(batches):
        for pdf in batches:
            keys = pdf["media_id"].to_numpy()
            x = np.arange(4)[None, :, None, None]
            y = np.arange(2)[None, None, :, None]
            c = np.arange(3)[None, None, None, :]
            px = (keys[:, None, None, None] * 7 + x * 13 + y * 31 + c * 5) % 256
            # (n, w, h, c) -> per-image (h, w, 3) for the encoder
            payloads = [
                ppm_encode(px[i].transpose(1, 0, 2).astype(np.uint8))
                for i in range(len(keys))
            ]
            yield pd.DataFrame(
                {
                    "media_id": keys,
                    "payload": payloads,
                    "meta": [{"mime": "image/x-portable-pixmap"}] * len(keys),
                }
            )

    media = part.mapInPandas(
        gen, schema="media_id long, payload binary, meta struct<mime: string>"
    )
    feats = decode_and_featurize(media, feat_dim=4)
    return feats.select(
        "media_id",
        "payload_bytes",
        F.posexplode("feature").alias("j", "_f"),
    ).select(
        "media_id",
        F.col("j").cast("long").alias("j"),
        F.col("_f").cast("double").alias("feature"),
        "payload_bytes",
    )


SQL_MULTIMODAL_FEATURES = """
WITH px AS (
  SELECT p_partkey AS media_id, j,
         CAST((p_partkey * 7 + j * 13 + 0) % 256 AS DOUBLE) AS r,
         CAST((p_partkey * 7 + j * 13 + 5) % 256 AS DOUBLE) AS g,
         CAST((p_partkey * 7 + j * 13 + 10) % 256 AS DOUBLE) AS b
  FROM part, (SELECT unnest(range(0, 4)) AS j)
)
SELECT media_id, CAST(j AS BIGINT) AS j,
       CAST(CAST(
         (r * CAST('0.299' AS DOUBLE)
          + g * CAST('0.587' AS DOUBLE)
          + b * CAST('0.114' AS DOUBLE)) / CAST('255.0' AS DOUBLE)
         - CAST('0.5' AS DOUBLE)
       AS REAL) AS DOUBLE) AS feature,
       CAST(35 AS BIGINT) AS payload_bytes
FROM px
"""


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO twin of q_multimodal_features (r9 verdict task 6): binary
    WAV column -> real RIFF decode -> RMS / zero-crossing features,
    certified bit-exactly. Each part key becomes a 64-sample PCM16 clip
    whose sample i is ``((key·37 + i·101) % 4096) - 2048`` — a sawtooth
    that crosses zero — encoded through the REAL codec
    (llm.codecs.wav_encode) and decoded by the REAL RIFF parser inside
    the Arrow-batched mapInPandas (llm.audiofeat.audio_rms_zcr). The
    oracle recomputes both descriptors from the generating formula:
    zero crossings are pure integer arithmetic, and RMS =
    sqrt(sum(pcm²)/64)/2^15 is exact-then-correctly-rounded (pcm² <
    2^22, 64-sample sum < 2^28, /64 and /2^15 are power-of-two-exact,
    IEEE sqrt is correctly rounded in both engines). Scale shape:
    payloads are generated and consumed inside ONE stage — the shuffle
    carries only the 5 scalar feature columns, never the bytes."""
    import numpy as np
    import pandas as pd

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.audiofeat import (
        audio_rms_zcr,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.codecs import (
        wav_encode,
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )

    def gen(batches):
        for pdf in batches:
            keys = pdf["media_id"].to_numpy()
            i = np.arange(64)[None, :]
            pcm = (keys[:, None] * 37 + i * 101) % 4096 - 2048
            payloads = [
                wav_encode(pcm[r] / 32768.0, 8000) for r in range(len(keys))
            ]
            yield pd.DataFrame({"media_id": keys, "payload": payloads})

    media = part.mapInPandas(gen, schema="media_id long, payload binary")
    return audio_rms_zcr(media)


SQL_MULTIMODAL_AUDIO = """
WITH s AS (
  SELECT p_partkey AS media_id, i,
         ((p_partkey * 37 + i * 101) % 4096) - 2048 AS pcm
  FROM part, (SELECT unnest(range(0, 64)) AS i)
), lagged AS (
  SELECT media_id, pcm,
         lag(pcm) OVER (PARTITION BY media_id ORDER BY i) AS prev
  FROM s
)
SELECT media_id,
       CAST(172 AS BIGINT) AS payload_bytes,
       CAST(64 AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN (pcm < 0) <> (prev < 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_crossings,
       SQRT(CAST(SUM(pcm * pcm) AS DOUBLE) / 64) / 32768.0 AS rms
FROM lagged
GROUP BY media_id
"""
