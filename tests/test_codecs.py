"""Dependency-free codec tests (llm/codecs): PPM/WAV round-trips and the
real (non-stub) multimodal decode paths they unlock in this container."""

from __future__ import annotations

import numpy as np
import pytest

from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.codecs import (
    ppm_decode,
    ppm_encode,
    ppm_gray_features,
    ppm_resize_nearest,
    wav_decode,
    wav_encode,
    wav_pooled_features,
)


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _img(7, 5)
    assert np.array_equal(ppm_decode(ppm_encode(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _img(2, 3)
    payload = b"P6 # comment\n# another\n 3\t2\n255\n" + img.tobytes()
    assert np.array_equal(ppm_decode(payload), img)


@pytest.mark.parametrize(
    "bad", [b"", b"P5\n1 1\n255\n\x00", b"P6\n2 2\n255\nxx", b"P6\n1 1\n65535\n\x00\x00"]
)
def test_ppm_corrupt_raises(bad):
    with pytest.raises(ValueError):
        ppm_decode(bad)


def test_ppm_resize_nearest_dims_and_identity():
    img = _img(8, 6)
    small = ppm_decode(ppm_resize_nearest(ppm_encode(img), 3, 4))
    assert small.shape == (4, 3, 3)
    # identity resize is lossless
    assert np.array_equal(ppm_decode(ppm_resize_nearest(ppm_encode(img), 6, 8)), img)


def test_wav_roundtrip_and_channel0():
    mono = np.sin(np.linspace(0, 20, 400)) * 0.4
    payload = wav_encode(mono, 8000)
    decoded, rate = wav_decode(payload)
    assert rate == 8000
    assert np.abs(decoded - mono).max() < 1.0 / 16384  # 16-bit quantization


def test_wav_corrupt_raises():
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxNOPE")


def test_real_ppm_decode_path_in_spark(spark):
    """decode_and_featurize uses the REAL ppm codec (not the sha1 stub):
    features equal the codec reference exactly."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
        MULTIMODAL_SCHEMA,
        decode_and_featurize,
    )

    img = _img(4, 16, seed=9)
    payload = ppm_encode(img)
    row = [
        (
            1,
            bytearray(payload),
            ("image/x-portable-pixmap", 16, 4, None, "mem://a.ppm"),
        )
    ]
    df = spark.createDataFrame(row, MULTIMODAL_SCHEMA)
    got = decode_and_featurize(df, feat_dim=8).collect()[0]["feature"]
    assert got == pytest.approx(ppm_gray_features(payload, 8), abs=1e-6)  # FEATURE_SCHEMA stores float32


def test_real_wav_decode_path_in_spark(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
        MULTIMODAL_SCHEMA,
        decode_and_featurize,
    )

    mono = np.cos(np.linspace(0, 6, 256)) * 0.25
    payload = wav_encode(mono, 16000)
    row = [(2, bytearray(payload), ("audio/wav", None, None, 16, "mem://a.wav"))]
    df = spark.createDataFrame(row, MULTIMODAL_SCHEMA)
    got = decode_and_featurize(df, feat_dim=6).collect()[0]["feature"]
    assert got == pytest.approx(wav_pooled_features(payload, 6), abs=1e-6)  # FEATURE_SCHEMA stores float32


def test_real_ppm_resize_path_in_spark(spark):
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.multimodal import (
        MULTIMODAL_SCHEMA,
        resize_images,
    )

    img = _img(10, 8, seed=4)
    row = [
        (
            3,
            bytearray(ppm_encode(img)),
            ("image/x-portable-pixmap", 8, 10, None, "mem://b.ppm"),
        )
    ]
    df = spark.createDataFrame(row, MULTIMODAL_SCHEMA)
    out = resize_images(df, 4, 5).collect()[0]
    resized = ppm_decode(bytes(out["payload"]))
    assert resized.shape == (5, 4, 3)
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 5


def test_audio_rms_zcr_matches_numpy_model(spark):
    """llm/audiofeat against an independent numpy model: random PCM16
    clips (including an all-zero and an empty-payload row) round-trip
    through wav_encode -> the mapInPandas decoder, and RMS /
    zero-crossings must equal the direct int16 computation. Pins the
    exactness contract the multimodal_audio face's oracle relies on:
    rint(mono*2^15) recovers the exact ints, sum(pcm^2) stays in int64,
    and sqrt(ss/n)/2^15 is the one float operation chain."""
    import math

    import numpy as np

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.audiofeat import (
        audio_rms_zcr,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.codecs import (
        wav_encode,
    )

    rng = np.random.default_rng(7)
    clips = {
        1: rng.integers(-32768, 32767, size=101).astype(np.int64),
        2: np.zeros(64, dtype=np.int64),
        3: rng.integers(-4, 4, size=57).astype(np.int64) * 1000,
    }
    rows = [
        (mid, bytearray(wav_encode(pcm / 32768.0, 8000)))
        for mid, pcm in clips.items()
    ] + [(4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_rms_zcr(df).collect()}

    for mid, pcm in clips.items():
        r = got[mid]
        neg = pcm < 0
        assert r["n_samples"] == len(pcm)
        assert r["zero_crossings"] == int(np.count_nonzero(neg[1:] != neg[:-1]))
        assert r["rms"] == math.sqrt(int(np.dot(pcm, pcm)) / len(pcm)) / 32768.0
        assert r["payload_bytes"] == 44 + 2 * len(pcm)
    assert (got[4]["payload_bytes"], got[4]["n_samples"], got[4]["rms"]) == (
        0, 0, 0.0,
    )
