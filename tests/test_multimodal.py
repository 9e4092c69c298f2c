"""Multimodal decode kernels: real WAV/PPM codecs (dependency-free) and
the Arrow-batched dispatch (engine extension, driver north star)."""

import numpy as np

from dbt_core_spark.operators.multimodal import (
    decode_media, decode_ppm, decode_wav, encode_ppm, encode_wav,
    synth_media,
)


def test_wav_roundtrip():
    samples = np.array([1000, -1000, 500, -500, 0, 250], dtype="<i2")
    payload = encode_wav(samples, sample_rate=16000)
    out = decode_wav(payload)
    assert out["kind"] == "wav"
    assert out["sample_rate"] == 16000
    assert out["n_samples"] == 6
    assert out["peak"] == 1000
    assert out["duration_ms"] == 6 * 1000 // 16000
    expect_rms = float(np.sqrt(np.mean(samples.astype("f8") ** 2)))
    assert abs(out["rms"] - expect_rms) < 1e-12
    assert decode_wav(b"not a wav at all") is None
    assert decode_wav(None) is None


def test_ppm_roundtrip():
    px = np.arange(2 * 3 * 3, dtype="u1").reshape(2, 3, 3)
    payload = encode_ppm(px)
    out = decode_ppm(payload)
    assert out == {
        "kind": "ppm", "width": 3, "height": 2, "channels": 3,
        "mean_value": float(px.astype("f8").mean()),
    }
    # P5 grayscale + comment line in header
    gray = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    out5 = decode_ppm(gray)
    assert out5["width"] == 4 and out5["height"] == 2 and out5["channels"] == 1
    assert decode_ppm(b"JFIF...") is None


def test_decode_media_dispatch(spark, sf_dir):
    import __spark_entry__ as em

    docs = em._t(spark, sf_dir, "documents").limit(50)
    out = decode_media(synth_media(docs, "text", "doc_id")).toPandas()
    assert len(out) == 50
    wavs = out[out["kind"] == "wav"]
    ppms = out[out["kind"] == "ppm"]
    assert len(wavs) > 0 and len(ppms) > 0
    assert set(out["media_id"][out["media_id"] % 2 == 0]) == set(wavs["media_id"])
    # wav features follow the synthesis formula exactly
    for _, r in wavs.iterrows():
        amp = 100 + int(r["media_id"]) % 900
        assert r["peak"] == amp and r["mean_value"] == float(amp)
        assert r["sample_rate"] == 8000
    for _, r in ppms.iterrows():
        assert r["width"] == 4 + int(r["media_id"]) % 13
        assert r["mean_value"] == float(int(r["media_id"]) % 256)
