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


def test_decode_malformed_payloads_fall_through_to_raw(spark):
    """Truncated fmt chunks and over-declared netpbm headers must yield
    kind='raw' byte stats, never crash the decode job (ADVICE r2)."""
    import struct

    from dbt_core_spark.operators.multimodal import decode_media, decode_ppm, decode_wav

    # WAV preamble + truncated fmt body (8 bytes < 16)
    bad_wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
               + b"fmt " + struct.pack("<I", 8) + b"\x00" * 8
               + b"data" + struct.pack("<I", 0)) + b"\x00" * 8
    # PPM header declaring 1000x1000 pixels with a 10-byte body
    bad_ppm = b"P6\n1000 1000\n255\n" + b"\x00" * 10
    assert decode_wav(bad_wav) is None
    assert decode_ppm(bad_ppm) is None

    df = spark.createDataFrame(
        [(1, bytearray(bad_wav)), (2, bytearray(bad_ppm)), (3, None)],
        "media_id long, data binary")
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[1]["kind"] == "raw" and rows[1]["n_bytes"] == len(bad_wav)
    assert rows[2]["kind"] == "raw" and rows[2]["n_bytes"] == len(bad_ppm)
    assert rows[3]["kind"] == "raw" and rows[3]["n_bytes"] == 0
