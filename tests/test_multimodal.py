from _slowmark import _mark_slow  # noqa: E402
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


@_mark_slow
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


# ---------------- resize_media ----------------

def test_resize_media_matches_numpy_reference(spark):
    import numpy as np

    from dbt_core_spark.operators.multimodal import resize_media, synth_media

    docs = spark.createDataFrame(
        [(i, "x" * (i % 10)) for i in range(1, 12, 2)], ["doc_id", "text"])
    media = synth_media(docs, pattern="gradient")
    out = {r["media_id"]: r for r in resize_media(media, out_w=8,
                                                  out_h=6).collect()}
    for mid in range(1, 12, 2):
        w, h = 4 + mid % 13, 3 + mid % 7
        plane = (mid + 3 * np.arange(w)[None, :]
                 + 7 * np.arange(h)[:, None]) % 256
        sy = (np.arange(6) * h) // 6
        sx = (np.arange(8) * w) // 8
        res = plane[sy[:, None], sx[None, :]]
        r = out[mid]
        assert (r["src_width"], r["src_height"]) == (w, h)
        assert (r["width"], r["height"]) == (8, 6)
        assert r["sum_value"] == int(res.sum()) * 3
        assert abs(r["mean_value"] - res.mean()) < 1e-9
        # re-encoded payload round-trips through the decoder
        from dbt_core_spark.operators.multimodal import decode_ppm
        d = decode_ppm(bytes(r["data"]))
        assert (d["width"], d["height"]) == (8, 6)
        assert abs(d["mean_value"] - res.mean()) < 1e-9


def test_resize_media_passthrough_non_images(spark):
    from dbt_core_spark.operators.multimodal import resize_media, synth_media

    docs = spark.createDataFrame([(2, "aud"), (4, "io")], ["doc_id", "text"])
    media = synth_media(docs)  # even ids -> WAV
    rows = resize_media(media).collect()
    assert {r["media_id"] for r in rows} == {2, 4}
    assert all(r["width"] is None and r["sum_value"] is None for r in rows)
    assert all(r["data"] is not None for r in rows)  # payload untouched


def test_resize_media_no_shuffle(spark):
    from dbt_core_spark.operators.multimodal import resize_media, synth_media

    docs = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
    plan = resize_media(synth_media(docs, pattern="gradient")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # binary column never shuffles


# ---------------- wav_spectrogram ----------------

def test_wav_spectrogram_square_wave_line_spectrum(spark):
    """The alternating square wave concentrates ALL energy in the
    Nyquist bin: mag[n_fft/2] = amplitude*n_fft, every other bin 0."""
    from dbt_core_spark.operators.multimodal import synth_media, wav_spectrogram

    docs = spark.createDataFrame(
        [(2, "x" * 3), (4, "y" * 5)], ["doc_id", "text"])  # even ids -> WAV
    media = synth_media(docs)
    rows = wav_spectrogram(media, n_fft=8).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], {})[(r["frame"], r["bin"])] = \
            r["mag_round"]
    for mid, text_len in [(2, 3), (4, 5)]:
        amp = 100 + mid % 900
        n_frames = text_len % 50 + 1
        got = by_media[mid]
        assert len(got) == n_frames * 5  # bins 0..4
        for (f, k), m in got.items():
            assert m == (amp * 8 if k == 4 else 0), (mid, f, k, m)


def test_wav_spectrogram_matches_numpy_on_arbitrary_signal(spark):
    import numpy as np

    from dbt_core_spark.operators.multimodal import encode_wav, wav_spectrogram

    rng = np.random.RandomState(6)
    sig = (rng.randn(64) * 1000).astype("<i2")
    df = spark.createDataFrame([(1, bytearray(encode_wav(sig)))],
                               "media_id long, data binary")
    got = {(r["frame"], r["bin"]): r["mag_round"]
           for r in wav_spectrogram(df, n_fft=16).collect()}
    exp = {}
    for f in range(4):
        mags = np.abs(np.fft.rfft(sig[f * 16:(f + 1) * 16].astype("f8")))
        for k, m in enumerate(mags):
            exp[(f, k)] = int(np.floor(m + 0.5))
    assert got == exp


def test_wav_spectrogram_skips_non_wav(spark):
    from dbt_core_spark.operators.multimodal import synth_media, wav_spectrogram

    docs = spark.createDataFrame([(1, "img")], ["doc_id", "text"])  # odd -> PPM
    assert wav_spectrogram(synth_media(docs)).count() == 0


def test_phash_media_matches_hand_computed_bits(spark):
    """aHash of a hand-built 2x2 P6: the 8x8 grid samples four 16-cell
    quadrant blocks; bit = 64*g > total, packed row-major into four
    16-bit bands."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import encode_ppm, phash_media

    px = np.zeros((2, 2, 3), dtype="u1")
    px[0, 0] = 10   # g=30  -> bit 0
    px[0, 1] = 200  # g=600 -> bit 1 (only value above the mean)
    px[1, 0] = 10
    px[1, 1] = 10
    df = spark.createDataFrame([(7, bytearray(encode_ppm(px)))],
                               "media_id long, data binary")
    row = phash_media(df).collect()[0]
    assert (row["width"], row["height"]) == (2, 2)
    # rows 0-3 x cols 4-7 are the only set bits: band0 rows 0-1
    # (offsets 4-7 and 12-15), band1 rows 2-3 (same), bands 2-3 empty
    want = 0b1111000011110000
    assert (row["h0"], row["h1"], row["h2"], row["h3"]) == (
        want, want, 0, 0)


def test_phash_media_brightness_shift_invariant(spark):
    """A constant brightness offset (no wrap) moves every pixel and the
    mean together — the aHash must be identical."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import encode_ppm, phash_media

    rng = np.random.RandomState(3)
    base = rng.randint(0, 200, size=(5, 9, 3)).astype("u1")
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(base))),
         (2, bytearray(encode_ppm(base + 50)))],
        "media_id long, data binary")
    rows = {r["media_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
            for r in phash_media(df).collect()}
    assert rows[1] == rows[2]


def test_phash_media_python_reference(spark):
    """Band values equal a pure-Python replica on arbitrary images,
    including non-divisible dims (nearest-neighbor floor sampling)."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import encode_ppm, phash_media

    rng = np.random.RandomState(11)
    imgs = {i: rng.randint(0, 256, size=(3 + i, 5 + 2 * i, 3)).astype("u1")
            for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(px))) for i, px in imgs.items()],
        "media_id long, data binary")
    got = {r["media_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
           for r in phash_media(df).collect()}
    for i, px in imgs.items():
        g = px.astype("i8").sum(axis=2)
        h, w = g.shape
        sy = (np.arange(8) * h) // 8
        sx = (np.arange(8) * w) // 8
        s = g[sy[:, None], sx[None, :]].ravel()
        bits = 64 * s > s.sum()
        want = tuple(
            int(sum(1 << j for j, v in enumerate(bits[k * 16:(k + 1) * 16])
                    if v)) for k in range(4))
        assert got[i] == want, i


def test_phash_media_non_image_and_malformed_null(spark):
    from dbt_core_spark.operators.multimodal import (
        phash_dup_pairs,
        phash_media,
        synth_media,
    )

    docs = spark.createDataFrame(
        [(2, "a wav doc"), (4, "another wav")], ["doc_id", "text"])
    hashes = phash_media(synth_media(docs))  # even ids -> WAVs
    rows = hashes.collect()
    assert len(rows) == 2 and all(r["h0"] is None for r in rows)
    assert phash_dup_pairs(hashes).count() == 0
    bad = spark.createDataFrame(
        [(1, bytearray(b"P6\n4 3\n255\nxx")),  # truncated
         (2, None)],
        "media_id long, data binary")
    assert all(r["h0"] is None for r in phash_media(bad).collect())


def test_phash_dup_pairs_blocking_and_hamming(spark):
    """Hand-built fingerprints: hamming 0 (clone), 1, 3 pairs survive;
    a hamming-4 pair is dropped by the threshold (it still shares no
    band here); max_hamming >= n_bands refuses (pigeonhole bound)."""
    import pytest

    from dbt_core_spark.operators.multimodal import phash_dup_pairs

    rows = [
        (1, 5, 5, 100, 200, 300, 400),
        (2, 5, 5, 100, 200, 300, 400),          # clone of 1 -> hamming 0
        (3, 5, 5, 100, 200, 300, 400 ^ 1),      # 1 bit off -> hamming 1
        (4, 5, 5, 100 ^ 3, 200 ^ 1, 300, 400),  # 3 bits across 2 bands
        (5, 5, 5, 100 ^ 1, 200 ^ 1, 300 ^ 1, 400 ^ 1),  # hamming 4
        (6, 5, 5, None, None, None, None),      # undecodable: excluded
    ]
    hashes = spark.createDataFrame(
        rows, "media_id long, width int, height int, "
              "h0 int, h1 int, h2 int, h3 int")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_dup_pairs(hashes, max_hamming=3).collect()}
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(1, 4)] == 3
    assert (1, 5) not in got  # hamming 4 > threshold
    assert all(6 not in p for p in got)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_dup_pairs(hashes, max_hamming=4)


# ---------------------------------------------------------------------------
# audio fingerprint dedup (r9): landmark peaks over integer frame energies
# ---------------------------------------------------------------------------

def test_audio_energy_frames_hand_computed(spark):
    """Exact int64 frame energies; trailing partial frame dropped;
    non-WAV payloads emit no rows."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        audio_energy_frames,
        encode_ppm,
        encode_wav,
    )

    samples = np.array([1, -2, 3, -4, 10, -10, 0, 7, 5], dtype="i2")
    wav = encode_wav(samples)
    ppm = encode_ppm(np.zeros((2, 2, 3), dtype="u1"))
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(ppm)), (3, None)],
        "media_id long, data binary")
    got = {(r["media_id"], r["frame"]): r["energy"]
           for r in audio_energy_frames(df, frame=4).collect()}
    # frames of 4: [1,2,3,4]=10, [10,10,0,7]=27; trailing [5] dropped
    assert got == {(1, 0): 10, (1, 1): 27}


def test_audio_fingerprint_peaks_and_fanout(spark):
    """Strict local maxima only (boundaries and plateaus excluded);
    each anchor fans out to the NEAREST <=fanout peaks within max_dt."""
    from dbt_core_spark.operators.multimodal import audio_fingerprint

    # energies: peaks at frames 2 (e=9), 5 (e=8), 7 (e=12); frame 9 is
    # a plateau edge (8,8) -> not strict; frame 0/10 are boundaries
    e = [5, 1, 9, 2, 3, 8, 1, 12, 8, 8, 6]
    fr = spark.createDataFrame(
        [(1, f, v) for f, v in enumerate(e)],
        "media_id long, frame int, energy long")
    fp = audio_fingerprint(fr, fanout=1, max_dt=16, quant=4)
    rows = {(r["f1"], r["f2"]): (r["eq1"], r["eq2"], r["dt"])
            for r in fp.collect()}
    # fanout=1: 2->5 and 5->7 only (nearest next peak each)
    assert rows == {(2, 5): (2, 2, 3), (5, 7): (2, 3, 2)}
    fp2 = audio_fingerprint(fr, fanout=2, max_dt=16, quant=4)
    assert {(r["f1"], r["f2"]) for r in fp2.collect()} == {
        (2, 5), (2, 7), (5, 7)}
    # max_dt excludes far targets
    fp3 = audio_fingerprint(fr, fanout=2, max_dt=2, quant=4)
    assert {(r["f1"], r["f2"]) for r in fp3.collect()} == {(5, 7)}


@_mark_slow
def test_audio_dup_pairs_clone_and_threshold(spark):
    """An exact clone matches on every distinct key; per-clip key dedup
    stops a repeating clip from inflating its own counts; min_matches
    gates the output."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        audio_dup_pairs,
        audio_energy_frames,
        audio_fingerprint,
        encode_wav,
    )

    rng = (np.arange(320) * 37 + 11) % 199 - 99
    wav = encode_wav(rng.astype("i2"))
    other = encode_wav(((np.arange(320) * 53 + 7) % 181 - 90).astype("i2"))
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(wav)), (3, bytearray(other))],
        "media_id long, data binary")
    fp = audio_fingerprint(audio_energy_frames(df))
    n_keys = (fp.filter("media_id = 1")
              .select("eq1", "eq2", "dt").distinct().count())
    assert n_keys >= 4
    got = {(r["id_a"], r["id_b"]): r["n_matches"]
           for r in audio_dup_pairs(fp, min_matches=4).collect()}
    assert got.get((1, 2)) == n_keys
    assert (1, 3) not in got and (2, 3) not in got
    # raising the threshold above the key count drops the pair
    assert audio_dup_pairs(fp, min_matches=n_keys + 1).count() == 0


@_mark_slow
def test_audio_fingerprint_short_clip_no_rows(spark):
    """A clip with <3 frames has no interior frame, hence no peak and
    no fingerprint — and the dup join survives an empty side."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        audio_dup_pairs,
        audio_energy_frames,
        audio_fingerprint,
        encode_wav,
    )

    wav = encode_wav(np.array([5] * 16, dtype="i2"))  # 2 frames of 8
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "media_id long, data binary")
    fp = audio_fingerprint(audio_energy_frames(df))
    assert fp.count() == 0
    assert audio_dup_pairs(fp).count() == 0


def test_synth_media_am_pattern_formula(spark):
    """pattern='am' WAV samples follow (id + 5i) % 201 - 100 exactly;
    PPM branch keeps the gradient fill."""
    from dbt_core_spark.operators.multimodal import (
        decode_ppm,
        synth_media,
        _wav_samples,
    )

    df = spark.createDataFrame(
        [(4, "x" * 10), (5, "y" * 3)], "doc_id long, text string")
    rows = {r["media_id"]: bytes(r["data"])
            for r in synth_media(df, pattern="am").collect()}
    pcm = _wav_samples(rows[4])
    assert len(pcm) == 8 * (10 % 50 + 1)
    assert all(int(pcm[i]) == (4 + 5 * i) % 201 - 100
               for i in range(len(pcm)))
    img = decode_ppm(rows[5])
    assert img is not None and img["width"] == 5 + 4  # 4 + 5%13


# ---------------------------------------------------------------------------
# video near-dup detection (r9): container walk + per-frame aHash
# ---------------------------------------------------------------------------

def test_video_frame_hashes_walk_and_malformed_tail(spark):
    """The container walk parses successive frames, keeps frames before
    a malformed tail, skips non-video payloads, and matches phash_media
    band values frame-for-frame (shared aHash core)."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        encode_ppm,
        phash_media,
        video_frame_hashes,
    )

    def frame(seed, w=6, h=5):
        xs = np.arange(w)[None, :] * 3
        ys = np.arange(h)[:, None] * 7
        plane = ((seed + xs + ys) % 256).astype("u1")
        return np.repeat(plane[:, :, None], 3, axis=2)

    f0, f1 = frame(10), frame(77)
    clip = encode_ppm(f0) + encode_ppm(f1)
    truncated = encode_ppm(f0) + encode_ppm(f1)[:-7]  # torn second frame
    df = spark.createDataFrame([
        (1, bytearray(clip)),
        (2, bytearray(truncated)),
        (3, bytearray(b"not a clip")),
        (4, None),
    ], "media_id long, data binary")
    got = {(r["media_id"], r["frame_idx"]): (r["h0"], r["h1"], r["h2"], r["h3"])
           for r in video_frame_hashes(df).collect()}
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    stills = spark.createDataFrame(
        [(10, bytearray(encode_ppm(f0))), (77, bytearray(encode_ppm(f1)))],
        "media_id long, data binary")
    ph = {r["media_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
          for r in phash_media(stills).collect()}
    assert got[(1, 0)] == ph[10] and got[(1, 1)] == ph[77]
    assert got[(2, 0)] == ph[10]


def test_video_dup_pairs_alignment_and_threshold(spark):
    """Exact clone matches on every frame; a clip sharing frames at
    DIFFERENT positions does not match (temporal alignment); a
    brightness-shifted clone still matches (aHash invariance);
    min_frames gates the output."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        encode_ppm,
        video_dup_pairs,
        video_frame_hashes,
    )

    def frame(seed, shift=0, w=9, h=7):
        xs = np.arange(w)[None, :] * 5
        ys = np.arange(h)[:, None] * 11
        plane = (((seed + xs + ys) % 128) + shift).astype("u1")
        return np.repeat(plane[:, :, None], 3, axis=2)

    a = b"".join(encode_ppm(frame(s)) for s in (1, 50, 99))
    shifted = b"".join(encode_ppm(frame(s, shift=40)) for s in (1, 50, 99))
    rotated = b"".join(encode_ppm(frame(s)) for s in (99, 1, 50))
    df = spark.createDataFrame([
        (1, bytearray(a)), (2, bytearray(a)),          # exact clone
        (3, bytearray(shifted)),                        # +40 every pixel
        (4, bytearray(rotated)),                        # misaligned frames
    ], "media_id long, data binary")
    fh = video_frame_hashes(df).localCheckpoint(eager=False)
    got = {(r["id_a"], r["id_b"]): r["n_frames_matched"]
           for r in video_dup_pairs(fh, min_frames=2).collect()}
    assert got[(1, 2)] == 3
    assert got[(1, 3)] == 3 and got[(2, 3)] == 3   # brightness-invariant
    assert (1, 4) not in got and (2, 4) not in got  # alignment enforced
    assert video_dup_pairs(fh, min_frames=4).count() == 0


def test_synth_video_formula_pin(spark):
    """synth_video frames follow (id + 3x + 7y + 11f) % 256 with
    2 + id%7 frames of the image-formula dimensions."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        decode_ppm,
        synth_video,
        _ppm_header,
    )

    df = spark.createDataFrame([(9, "x")], "doc_id long, text string")
    payload = bytes(synth_video(df).collect()[0]["data"])
    w, h, nf = 4 + 9 % 13, 3 + 9 % 7, 2 + 9 % 7
    pos = 0
    for f in range(nf):
        hdr = _ppm_header(payload[pos:])
        assert hdr is not None
        fw, fh_, _mx, off = hdr
        assert (fw, fh_) == (w, h)
        img = decode_ppm(payload[pos:pos + off + fw * fh_ * 3])
        assert img is not None
        px = np.frombuffer(payload, dtype="u1",
                           count=fw * fh_ * 3,
                           offset=pos + off).reshape(fh_, fw, 3)
        for y in range(fh_):
            for x in range(fw):
                assert px[y, x, 0] == (9 + 3 * x + 7 * y + 11 * f) % 256
        pos += off + fw * fh_ * 3
    assert pos == len(payload)


def test_video_dup_pairs_aligned_trim_shift_truncate(spark):
    """The alignment leg (r9 verdict item 3): a one-frame-trimmed
    clone matches its source at offset -1 across all shared frames; a
    two-frame shift matches at offset -2; a TRUNCATED container
    (malformed tail) keeps its intact frames and still aligns; the
    position-exact operator sees none of these; min_frames still
    gates; best-offset ties break (count desc, offset asc)."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        encode_ppm,
        video_dup_pairs,
        video_dup_pairs_aligned,
        video_frame_hashes,
    )

    def frame(seed, w=9, h=7):
        # wrap-heavy pattern: distinct seeds give distinct aHashes
        xs = np.arange(w)[None, :] * 37
        ys = np.arange(h)[:, None] * 53
        plane = ((seed * 71 + xs + ys) % 256).astype("u1")
        return np.repeat(plane[:, :, None], 3, axis=2)

    seeds = (1, 2, 3, 4, 5)
    src = b"".join(encode_ppm(frame(s)) for s in seeds)
    trim1 = b"".join(encode_ppm(frame(s)) for s in seeds[1:])
    shift2 = b"".join(encode_ppm(frame(s)) for s in seeds[2:])
    # truncated: 3 intact frames then a torn header
    trunc = b"".join(encode_ppm(frame(s)) for s in seeds[1:4]) + b"P6 9"
    df = spark.createDataFrame([
        (1, bytearray(src)),
        (2, bytearray(trim1)),
        (3, bytearray(shift2)),
        (4, bytearray(trunc)),
    ], "media_id long, data binary")
    fh = video_frame_hashes(df).localCheckpoint(eager=False)
    got = {(r["id_a"], r["id_b"]): (r["offset"], r["n_frames_matched"])
           for r in video_dup_pairs_aligned(fh, min_frames=2).collect()}
    assert got[(1, 2)] == (-1, 4)   # trimmed by one frame
    assert got[(1, 3)] == (-2, 3)   # shifted by two
    assert got[(2, 3)] == (-1, 3)
    assert got[(1, 4)] == (-1, 3)   # truncated tail: intact frames align
    assert got[(2, 4)] == (0, 3)
    # position-exact operator is blind to every non-zero offset
    exact = {(r["id_a"], r["id_b"])
             for r in video_dup_pairs(fh, min_frames=2).collect()}
    assert (1, 2) not in exact and (1, 3) not in exact
    assert (2, 4) in exact          # offset-0 pair still found
    # min_frames gates the aligned output too
    assert video_dup_pairs_aligned(fh, min_frames=5).count() == 0


@_mark_slow
def test_video_dup_pairs_aligned_interleaved_and_cap(spark):
    """Interleaved containers (a foreign frame spliced mid-clip) still
    align on the consistent-offset majority; max_ids_per_hash drops a
    title-card frame shared by every clip BEFORE the pair join, so
    common frames alone can no longer vouch for a pair."""
    import numpy as np

    from dbt_core_spark.operators.multimodal import (
        encode_ppm,
        video_dup_pairs_aligned,
        video_frame_hashes,
    )

    def frame(seed, w=9, h=7):
        xs = np.arange(w)[None, :] * 37
        ys = np.arange(h)[:, None] * 53
        plane = ((seed * 71 + xs + ys) % 256).astype("u1")
        return np.repeat(plane[:, :, None], 3, axis=2)

    title = encode_ppm(frame(0))
    a = b"".join([encode_ppm(frame(s)) for s in (1, 2, 3, 4)])
    # interleaved: same frames with a foreign splice after frame 2
    inter = b"".join([encode_ppm(frame(1)), encode_ppm(frame(2)),
                      encode_ppm(frame(99)), encode_ppm(frame(3)),
                      encode_ppm(frame(4))])
    # unrelated clips sharing ONLY the title card
    c = title + b"".join(encode_ppm(frame(s)) for s in (11, 12))
    d = title + b"".join(encode_ppm(frame(s)) for s in (21, 22))
    e = title + b"".join(encode_ppm(frame(s)) for s in (31, 32))
    df = spark.createDataFrame([
        (1, bytearray(a)), (2, bytearray(inter)),
        (3, bytearray(c)), (4, bytearray(d)), (5, bytearray(e)),
    ], "media_id long, data binary")
    fh = video_frame_hashes(df).localCheckpoint(eager=False)
    got = {(r["id_a"], r["id_b"]): (r["offset"], r["n_frames_matched"])
           for r in video_dup_pairs_aligned(fh, min_frames=2).collect()}
    # prefix aligns at 0 (2 frames), suffix at +1 (2 frames): the
    # window keeps count-tied offsets at the SMALLER offset
    assert got[(1, 2)] == (0, 2)
    # title-card-only pairs never reach min_frames=2 at one offset
    assert (3, 4) not in got and (3, 5) not in got and (4, 5) not in got
    # with the cap, the title hash is dropped pre-join entirely
    capped = video_dup_pairs_aligned(fh, min_frames=1, max_ids_per_hash=2)
    capped_pairs = {(r["id_a"], r["id_b"])
                    for r in capped.collect()}
    assert (3, 4) not in capped_pairs and (4, 5) not in capped_pairs
    uncapped = {(r["id_a"], r["id_b"])
                for r in video_dup_pairs_aligned(fh, min_frames=1).collect()}
    assert (3, 4) in uncapped  # the title card alone vouched pre-cap


def test_synth_video_frame_offset_trims_prefix(spark):
    """synth_video(frame_offset=k) yields the source's frames k..nf-1
    at re-based container positions — byte-identical to slicing the
    full clip's payload."""
    from dbt_core_spark.operators.multimodal import (
        _ppm_header,
        synth_video,
    )

    df = spark.createDataFrame([(9, "x")], "doc_id long, text string")
    full = bytes(synth_video(df).collect()[0]["data"])
    trimmed = bytes(synth_video(df, frame_offset=1).collect()[0]["data"])
    hdr = _ppm_header(full)
    w, h, _mx, off = hdr
    frame_bytes = off + w * h * 3
    assert trimmed == full[frame_bytes:]
    # trimming everything yields an empty payload
    empty = bytes(synth_video(df, frame_offset=9).collect()[0]["data"])
    assert empty == b""
