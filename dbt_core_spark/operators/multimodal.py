"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Engine extension (driver north star).  Two dependency-free REAL decode
kernels run end-to-end here — ``decode_wav`` (RIFF/PCM16: struct-parsed
chunks, numpy sample decode → duration/peak/RMS) and ``decode_ppm``
(binary P6/P5 netpbm: header parse, numpy pixel decode → width/height/
mean brightness).  Containers with PIL/ffmpeg would slot richer codecs
into the same ``extract_features`` kernel; payloads whose magic bytes
match no known codec fall back to byte-level stats (``len % 97``), so
arbitrary blobs still flow through.

Scale notes: binary payloads dominate partition size — repartition so
``rows_per_partition × avg_payload ≤ spark.sql.files.maxPartitionBytes``;
never collect; metadata-only predicates (width/duration/mime) are plain
columns so Catalyst prunes before any Python runs.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.LongType(), True),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Demo constructor: wrap a text column as a binary payload with fake
    metadata — stands in for `spark.read.format("binaryFile")` on real
    media lakes."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> int | None:
    """STUB decode kernel — deterministic fake feature (payload length
    mod 97).  A real deployment replaces this with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + a feature extractor;
    everything around it (batching, schema, partitioning) is unchanged.
    NULL payload → NULL feature (the NULL-in/NULL-out family contract —
    r6 doc-gate fuzz finding: the old ``-1`` sentinel diverged from the
    SQL oracle's ``octet_length(NULL) IS NULL``)."""
    if payload is None:
        return None
    return len(payload) % 97


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The mapInPandas iterator form keeps peak memory to one Arrow batch
    per task regardless of partition size — required when payloads are
    MBs each."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"]
            # nullable Int64: a NULL payload yields NULL stats (not 0/-1
            # sentinels), and the Arrow path needs a nullable integer
            # dtype — plain int64 would silently float-ify the Nones
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": data.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "feature": data.map(_decode_image_stub).astype("Int64"),
                }
            )

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands each media row into frame
    timestamps (decode itself stubbed).  Real decoder would emit one
    binary frame per row here."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    duration = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), duration, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


# --------------------------------------------------------------------------
# real decode kernels (dependency-free)
# --------------------------------------------------------------------------

def encode_wav(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Serialize int16 mono PCM samples into a canonical RIFF/WAVE file."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def decode_wav(payload: bytes) -> Optional[dict]:
    """Parse a RIFF/WAVE payload: walk the chunk list for ``fmt `` and
    ``data``, decode PCM16 samples with numpy, return audio features.
    Returns None when the payload is not a WAV."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, sr, channels, bits, data = 12, None, 1, 16, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated fmt chunk: malformed, not WAV
                return None
            _fmt, channels, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None or bits != 16:
        return None
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // max(channels, 1)
    return {
        "kind": "wav",
        "sample_rate": int(sr),
        "n_samples": int(n),
        "duration_ms": int(n * 1000 // sr) if sr else 0,
        "peak": int(np.abs(samples).max()) if len(samples) else 0,
        "rms": float(np.sqrt(np.mean(samples.astype("f8") ** 2))) if len(samples) else 0.0,
    }


def encode_ppm(pixels: "np.ndarray") -> bytes:
    """Serialize an (h, w, 3) uint8 array as a binary P6 netpbm image."""
    h, w = pixels.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + np.asarray(pixels, dtype="u1").tobytes()


def _ppm_header(
    payload: bytes, start: int = 0
) -> Optional[tuple[int, int, int, int]]:
    """Parse a netpbm P6/P5 header at byte offset ``start``:
    whitespace-separated magic, width, height, maxval tokens ('#'
    comments skipped), then a single whitespace byte.  Returns
    (w, h, maxval, pixel_offset) with pixel_offset RELATIVE to
    ``start``, or None.  The offset form exists for the container
    walk in video_frame_hashes: parsing each frame header in place
    keeps the walk linear in payload bytes instead of copying the
    remaining tail per frame (r9 ADVICE)."""
    if payload is None or payload[start:start + 2] not in (b"P6", b"P5"):
        return None
    tokens, pos = [], start + 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            tok = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(payload[tok:pos])
    pos += 1  # the single whitespace after maxval
    try:
        return int(tokens[0]), int(tokens[1]), int(tokens[2]), pos - start
    except (ValueError, IndexError):
        return None


def decode_ppm(payload: bytes) -> Optional[dict]:
    """Parse a binary netpbm payload (P6 RGB / P5 gray): whitespace-token
    header then a numpy pixel decode.  Returns None when not netpbm."""
    hdr = _ppm_header(payload)
    if hdr is None:
        return None
    w, h, maxval, pos = hdr
    ch = 3 if payload[:2] == b"P6" else 1
    need = w * h * ch
    # pre-check the available byte count: frombuffer(count=need) raises
    # ValueError when the header over-declares the payload size
    if w <= 0 or h <= 0 or maxval != 255 or len(payload) - pos < need:
        return None
    px = np.frombuffer(payload, dtype="u1", count=need, offset=pos)
    return {
        "kind": "ppm",
        "width": int(w),
        "height": int(h),
        "channels": ch,
        "mean_value": float(px.astype("f8").mean()) if len(px) else 0.0,
    }


DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("peak", T.LongType(), True),
    T.StructField("mean_value", T.DoubleType(), True),
])


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: dispatch on magic bytes (RIFF→WAV,
    P6/P5→netpbm, else byte stats).  One Arrow batch resident per task;
    same kernel shape a PIL/ffmpeg deployment uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["data"]):
                payload = bytes(payload) if payload is not None else None
                base = {
                    "media_id": int(mid), "kind": "raw",
                    "n_bytes": len(payload) if payload is not None else 0,
                    "width": None, "height": None, "sample_rate": None,
                    "n_samples": None, "duration_ms": None, "peak": None,
                    "mean_value": None,
                }
                # a malformed payload must degrade to byte stats, never
                # crash the job (module contract)
                try:
                    wav = decode_wav(payload)
                except Exception:
                    wav = None
                if wav is not None:
                    base.update(kind="wav", sample_rate=wav["sample_rate"],
                                n_samples=wav["n_samples"],
                                duration_ms=wav["duration_ms"],
                                peak=wav["peak"], mean_value=wav["rms"])
                else:
                    try:
                        ppm = decode_ppm(payload)
                    except Exception:
                        ppm = None
                    if ppm is not None:
                        base.update(kind="ppm", width=ppm["width"],
                                    height=ppm["height"],
                                    mean_value=ppm["mean_value"])
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=DECODED_SCHEMA)


def synth_media(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", pattern: str = "const") -> DataFrame:
    """Deterministic WAV/PPM payload synthesis — even ids become square-
    wave WAVs (amplitude 100+id%900, n = 8·(len(text)%50+1) samples),
    odd ids become PPMs ((4+id%13)×(3+id%7)): ``pattern='const'`` fills
    value id%256; ``pattern='gradient'`` fills pixel (y, x) with
    (id + 3x + 7y) % 256 across all channels — spatially varying, so
    geometric ops (resize/crop) have analytically predictable outputs.
    Features after decode are predictable either way, so the REAL codec
    path is oracle-checkable in SQL.

    TOTAL function contract: NULL text synthesizes as EMPTY text
    (``len(text or "")``) — every document gets a payload.  This
    differs deliberately from ``attach_media``, which wraps an existing
    column and so propagates NULL payloads to NULL features.

    ``pattern='am'`` keeps the gradient PPM fill but replaces the WAV
    square wave with an amplitude-varying pseudo-tone,
    ``sample[i] = ((id + 5·i) mod 201) − 100`` — frame energies then
    differ frame to frame (period 201 is coprime to every power-of-two
    frame), which is what gives ``audio_fingerprint`` a non-degenerate
    peak landscape while staying integer-exact and SQL-replayable."""
    if pattern not in ("const", "gradient", "am"):
        raise ValueError("pattern must be 'const', 'gradient' or 'am'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                if mid % 2 == 0:
                    n = 8 * (len(text or "") % 50 + 1)
                    if pattern == "am":
                        samples = (mid + 5 * np.arange(n)) % 201 - 100
                    else:
                        amp = 100 + mid % 900
                        samples = np.where(
                            np.arange(n) % 2 == 0, amp, -amp)
                    payload = encode_wav(samples, sample_rate=8000)
                else:
                    w, h = 4 + mid % 13, 3 + mid % 7
                    if pattern in ("gradient", "am"):
                        xs = np.arange(w)[None, :] * 3
                        ys = np.arange(h)[:, None] * 7
                        plane = ((mid + xs + ys) % 256).astype("u1")
                        px = np.repeat(plane[:, :, None], 3, axis=2)
                    else:
                        px = np.full((h, w, 3), mid % 256, dtype="u1")
                    payload = encode_ppm(px)
                out.append((mid, payload))
            yield pd.DataFrame(out, columns=["media_id", "data"])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col))
    ).mapInPandas(run, schema="media_id long, data binary")


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("src_width", T.IntegerType(), True),
    T.StructField("src_height", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sum_value", T.LongType(), True),
    T.StructField("mean_value", T.DoubleType(), True),
    T.StructField("data", T.BinaryType(), True),
])


def resize_media(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 6,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Nearest-neighbor image resize over binary netpbm payloads — the
    geometric half of the multimodal pipeline (decode → index-sample →
    re-encode + stats), Arrow-batched ``mapInPandas`` like the decoders.

    Source pixel for target (ty, tx) is (ty·h÷out_h, tx·w÷out_w)
    (floor) — pure integer index math, so outputs are exactly
    reproducible (and, for synthetic gradient media, analytically
    predictable in SQL).  Emits the re-encoded P6 payload plus integer
    pixel-sum / mean stats.  Non-image payloads (or malformed headers)
    pass through with NULL dims — same fallback contract as
    ``decode_media``.  Linear in pixels, embarrassingly parallel; the
    binary column never shuffles (project-only plan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                mid = int(mid)
                b = bytes(payload) if payload is not None else None
                hdr = _ppm_header(b) if b else None
                if hdr is None or hdr[2] != 255:
                    rows.append((mid, None, None, None, None, None, None,
                                 b))
                    continue
                w, h, _maxval, pos = hdr
                ch = 3 if b[:2] == b"P6" else 1
                need = w * h * ch
                if w <= 0 or h <= 0 or len(b) - pos < need:
                    rows.append((mid, None, None, None, None, None, None,
                                 b))
                    continue
                px = np.frombuffer(b, dtype="u1", count=need,
                                   offset=pos).reshape(h, w, ch)
                sy = (np.arange(out_h) * h) // out_h
                sx = (np.arange(out_w) * w) // out_w
                res = px[sy[:, None], sx[None, :], :]
                if ch == 1:
                    res = np.repeat(res, 3, axis=2)
                total = int(res.astype("i8").sum())
                rows.append((
                    mid, int(w), int(h), int(out_w), int(out_h),
                    total, total / (out_w * out_h * 3),
                    encode_ppm(res),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "src_width", "src_height", "width", "height",
                "sum_value", "mean_value", "data"])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=RESIZED_SCHEMA)


PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("h0", T.IntegerType(), True),
    T.StructField("h1", T.IntegerType(), True),
    T.StructField("h2", T.IntegerType(), True),
    T.StructField("h3", T.IntegerType(), True),
])


def phash_media(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "media_id",
    grid: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Perceptual image hash (average hash / aHash) over binary netpbm
    payloads — the fingerprint half of multimodal near-duplicate
    detection, INTEGER-EXACT by construction (no DCT, no float mean):

    - grayscale = per-pixel CHANNEL SUM (3·v for P5 gray), never a
      division;
    - nearest-neighbor sample onto a grid×grid raster with the
      resize_media index convention (sy = ty·h÷grid floor);
    - bit(p) = [grid²·g(p) > Σ g]  (the mean comparison cleared of its
      division; strict >, ties → 0);
    - the grid² bits pack row-major into ``n_bands`` unsigned band
      integers of grid²/n_bands bits each (h0..h3 at the 8×8/4
      default) — the banded-key layout Hamming blocking joins on
      (the SimHash blocking idea, dedup.py:simhash_pairs, re-keyed
      for image rasters).

    aHash is shift-brightness invariant (a constant offset moves every
    pixel AND the mean) and resolution invariant under the fixed-grid
    resample — the standard cheap near-dup fingerprint (pHash family,
    public imagehash semantics).  Non-image / malformed payloads emit
    NULL dims + NULL bands (the decode_media fallback contract) and
    are excluded by ``phash_dup_pairs``.

    Scale shape: one Arrow pass, project-only plan (the binary column
    never shuffles); output is id + 6 small ints per image."""
    if grid * grid % n_bands != 0:
        raise ValueError(f"grid²={grid * grid} not divisible by "
                         f"n_bands={n_bands}")
    per = grid * grid // n_bands
    if per > 31:
        raise ValueError(
            f"band width {per} bits exceeds 31 (int32 band values); "
            f"raise n_bands")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                mid = int(mid)
                b = bytes(payload) if payload is not None else None
                hdr = _ppm_header(b) if b else None
                bad = (mid, None, None, None, None, None, None)
                if hdr is None or hdr[2] != 255:
                    rows.append(bad)
                    continue
                w, h, _maxval, pos = hdr
                ch = 3 if b[:2] == b"P6" else 1
                need = w * h * ch
                if w <= 0 or h <= 0 or len(b) - pos < need:
                    rows.append(bad)
                    continue
                px = np.frombuffer(b, dtype="u1", count=need,
                                   offset=pos).reshape(h, w, ch)
                g = px.astype("i8").sum(axis=2)
                if ch == 1:
                    g = g * 3  # same scale as RGB channel sums
                rows.append((mid, int(w), int(h),
                             *_ahash_bands(g, grid=grid, n_bands=n_bands)))
            yield pd.DataFrame(rows, columns=[
                f.name for f in PHASH_SCHEMA])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=PHASH_SCHEMA)


def phash_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs from ``phash_media`` fingerprints via
    band-blocked Hamming join — the multimodal counterpart of the
    text tier's SimHash blocking (dedup.py:simhash_pairs), and the
    missing dedup verb of the multimodal tier.

    Candidate pairs share at least one EQUAL band; by pigeonhole any
    pair within Hamming distance < n_bands (= 4 in the phash_media
    schema) differs in at most max_hamming < 4 bands and therefore
    shares one — the blocking is LOSSLESS for ``max_hamming <= 3`` and
    the operator refuses larger thresholds rather than silently
    dropping pairs.  Exact Hamming distance confirms candidates:
    Σ bit_count(h_k XOR h_k'), all integer.

    Scale shape: one posexplode (4 rows/image) + one equi-join on the
    (band, value) key — NEVER all-pairs; candidates are bounded by
    Σ bucket² over 16-bit-key buckets.  At web scale (10⁹+ images) a
    16-bit band saturates — widen ``grid`` (16×16 → 32-bit bands,
    n_bands=8 int32 keys) so bucket sizes stay bounded; the pigeonhole
    guarantee then covers max_hamming <= 7.  Returns
    (id_a, id_b, hamming), id_a < id_b."""
    n_bands = 4
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= n_bands={n_bands}: band "
            "blocking would drop pairs (pigeonhole bound); rehash with "
            "a finer grid / more bands for larger radii")
    valid = hashes.filter(F.col("h0").isNotNull()).select(
        F.col(id_col).alias("_id"), "h0", "h1", "h2", "h3")
    bands = valid.select(
        "_id", "h0", "h1", "h2", "h3",
        F.posexplode(F.array("h0", "h1", "h2", "h3")).alias("band", "bv"),
    )
    a = bands.select(*[F.col(c).alias(f"{c}_a") for c in
                       ("_id", "h0", "h1", "h2", "h3")], "band", "bv")
    b = bands.select(*[F.col(c).alias(f"{c}_b") for c in
                       ("_id", "h0", "h1", "h2", "h3")], "band", "bv")
    hamming = sum(
        F.bit_count(F.col(f"h{k}_a").bitwiseXOR(F.col(f"h{k}_b")))
        for k in range(n_bands)
    ).cast("int")
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select(F.col("_id_a").alias("id_a"),
                F.col("_id_b").alias("id_b"),
                hamming.alias("hamming"))
        .distinct()  # a pair sharing k bands appears k times
        .filter(F.col("hamming") <= max_hamming)
    )


def _wav_samples(payload: bytes) -> Optional["np.ndarray"]:
    """PCM16 samples of a RIFF/WAVE payload via the same chunk walk as
    decode_wav (mono 16-bit only), or None when not a valid WAV."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, bits, data = 12, 16, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            bits = struct.unpack("<HHIIHH", body[:16])[5]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if data is None or bits != 16:
        return None
    return np.frombuffer(data, dtype="<i2")


SPECTRO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame", T.IntegerType(), False),
    T.StructField("bin", T.IntegerType(), False),
    T.StructField("mag_round", T.LongType(), False),
])


def wav_spectrogram(
    df: DataFrame,
    n_fft: int = 8,
    hop: int | None = None,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL audio feature extraction: magnitude spectrogram of PCM16 WAV
    payloads via numpy rfft — frame the samples (``hop`` defaults to
    ``n_fft``, non-overlapping), FFT each frame, emit one row per
    (frame, bin) with the magnitude rounded to the nearest integer.

    Arrow mapInPandas like the codec kernels; non-WAV payloads emit no
    rows.  Linear in samples, embarrassingly parallel, output bounded
    by frames·(n_fft/2+1) rows per clip.  Rounding makes the output
    robust to FFT float noise (~1e-12 relative), which is what lets the
    synthetic square-wave corpus — whose spectrum is analytically a
    single Nyquist-bin line of height amplitude·n_fft — be
    oracle-checked exactly."""
    hop = hop or n_fft

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                b = bytes(payload) if payload is not None else None
                pcm = _wav_samples(b) if b else None
                if pcm is None:
                    continue
                samples = pcm.astype("f8")
                nfr = max(0, (len(samples) - n_fft) // hop + 1)
                for f in range(nfr):
                    frame = samples[f * hop:f * hop + n_fft]
                    mags = np.abs(np.fft.rfft(frame))
                    for k, mag in enumerate(mags):
                        out.append((int(mid), f, k,
                                    int(np.floor(mag + 0.5))))
            yield pd.DataFrame(
                out, columns=["media_id", "frame", "bin", "mag_round"])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=SPECTRO_SCHEMA)


AUDIO_ENERGY_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame", T.IntegerType(), False),
    T.StructField("energy", T.LongType(), False),
])


def audio_energy_frames(
    df: DataFrame,
    frame: int = 8,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-frame PCM energy of WAV payloads — the decode boundary of
    audio fingerprinting: one Arrow pass over the binary column emits
    (media_id, frame, energy) with ``energy = Σ |sample|`` over each
    non-overlapping ``frame``-sample window (trailing partial frames
    dropped, the wav_spectrogram framing convention).

    INTEGER-EXACT: PCM16 samples are int16, |x| sums are int64 — no
    FFT, no floats — so the frame-energy table replays bit-for-bit in
    SQL from a synthetic-formula corpus.  Non-WAV / malformed payloads
    emit no rows (the spectrogram contract).

    Scale shape: linear in samples, embarrassingly parallel,
    project-only plan (the binary column never shuffles); output is
    n_frames rows per clip, ~samples/frame compression before anything
    JVM-side runs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                b = bytes(payload) if payload is not None else None
                pcm = _wav_samples(b) if b else None
                if pcm is None:
                    continue
                a = np.abs(pcm.astype("i8"))
                nfr = len(a) // frame
                if nfr == 0:
                    continue
                e = a[:nfr * frame].reshape(nfr, frame).sum(axis=1)
                out.extend(
                    (int(mid), f, int(v)) for f, v in enumerate(e))
            yield pd.DataFrame(
                out, columns=["media_id", "frame", "energy"])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(
        run, schema=AUDIO_ENERGY_SCHEMA)


def audio_fingerprint(
    energies: DataFrame,
    fanout: int = 3,
    max_dt: int = 16,
    quant: int = 64,
    id_col: str = "media_id",
) -> DataFrame:
    """Landmark fingerprints from ``audio_energy_frames`` output — the
    constellation idea of Wang 2003 (the public Shazam paper), reduced
    to integer energy peaks so two engines agree bit-for-bit:

    - PEAKS are frames whose energy strictly exceeds both neighbors
      (lag/lead over the per-clip frame order; boundary frames never
      peak — NULL neighbor fails the strict >);
    - each peak anchors up to ``fanout`` landmark pairs with the next
      peaks at frame distance 1..``max_dt`` (nearest first);
    - the landmark KEY is (energy_a ÷ quant, energy_b ÷ quant, dt) —
      integer-floor energy buckets make the key robust to small
      amplitude jitter while staying exact.

    Returns (media_id, f1, f2, eq1, eq2, dt) — one row per landmark.
    All JVM window/join expressions: two per-clip windows + one
    dt-bucket-blocked self-join.  The pair join keys on
    (clip, frame ÷ max_dt bucket) with each anchor probing its own and
    the next bucket — a target within dt ≤ max_dt of its anchor is in
    one of the two by construction, so blocking is LOSSLESS while the
    join meets only peaks within ~2·max_dt frames of each other
    (without it a P-peak clip builds P² intermediate rows before the
    dt filter — hour-long clips made that frames²-scale)."""
    w = Window.partitionBy(id_col).orderBy("frame")
    peaks = (
        energies.select(
            id_col, "frame", "energy",
            F.lag("energy").over(w).alias("_pe"),
            F.lead("energy").over(w).alias("_ne"),
        )
        .filter((F.col("energy") > F.col("_pe"))
                & (F.col("energy") > F.col("_ne")))
        .select(id_col, "frame", "energy")
    )
    a = peaks.select(
        F.col(id_col), F.col("frame").alias("f1"),
        F.col("energy").alias("e1"),
        F.explode(F.array(
            (F.col("frame") / max_dt).cast("bigint"),
            (F.col("frame") / max_dt).cast("bigint") + 1,
        )).alias("_blk"),
    )
    b = peaks.select(
        F.col(id_col), F.col("frame").alias("f2"),
        F.col("energy").alias("e2"),
        (F.col("frame") / max_dt).cast("bigint").alias("_blk"),
    )
    wf = Window.partitionBy(id_col, "f1").orderBy("f2")
    return (
        a.join(b, [id_col, "_blk"])
        .filter((F.col("f2") > F.col("f1"))
                & (F.col("f2") - F.col("f1") <= max_dt))
        .withColumn("_r", F.row_number().over(wf))
        .filter(F.col("_r") <= fanout)
        .select(
            id_col, "f1", "f2",
            (F.col("e1") / quant).cast("bigint").alias("eq1"),
            (F.col("e2") / quant).cast("bigint").alias("eq2"),
            (F.col("f2") - F.col("f1")).cast("int").alias("dt"),
        )
    )


def audio_dup_pairs(
    fingerprints: DataFrame,
    min_matches: int = 4,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate audio pairs: clips sharing ≥ ``min_matches``
    DISTINCT landmark keys (eq1, eq2, dt) — the audio counterpart of
    phash_dup_pairs, closing multimodal dedup across both media types.

    Scale shape: per-clip key dedup first (so a looping clip cannot
    inflate its own match counts), then ONE equi-join on the landmark
    key — blocked, never all-pairs; candidates are bounded by
    Σ bucket² over key buckets, and the (doc, doc) aggregate touches
    only candidate pairs.  Returns (id_a, id_b, n_matches),
    id_a < id_b."""
    keys = fingerprints.select(id_col, "eq1", "eq2", "dt").distinct()
    a = keys.select(F.col(id_col).alias("id_a"), "eq1", "eq2", "dt")
    b = keys.select(F.col(id_col).alias("id_b"), "eq1", "eq2", "dt")
    return (
        a.join(b, ["eq1", "eq2", "dt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
    )


def _ahash_bands(g: "np.ndarray", grid: int = 8,
                 n_bands: int = 4) -> list[int]:
    """The integer aHash core shared by ``phash_media`` (still images)
    and ``video_frame_hashes`` (per frame): nearest-neighbor sample
    the channel-sum grayscale plane onto a grid×grid raster, bit =
    [grid²·g > Σ g] (division-free mean compare, ties → 0), pack
    row-major into ``n_bands`` band ints."""
    h, w = g.shape
    per = grid * grid // n_bands
    sy = (np.arange(grid) * h) // grid
    sx = (np.arange(grid) * w) // grid
    s = g[sy[:, None], sx[None, :]].ravel()
    total = int(s.sum())
    bits = (grid * grid) * s > total
    return [int(sum(1 << i for i, v in enumerate(bits[k * per:(k + 1) * per])
                    if v)) for k in range(n_bands)]


def synth_video(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                frame_offset: int = 0) -> DataFrame:
    """Deterministic VIDEO payload synthesis — the third media type of
    the synthetic corpus: a clip is ``2 + id % 7`` concatenated binary
    P6 frames of (4 + id%13)×(3 + id%7) pixels, frame ``f`` filled
    with the time-shifted gradient ``(id + 3x + 7y + 11f) % 256``
    across all channels — spatially AND temporally varying, so
    frame-level features are analytically predictable and the REAL
    container-walk decode path is oracle-checkable in SQL.  Every
    document gets a payload (NULL text irrelevant — frames derive
    from the id alone).

    ``frame_offset`` drops the first N frames (content frames
    ``frame_offset .. nf-1``, container positions re-based to 0) — a
    deterministic TRIMMED clip for exercising temporal-offset
    alignment (video_dup_pairs_aligned): the trimmed clone's frame at
    container position p has the content of the source's frame
    p + frame_offset."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 13, 3 + mid % 7
                frames = []
                for f in range(frame_offset, 2 + mid % 7):
                    xs = np.arange(w)[None, :] * 3
                    ys = np.arange(h)[:, None] * 7
                    plane = ((mid + xs + ys + 11 * f) % 256).astype("u1")
                    frames.append(encode_ppm(
                        np.repeat(plane[:, :, None], 3, axis=2)))
                out.append((mid, b"".join(frames)))
            yield pd.DataFrame(out, columns=["media_id", "data"])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(
        df.select(F.col(id_col))
    ).mapInPandas(run, schema="media_id long, data binary")


VIDEO_HASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("h0", T.IntegerType(), True),
    T.StructField("h1", T.IntegerType(), True),
    T.StructField("h2", T.IntegerType(), True),
    T.StructField("h3", T.IntegerType(), True),
])


def video_frame_hashes(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "media_id",
    grid: int = 8,
    max_frames: int = 10_000,
) -> DataFrame:
    """Walk a concatenated-netpbm video container and aHash every
    frame — the decode boundary of video near-duplicate detection:
    one Arrow pass parses successive P6/P5 headers out of the binary
    payload and emits (media_id, frame_idx, w, h, h0..h3) per frame
    (the phash_media band layout, so all downstream blocking
    machinery is shared).

    A malformed tail (header parse failure or truncated pixel data)
    stops the walk — frames before it are kept, the rest of the
    payload is skipped (the decode_media fallback posture applied
    mid-container); non-video/NULL payloads emit no rows.
    ``max_frames`` bounds the walk against a pathological
    header-bomb payload.

    Scale shape: linear in payload bytes, project-only plan — the
    binary column never reaches an exchange; what leaves the kernel
    is 6 small ints per frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                mid = int(mid)
                b = bytes(payload) if payload is not None else None
                pos, idx = 0, 0
                while b and pos < len(b) and idx < max_frames:
                    # in-place header parse at offset pos — no tail copy
                    hdr = _ppm_header(b, pos)
                    if hdr is None or hdr[2] != 255:
                        break
                    w, h, _maxval, off = hdr
                    ch = 3 if b[pos:pos + 2] == b"P6" else 1
                    need = w * h * ch
                    if w <= 0 or h <= 0 or len(b) - pos - off < need:
                        break
                    px = np.frombuffer(
                        b, dtype="u1", count=need, offset=pos + off
                    ).reshape(h, w, ch)
                    g = px.astype("i8").sum(axis=2)
                    if ch == 1:
                        g = g * 3
                    rows.append((mid, idx, int(w), int(h),
                                 *_ahash_bands(g, grid=grid)))
                    pos += off + need
                    idx += 1
            yield pd.DataFrame(rows, columns=[
                f.name for f in VIDEO_HASH_SCHEMA])

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(
        run, schema=VIDEO_HASH_SCHEMA)


def video_dup_pairs(
    frame_hashes: DataFrame,
    min_frames: int = 2,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate video pairs: clips sharing ≥ ``min_frames``
    frame positions whose aHashes match EXACTLY — temporal alignment
    plus the aHash's brightness/resolution invariance per frame, the
    cheap-and-standard video dedup first pass.  A clip trimmed or
    shifted by even one frame escapes this operator BY CONTRACT — run
    ``video_dup_pairs_aligned`` (below) for temporal-offset-tolerant
    matching; this position-exact pass stays the cheaper first filter.

    Scale shape: one equi-join on the (frame_idx, h0..h3) key —
    blocked by the full 64-bit hash + position, never all-pairs —
    then one (a, b) count.  Returns (id_a, id_b, n_frames_matched),
    id_a < id_b."""
    keys = frame_hashes.filter(F.col("h0").isNotNull()).select(
        id_col, "frame_idx", "h0", "h1", "h2", "h3").distinct()
    a = keys.select(F.col(id_col).alias("id_a"), "frame_idx",
                    "h0", "h1", "h2", "h3")
    b = keys.select(F.col(id_col).alias("id_b"), "frame_idx",
                    "h0", "h1", "h2", "h3")
    return (
        a.join(b, ["frame_idx", "h0", "h1", "h2", "h3"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= min_frames)
    )


def video_dup_pairs_aligned(
    frame_hashes: DataFrame,
    min_frames: int = 2,
    max_ids_per_hash: Optional[int] = None,
    id_col: str = "media_id",
) -> DataFrame:
    """Temporal-offset-TOLERANT video near-duplicate pairs — the
    alignment leg ``video_dup_pairs`` lacks (its docstring named this
    route; r9 verdict item 3): clips sharing ≥ ``min_frames`` frames
    whose aHashes match at ONE CONSISTENT temporal offset, so a clip
    trimmed or shifted by any number of frames still pairs with its
    source.  This is the audio tier's landmark machinery re-keyed
    (audio_dup_pairs groups matched constellation keys by their
    dt-bucket; here matched frame hashes group by their position
    delta): a 64-bit-hash equi-join proposes (frame of A, frame of B)
    candidates, Δ = pos_b − pos_a is the implied alignment, and a
    per-(pair, Δ) count ≥ min_frames confirms a consistent overlap —
    random single-frame hash collisions scatter across offsets and
    never accumulate.

    ``max_ids_per_hash`` drops frame hashes appearing in more than
    that many clips BEFORE the pair join (title cards, black frames —
    the boilerplate of video): at corpus scale a common frame is
    evidence of nothing and would otherwise fan out quadratically
    inside its hash block.  None (default) keeps every hash — exact
    small-corpus behavior; production sets a cap so per-hash work is
    bounded by cap².

    Scale shape: one equi-join on the full 64-bit hash (never
    all-pairs; the position is deliberately NOT in the key), one
    (pair, Δ) count, one per-pair window for the best alignment.
    Returns (id_a, id_b, offset, n_frames_matched) with id_a < id_b —
    one row per pair at its best offset (ties: higher count, then
    smaller offset)."""
    keys = frame_hashes.filter(F.col("h0").isNotNull()).select(
        id_col, "frame_idx", "h0", "h1", "h2", "h3").distinct()
    if max_ids_per_hash is not None:
        common = (
            keys.groupBy("h0", "h1", "h2", "h3")
            .agg(F.countDistinct(id_col).alias("_n_ids"))
            .filter(F.col("_n_ids") > max_ids_per_hash)
            .select("h0", "h1", "h2", "h3")
        )
        keys = keys.join(common, ["h0", "h1", "h2", "h3"], "left_anti")
    a = keys.select(F.col(id_col).alias("id_a"),
                    F.col("frame_idx").alias("pos_a"),
                    "h0", "h1", "h2", "h3")
    b = keys.select(F.col(id_col).alias("id_b"),
                    F.col("frame_idx").alias("pos_b"),
                    "h0", "h1", "h2", "h3")
    by_offset = (
        a.join(b, ["h0", "h1", "h2", "h3"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b",
            (F.col("pos_b") - F.col("pos_a")).cast("int").alias("offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= min_frames)
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("n_frames_matched").desc(), F.col("offset"))
    return (
        by_offset.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id_a", "id_b", "offset", "n_frames_matched")
    )
