"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
partition-friendly mapInPandas feature extraction — is real and tested.

Decode support is two-tier:
  - **PPM (P6) images decode for real** — the format is raw RGB behind a
    text header, so a pure-numpy decoder needs no codec libraries
    (:func:`decode_image`, :func:`image_features`). Corrupt/foreign
    payloads yield null features instead of failing the job — at crawl
    scale corrupt images are routine, and one bad row must not kill a
    100 TB stage.
  - Compressed formats (JPEG/PNG/audio/video) remain STUBBED behind
    ``decode_stub`` (codec libraries are not in this container), which
    raises NotImplementedError unless ``fake=True`` (deterministic fake
    decode keeping the downstream pipeline testable).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BINARY_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha1_prefix", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_stub(payload: bytes, modality: str = "image", fake: bool = False) -> np.ndarray:
    """Decode an opaque payload. STUB — no codec libs in this container.

    With ``fake=True`` returns a deterministic pseudo-decode (bytes folded
    into a fixed-shape float array) so batch shape / partitioning / UDF
    signature are exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            f"{modality} decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test decode."
        )
    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) array -> binary PPM (P6). Test/synthesis helper."""
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Pure-numpy image decode. Supports PPM P6 (8-bit RGB) — raw pixels
    behind a text header, so no codec library is required. Returns a
    uint8 array of shape (h, w, 3). Other/corrupt payloads raise
    (ValueError for malformed PPM, NotImplementedError for foreign
    formats) — callers in the batch path map failures to null features."""
    if not payload or payload[:2] != b"P6":
        raise NotImplementedError(
            "only PPM (P6) decodes without codec libraries; got "
            f"magic {payload[:2]!r}"
        )
    # header: P6 <w> <h> <maxval>, tokens separated by whitespace, with
    # optional '#' comment lines; pixel data starts after ONE whitespace
    # byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval {maxval})")
    need = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    if data.size < need:
        raise ValueError("truncated PPM pixel data")
    return data.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure indexing, any ratio)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[yi][:, xi]


def image_feature_vector(img: np.ndarray, hist_bins: int = 8) -> np.ndarray:
    """Per-channel means + luma histogram (normalized), float32."""
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    luma = img.reshape(-1, 3).astype(np.float32) @ np.array(
        [0.299, 0.587, 0.114], dtype=np.float32
    )
    hist, _ = np.histogram(luma, bins=hist_bins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(luma.size, 1)
    return np.concatenate([means.astype(np.float32), hist])


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decode_error", StringType()),
    ]
)


def image_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    hist_bins: int = 8,
    resize_to: tuple[int, int] | None = None,
) -> DataFrame:
    """Real decode -> (optional resize) -> feature extraction for PPM
    payloads over mapInPandas. Undecodable payloads produce
    (null features, decode_error message) rows — never a failed task."""

    def extract(batches):
        for pdf in batches:
            ids, ws, hs, feats, errs = [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                ids.append(int(i))
                try:
                    img = decode_image(bytes(b) if b is not None else b"")
                    if resize_to is not None:
                        img = resize_nearest(img, *resize_to)
                    ws.append(img.shape[1])
                    hs.append(img.shape[0])
                    feats.append(image_feature_vector(img, hist_bins).tolist())
                    errs.append(None)
                except (NotImplementedError, ValueError) as e:
                    ws.append(0)
                    hs.append(0)
                    feats.append(None)
                    errs.append(str(e)[:120])
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "features": feats, "decode_error": errs}
            )

    return df.select(id_col, bin_col).mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column via mapInPandas
    (Arrow-batched; the pattern a real decode stage would use)."""

    def extract(batches):
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "sha1_prefix": payloads.map(
                        lambda b: hashlib.sha1(bytes(b or b"")).hexdigest()[:8]
                    ),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, BINARY_META_SCHEMA)


def extract_features(df: DataFrame, id_col: str, bin_col: str, modality: str = "image") -> DataFrame:
    """Feature extraction over opaque payloads (deterministic fake decode)."""

    def extract(batches):
        for pdf in batches:
            feats = [
                decode_stub(bytes(b) if b is not None else b"", modality, fake=True).tolist()
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "features": feats,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, FEATURE_SCHEMA)


def encode_video_raw(frames: np.ndarray) -> bytes:
    """uint8 (t, h, w, 3) array -> RVF raw-video container. Test/synthesis
    helper, mirroring :func:`encode_ppm`: a text header ``RV\\n<w> <h>
    <t>\\n`` followed by t*h*w*3 raw RGB bytes — the format decodes with
    pure numpy, so the frame-sampling pipeline is REAL end-to-end in this
    codec-less container (compressed video stays behind decode_stub)."""
    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[3] == 3
    t, h, w = frames.shape[:3]
    return b"RV\n%d %d %d\n" % (w, h, t) + frames.tobytes()


def decode_video_raw(payload: bytes) -> np.ndarray:
    """Pure-numpy raw-video decode (RVF, see :func:`encode_video_raw`).
    Returns uint8 (t, h, w, 3). Corrupt/foreign payloads raise — the
    batch path maps failures to null-frame rows, never a failed task."""
    if not payload or payload[:2] != b"RV":
        raise NotImplementedError(
            "only RVF raw video decodes without codec libraries; got "
            f"magic {payload[:2]!r}"
        )
    end = payload.index(b"\n", 3)
    w, h, t = (int(x) for x in payload[3:end].split())
    need = t * h * w * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=end + 1)
    if data.size < need:
        raise ValueError("truncated RVF frame data")
    return data.reshape(t, h, w, 3)


def sample_frame_indices(n_total: int, k: int) -> list[int]:
    """Uniformly spaced frame indices: ``floor(j*(T-1)/(k-1))`` for
    ``j in 0..k-1`` (k=1 -> the middle frame), deduplicated ascending —
    the standard video-sampling rule (first and last frame always
    included for k >= 2). Pure integer arithmetic, replayable in SQL."""
    if n_total <= 0:
        return []
    if k <= 1:
        return [(n_total - 1) // 2]
    return sorted({j * (n_total - 1) // (k - 1) for j in range(k)})


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_frames_total", LongType()),
        StructField("frame_idx", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("decode_error", StringType()),
    ]
)


def frame_sample(df: DataFrame, id_col: str, bin_col: str, k: int = 3) -> DataFrame:
    """Temporal frame sampling over opaque video payloads: decode, pick
    ``k`` uniformly spaced frames (:func:`sample_frame_indices`), emit one
    row per sampled frame with exact per-channel integer sums — the
    "frame-sample then featurize" stage of a multimodal training-data
    pipeline, as real decode for RVF payloads and a clear decode_error row
    for anything else.

    Scale design: mapInPandas over Arrow batches — videos stay opaque
    bytes until inside the worker, one Python pass per batch, output
    fan-out is k rows per input row (bounded, no shuffle). Exact integer
    channel sums (not float means) keep the whole stage replayable by the
    DuckDB oracle."""
    if k < 1:
        raise ValueError(f"frame_sample: k must be >= 1, got {k}")

    def extract(batches):
        for pdf in batches:
            rows = {f: [] for f in (
                "id", "n_frames_total", "frame_idx", "sum_r", "sum_g", "sum_b",
                "decode_error")}
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                try:
                    vid = decode_video_raw(bytes(b) if b is not None else b"")
                except (NotImplementedError, ValueError) as e:
                    rows["id"].append(int(i))
                    rows["n_frames_total"].append(None)
                    rows["frame_idx"].append(None)
                    for c in ("sum_r", "sum_g", "sum_b"):
                        rows[c].append(None)
                    rows["decode_error"].append(str(e)[:120])
                    continue
                t = vid.shape[0]
                for fi in sample_frame_indices(t, k):
                    sums = vid[fi].reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    rows["id"].append(int(i))
                    rows["n_frames_total"].append(t)
                    rows["frame_idx"].append(fi)
                    rows["sum_r"].append(int(sums[0]))
                    rows["sum_g"].append(int(sums[1]))
                    rows["sum_b"].append(int(sums[2]))
                    rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(extract, FRAME_SAMPLE_SCHEMA)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> minimal RIFF/WAVE PCM16 file. Test/synthesis
    helper completing the uncompressed-modality triad (PPM image, RVF
    video, WAV audio): canonical 44-byte header + little-endian PCM."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    import struct

    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return hdr + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy WAV decode (PCM16 mono). Walks RIFF chunks, so files
    with extra chunks (LIST, fact) parse too. Returns (samples, rate);
    compressed/float/multichannel WAV raises — batch paths map failures
    to decode_error rows."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"only RIFF/WAVE decodes without codec libraries; got {payload[:4]!r}"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"truncated fmt chunk ({len(body)} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 mono supported (format={audio_format}, "
            f"channels={channels}, bits={bits})"
        )
    return np.frombuffer(data, dtype="<i2"), rate


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("sum_abs", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("decode_error", StringType()),
    ]
)


def audio_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Real audio decode -> exact stats over mapInPandas: sample count,
    rate, sum of absolute amplitudes, and zero crossings (adjacent-sample
    strict sign products < 0) — the silence/clipping/energy triage a
    speech-data pipeline runs before expensive transcription. Integer
    outputs keep the stage replayable by the DuckDB oracle; undecodable
    payloads yield decode_error rows, never failed tasks."""

    def extract(batches):
        for pdf in batches:
            rows = {f: [] for f in (
                "id", "n_samples", "sample_rate", "sum_abs", "zero_crossings",
                "decode_error")}
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                rows["id"].append(int(i))
                try:
                    s, rate = decode_wav_pcm16(bytes(b) if b is not None else b"")
                except (NotImplementedError, ValueError) as e:
                    for c in ("n_samples", "sample_rate", "sum_abs", "zero_crossings"):
                        rows[c].append(None)
                    rows["decode_error"].append(str(e)[:120])
                    continue
                x = s.astype(np.int64)
                rows["n_samples"].append(int(x.size))
                rows["sample_rate"].append(int(rate))
                rows["sum_abs"].append(int(np.abs(x).sum()))
                rows["zero_crossings"].append(int((x[:-1] * x[1:] < 0).sum()))
                rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(extract, AUDIO_STATS_SCHEMA)
