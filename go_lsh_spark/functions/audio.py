"""Audio kernels: WAV (pcm_s16le) encode/decode + fixed-dim features.

BASELINE.json input_hint: clips arrive as
(clip_id, bytes BINARY, sr_hz, dur_ms, codec, transcript); the engine must
decode bytes -> PCM with vectorized Arrow UDFs (no per-row Python loops over
samples) and preserve the per-row invariant decoded-PCM allclose vs the
synthesizer (SNR >= 30dB).

Only pcm_s16le in a RIFF/WAVE container is decodable in this sandbox (no
audio libs baked in); other codecs hit a clearly-marked NotImplementedError
stub -- the Spark-side plumbing (schema, batching, UDF signatures) is real
and tested either way.

The feature extractor maps PCM -> a fixed V-dim log-RMS energy envelope:
the "document vector" the LSH layer hashes (the reference's documents are
exactly such fixed-length envelope vectors; its realistic benchmark builds
them from step/spike/triangle shapes, /root/reference/lsh/lsh_test.go:634-667).
Gain changes shift the log-envelope by a constant, which Pearson scoring
(lsh/lsh.go:220) is invariant to -- so near-dups by gain survive
verification by construction.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

CODEC_WAV = "pcm_s16le_wav"
_EPS = 1e-6


# ---------------------------------------------------------------------------
# numpy WAV codec (RIFF canonical form, 16-bit mono PCM)
# ---------------------------------------------------------------------------


def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float PCM in [-1, 1] -> canonical 44-byte-header WAV, 16-bit mono."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    samples = np.round(x * 32767.0).astype("<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def decode_wav(raw) -> tuple[np.ndarray, int]:
    """WAV bytes (any buffer-protocol object: bytes, memoryview) ->
    (float64 PCM in [-1,1], sr_hz). Walks RIFF chunks via unpack_from /
    frombuffer offsets -- zero-copy until the final float conversion, so
    Arrow value buffers can be sliced without materializing Python bytes."""
    mv = memoryview(raw)
    if bytes(mv[:4]) != b"RIFF" or bytes(mv[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, data_off, data_len = 12, None, None, 0
    n = len(mv)
    while pos + 8 <= n:
        cid = bytes(mv[pos : pos + 4])
        (size,) = struct.unpack_from("<I", mv, pos + 4)
        if cid == b"fmt ":
            fmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", mv, pos + 8)
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError("only pcm_s16le mono supported")
        elif cid == b"data":
            data_off, data_len = pos + 8, size
        pos += 8 + size + (size & 1)
    if sr is None or data_off is None:
        raise ValueError("missing fmt/data chunk")
    pcm = np.frombuffer(mv, dtype="<i2", count=data_len // 2, offset=data_off)
    return pcm.astype(np.float64) / 32767.0, sr


def decode_clip(raw: bytes, codec: str) -> np.ndarray:
    if codec == CODEC_WAV:
        return decode_wav(raw)[0]
    # STUB: real deployments plug ffmpeg/soundfile here; this sandbox has no
    # audio codec libraries, so non-WAV codecs are explicitly unimplemented.
    raise NotImplementedError(f"codec {codec!r}: only {CODEC_WAV} is decodable here")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise of decoded vs reference PCM (input_hint invariant:
    >= 30 dB; 16-bit quantization alone yields ~90 dB)."""
    reference = np.asarray(reference, dtype=np.float64)
    decoded = np.asarray(decoded, dtype=np.float64)
    n = min(len(reference), len(decoded))
    sig = float((reference[:n] ** 2).sum())
    noise = float(((reference[:n] - decoded[:n]) ** 2).sum())
    if noise == 0:
        return float("inf")
    return 10.0 * np.log10(sig / noise) if sig > 0 else float("-inf")


def envelope_features(pcm: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim log-RMS energy envelope. Frames of equal length (tail
    zero-padded), rms per frame, log10(rms + eps)."""
    pcm = np.asarray(pcm, dtype=np.float64)
    n = len(pcm)
    frame = max(1, -(-n // dim))  # ceil division
    padded = np.zeros(frame * dim)
    padded[:n] = pcm
    frames = padded.reshape(dim, frame)
    rms = np.sqrt((frames**2).mean(axis=1))
    return np.log10(rms + _EPS)


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-batched)
# ---------------------------------------------------------------------------


def make_decode_features_udf(feature_dim: int):
    """(bytes, codec) -> array<double> feature vector. One UDF crossing does
    decode + envelope so raw PCM never round-trips through Arrow."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def decode_features(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for raw, codec in it:
            out = [
                envelope_features(decode_clip(r, c), feature_dim).tolist()
                for r, c in zip(raw, codec)
            ]
            yield pd.Series(out)

    return decode_features


def make_decode_pcm_udf():
    """(bytes, codec) -> array<double> raw PCM (test/invariant path only;
    production keeps PCM inside the fused decode+feature UDF above)."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def decode_pcm(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for raw, codec in it:
            yield pd.Series([decode_clip(r, c).tolist() for r, c in zip(raw, codec)])

    return decode_pcm
