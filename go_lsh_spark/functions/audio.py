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


def _mulaw_decode_table() -> np.ndarray:
    """G.711 mu-law: 256-entry int16 expansion table (ITU-T G.711, the
    canonical bias-33 segment/mantissa form)."""
    codes = np.arange(256, dtype=np.uint8) ^ 0xFF  # transmitted inverted
    sign = np.where(codes & 0x80, -1, 1)
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    magnitude = ((2 * mantissa.astype(np.int32) + 33) << exponent) - 33
    return (sign * magnitude * 4).astype(np.int16)  # 14-bit -> 16-bit range


def _alaw_decode_table() -> np.ndarray:
    """G.711 A-law: 256-entry int16 expansion table (even-bit inversion,
    segment 0 linear)."""
    codes = np.arange(256, dtype=np.uint8) ^ 0x55
    sign = np.where(codes & 0x80, -1, 1)
    exponent = (codes >> 4) & 0x07
    mantissa = (codes & 0x0F).astype(np.int32)
    magnitude = np.where(
        exponent == 0,
        (mantissa << 1) + 1,
        ((mantissa << 1) + 33) << (exponent - 1),
    )
    return (sign * magnitude * 8).astype(np.int16)  # 13-bit -> 16-bit range


_MULAW_TABLE = _mulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_ALAW = 6
_WAVE_FORMAT_MULAW = 7


def decode_wav(raw) -> tuple[np.ndarray, int]:
    """WAV bytes (any buffer-protocol object: bytes, memoryview) ->
    (float64 PCM in [-1,1], sr_hz). Walks RIFF chunks via unpack_from /
    frombuffer offsets -- zero-copy until the final float conversion, so
    Arrow value buffers can be sliced without materializing Python bytes.

    Containers decoded: mono pcm_s16le (fmt 1, 16-bit) and the two G.711
    telephony codecs (fmt 6 A-law / fmt 7 mu-law, 8-bit) via vectorized
    256-entry expansion tables."""
    mv = memoryview(raw)
    if bytes(mv[:4]) != b"RIFF" or bytes(mv[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, fmt, data_off, data_len = 12, None, None, None, 0
    n = len(mv)
    while pos + 8 <= n:
        cid = bytes(mv[pos : pos + 4])
        (size,) = struct.unpack_from("<I", mv, pos + 4)
        if cid == b"fmt ":
            fmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", mv, pos + 8)
            if fmt == _WAVE_FORMAT_PCM and (ch, bits) != (1, 16):
                raise ValueError("only mono 16-bit PCM supported")
            if fmt in (_WAVE_FORMAT_ALAW, _WAVE_FORMAT_MULAW) and (ch, bits) != (1, 8):
                raise ValueError("G.711 WAV must be mono 8-bit")
            if fmt not in (_WAVE_FORMAT_PCM, _WAVE_FORMAT_ALAW, _WAVE_FORMAT_MULAW):
                raise ValueError(f"unsupported WAV format tag {fmt}")
        elif cid == b"data":
            data_off, data_len = pos + 8, size
        pos += 8 + size + (size & 1)
    if sr is None or data_off is None:
        raise ValueError("missing fmt/data chunk")
    if fmt == _WAVE_FORMAT_PCM:
        pcm = np.frombuffer(mv, dtype="<i2", count=data_len // 2, offset=data_off)
    else:
        table = _ALAW_TABLE if fmt == _WAVE_FORMAT_ALAW else _MULAW_TABLE
        codes = np.frombuffer(mv, dtype=np.uint8, count=data_len, offset=data_off)
        pcm = table[codes]
    return pcm.astype(np.float64) / 32767.0, sr


def encode_wav_g711(pcm: np.ndarray, sr_hz: int, law: str = "mulaw") -> bytes:
    """float PCM in [-1,1] -> G.711 mu-law/A-law WAV (fmt tag 7/6, 8-bit).
    Encoding picks the nearest decode-table codeword (a correct quantizer;
    bit-exactness with the ITU segment encoder is not required -- the DECODE
    side is the spec-faithful path the pipeline exercises)."""
    table = _MULAW_TABLE if law == "mulaw" else _ALAW_TABLE
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int32)
    x = np.clip(np.round(np.asarray(pcm) * 32767.0), -32768, 32767).astype(np.int32)
    idx = np.searchsorted(sorted_vals, x).clip(1, 255)
    left, right = sorted_vals[idx - 1], sorted_vals[idx]
    code_idx = np.where((x - left) <= (right - x), idx - 1, idx)
    data = order[code_idx].astype(np.uint8).tobytes()
    fmt_tag = _WAVE_FORMAT_MULAW if law == "mulaw" else _WAVE_FORMAT_ALAW
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, 1, sr_hz, sr_hz, 1, 8)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


CODEC_MULAW = "pcm_mulaw_wav"
CODEC_ALAW = "pcm_alaw_wav"
_WAV_CODECS = {CODEC_WAV, CODEC_MULAW, CODEC_ALAW}


def decode_clip(raw: bytes, codec: str) -> np.ndarray:
    if codec in _WAV_CODECS:
        # the RIFF fmt tag is self-describing; one decoder covers pcm_s16le
        # and both G.711 laws
        return decode_wav(raw)[0]
    # STUB: real deployments plug ffmpeg/soundfile here; this sandbox has no
    # audio codec libraries, so compressed codecs are explicitly unimplemented.
    raise NotImplementedError(
        f"codec {codec!r}: only {sorted(_WAV_CODECS)} are decodable here"
    )


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
