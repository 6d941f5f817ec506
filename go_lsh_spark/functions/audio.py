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


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 PCM in [-1,1], sr_hz). Walks RIFF chunks; only
    PCM-16 mono is supported."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError("only pcm_s16le mono supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    return pcm, sr


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


def make_clip_signature_udf(planes_stacked: np.ndarray, cfg) -> "object":
    """FUSED per-clip projection: (bytes, codec, transcript) ->
    struct(features array<double>, sig64 long, minhash array<long>,
    winnow array<long>).

    One Arrow crossing computes everything numpy-side:
      * WAV decode + log-RMS envelope (this module)
      * mean-centered L2-normalized SimHash sig64 against the broadcast
        plane matrix (reference bit order, hyperplanes/hyperplanes.go:103-128)
      * MinHash over transcript byte shingles (fasthash splitmix64 family)
      * winnowing fingerprints for the suffix-array candidate path

    Replaces a JVM expression tree that evaluated num_perm transforms per
    row (64 x ~270 tuple-hashes: ~180s for 16k clips -> ~10s fused).
    """
    from pyspark.sql.types import (  # noqa: PLC0415
        LongType,
        StructField,
        StructType,
    )

    from go_lsh_spark.functions import fasthash as FH  # noqa: PLC0415

    # ArrayType/DoubleType are already module-level imports

    dim = cfg.feature_dim
    center = cfg.center_features
    total_bits = cfg.num_bands * cfg.rows_per_band
    weights = 1 << np.arange(63, 63 - total_bits, -1, dtype=np.uint64)
    seeds = FH.perm_seeds(cfg.num_perm, seed=cfg.seed)
    shingle_k = cfg.shingle_k
    winnow_k = cfg.winnow_k
    winnow_w = cfg.winnow_window

    schema = StructType(
        [
            StructField("features", ArrayType(DoubleType())),
            StructField("sig64", LongType()),
            StructField("minhash", ArrayType(LongType())),
            StructField("winnow", ArrayType(LongType())),
        ]
    )

    @F.pandas_udf(schema)
    def clip_signature(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        for raw, codec, transcript in it:
            feats = np.array(
                [
                    envelope_features(decode_clip(r, c), dim)
                    for r, c in zip(raw, codec)
                ]
            )
            m = feats.copy()
            if center:
                m -= m.mean(axis=1, keepdims=True)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            np.divide(m, norms, out=m, where=norms != 0)
            bits = (m @ planes_stacked.T) > 0.0
            sig = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            mins, winns = [], []
            for t in transcript:
                b = (t or "").encode("utf-8")
                mh = FH.shingle_hashes_bytes(b, shingle_k)
                mins.append(FH.minhash_from_hashes(mh, seeds).tolist())
                wh = FH.shingle_hashes_bytes(b, winnow_k)
                winns.append(FH.winnow_from_hashes(wh, winnow_w).tolist())
            yield pd.DataFrame(
                {
                    "features": list(feats.tolist()),
                    "sig64": sig,
                    "minhash": mins,
                    "winnow": winns,
                }
            )

    return clip_signature


def make_decode_pcm_udf():
    """(bytes, codec) -> array<double> raw PCM (test/invariant path only;
    production keeps PCM inside the fused decode+feature UDF above)."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def decode_pcm(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for raw, codec in it:
            yield pd.Series([decode_clip(r, c).tolist() for r, c in zip(raw, codec)])

    return decode_pcm
