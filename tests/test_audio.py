"""Audio layer: WAV codec roundtrip, SNR invariant (input_hint: decoded-PCM
allclose with SNR >= 30dB), transcript equality, feature extraction, and the
Spark decode UDF against the numpy path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_lsh_spark.functions.audio import (
    CODEC_WAV,
    decode_clip,
    decode_wav,
    encode_wav,
    envelope_features,
    make_decode_features_udf,
    make_decode_pcm_udf,
    snr_db,
)
from go_lsh_spark.sources.synth import clips_to_spark, family_envelope, synth_clips


def test_wav_roundtrip_snr():
    rng = np.random.default_rng(0)
    pcm = np.clip(rng.normal(scale=0.3, size=16000), -1, 1)
    decoded, sr = decode_wav(encode_wav(pcm, 16000))
    assert sr == 16000
    assert len(decoded) == len(pcm)
    # 16-bit quantization noise ~ 90 dB >> the 30 dB invariant
    assert snr_db(pcm, decoded) >= 30.0


def test_unknown_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_clip(b"\x00" * 64, "opus")


def test_envelope_features_shape_and_determinism():
    pcm = np.sin(np.linspace(0, 100, 8000))
    f1 = envelope_features(pcm, 16)
    f2 = envelope_features(pcm, 16)
    assert f1.shape == (16,)
    np.testing.assert_array_equal(f1, f2)


def test_gain_shifts_log_envelope_by_constant():
    # Pearson invariance of the verification score relies on this
    pcm = 0.2 + 0.3 * np.sin(np.linspace(0, 50, 8000))
    base = envelope_features(pcm, 16)
    gained = envelope_features(pcm * 0.5, 16)
    diffs = gained - base
    assert np.allclose(diffs, diffs[0], atol=1e-3)


def test_family_envelopes_distinct():
    envs = {n: family_envelope(n) for n in ("spike", "risingstep", "loweringstep", "triangle", "dip")}
    for a in envs:
        for b in envs:
            if a != b:
                assert not np.allclose(envs[a], envs[b])


def test_synth_deterministic():
    r1 = synth_clips(n_clips=30, seed=7)
    r2 = synth_clips(n_clips=30, seed=7)
    assert r1.clips.equals(r2.clips)
    assert len(r1.clips) == 30
    assert set(r1.clips.columns) == {"clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"}


def test_decode_udf_matches_numpy_and_snr_invariant(spark):
    res = synth_clips(n_clips=12, seed=3)
    df, _ = clips_to_spark(spark, res)
    pcm_udf = make_decode_pcm_udf()
    rows = (
        df.select("clip_id", "transcript", pcm_udf(F.col("bytes"), F.col("codec")).alias("pcm"))
        .orderBy("clip_id")
        .collect()
    )
    local = {r.clip_id: r for _, r in res.clips.iterrows()}
    for row in rows:
        ref_pcm, _ = decode_wav(local[row.clip_id]["bytes"])
        got = np.array(row.pcm)
        # decoded-PCM allclose invariant: identical decoder => exact match
        np.testing.assert_allclose(got, ref_pcm, atol=1e-12)
        assert snr_db(ref_pcm, got) >= 30.0 or np.array_equal(got, ref_pcm)
        # transcript equality invariant
        assert row.transcript == local[row.clip_id]["transcript"]


def test_feature_udf_matches_numpy(spark):
    res = synth_clips(n_clips=8, seed=5)
    df, _ = clips_to_spark(spark, res)
    feat_udf = make_decode_features_udf(16)
    rows = df.select("clip_id", feat_udf(F.col("bytes"), F.col("codec")).alias("f")).collect()
    local = {r["clip_id"]: r["bytes"] for _, r in res.clips.iterrows()}
    for row in rows:
        expected = envelope_features(decode_wav(local[row.clip_id])[0], 16)
        np.testing.assert_allclose(np.array(row.f), expected, rtol=1e-12)


# -- G.711 mu-law / A-law --------------------------------------------------


def test_g711_tables_match_classic_extremes():
    from go_lsh_spark.functions.audio import _ALAW_TABLE, _MULAW_TABLE

    # canonical G.711 maxima: mu-law 8031 (14-bit), A-law 4032 (13-bit),
    # scaled to 16-bit by the decoder (x4 / x8)
    assert int(np.abs(_MULAW_TABLE.astype(np.int32)).max()) == 8031 * 4
    assert int(np.abs(_ALAW_TABLE.astype(np.int32)).max()) == 4032 * 8
    # mu-law has an exact zero codeword; both tables hit both signs
    assert (_MULAW_TABLE == 0).any()
    assert _MULAW_TABLE.min() < 0 < _MULAW_TABLE.max()
    assert _ALAW_TABLE.min() < 0 < _ALAW_TABLE.max()


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_roundtrip_snr(law):
    from go_lsh_spark.functions.audio import decode_wav, encode_wav_g711, snr_db

    rng = np.random.default_rng(5)
    t = np.arange(8000) / 8000.0
    pcm = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=t.size)
    pcm = np.clip(pcm, -1, 1)
    raw = encode_wav_g711(pcm, 8000, law=law)
    decoded, sr = decode_wav(raw)
    assert sr == 8000 and len(decoded) == len(pcm)
    # G.711 speech-band SNR is well above the input_hint's 30dB invariant
    assert snr_db(pcm, decoded) >= 30.0


def test_g711_clip_through_pipeline_udf(spark):
    """A mu-law clip flows through the fused decode+feature UDF next to
    pcm_s16le clips (the codec column routes per row)."""
    from go_lsh_spark.config import DedupConfig
    from go_lsh_spark.functions.audio import (
        CODEC_MULAW,
        encode_wav_g711,
        envelope_features,
    )
    from go_lsh_spark.hyperplanes import PlaneSet
    from go_lsh_spark.operators.dedup import clips_to_signatures

    cfg = DedupConfig()
    rng = np.random.default_rng(9)
    pcm = np.clip(rng.normal(scale=0.2, size=8000), -1, 1)
    rows = [("mu0", encode_wav_g711(pcm, 8000, "mulaw"), 8000, 1000, CODEC_MULAW, "hello world " * 5)]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    sigs = clips_to_signatures(df, cfg, PlaneSet(cfg.lsh_config())).collect()
    assert len(sigs) == 1
    from go_lsh_spark.functions.audio import decode_wav

    expected = envelope_features(decode_wav(rows[0][1])[0], cfg.feature_dim)
    np.testing.assert_allclose(sigs[0]["features"], expected, rtol=1e-12)
