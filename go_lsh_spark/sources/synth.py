"""Deterministic synthetic clips corpus (audio + transcript pairs).

Schema per BASELINE.json input_hint:
  clips(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
        transcript string)

Construction (all seeded, no external data):
  * 5 amplitude-envelope families lifted from the reference's realistic
    benchmark shapes -- spike / risingstep / loweringstep / triangle / dip
    (/root/reference/lsh/lsh_test.go:634-667) -- used as envelopes over a
    sine carrier and rendered to 16-bit PCM WAV.
  * clips come in near-duplicate groups: one base rendering per group;
    members differ by gain (x0.7..1.3) and additive noise at ~-40 dB. The
    log-RMS envelope features (functions/audio.py) shift by a constant under
    gain, so in-group Pearson stays ~1 while cross-family corr is low.
  * transcripts: per-group token sentences; in-group members share the
    sentence verbatim or with a few token edits (high shingle overlap);
    dedicated "substring pairs" across groups share only one long common
    token run (exercises the suffix-array path).
  * ground truth (group_id, family) is returned in a separate frame for
    recall checks -- it is NOT part of the input schema.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from go_lsh_spark.functions.audio import CODEC_WAV, encode_wav

FAMILIES = ("spike", "risingstep", "loweringstep", "triangle", "dip")

# bump on ANY change to the synthesis kernel (envelopes, vocab, noise model,
# group structure, encoding): cached bench corpora key on this + the seed so
# a kernel change can never silently reuse a stale on-disk corpus
SYNTH_VERSION = 3

def _make_vocab(n: int = 2000, seed: int = 1234) -> list[str]:
    """Deterministic pseudo-word vocabulary. Large enough that two random
    sentences share almost no character shingles (a 36-word vocab would make
    every transcript a near-dup of every other)."""
    rng = np.random.default_rng(seed)
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    words = set()
    while len(words) < n:
        n_syll = int(rng.integers(2, 5))
        w = "".join(
            consonants[int(rng.integers(0, len(consonants)))]
            + vowels[int(rng.integers(0, len(vowels)))]
            for _ in range(n_syll)
        )
        words.add(w)
    return sorted(words)


_WORDS = _make_vocab()


def family_envelope(name: str, length: int = 60) -> np.ndarray:
    """The five benchmark shapes (lsh_test.go:634-667), re-derived."""
    v = np.zeros(length)
    h, q = length // 2, length // 4
    if name == "spike":
        v[h] = 1.0
    elif name == "risingstep":
        v[h:] = 1.0
    elif name == "loweringstep":
        v[h:] = -1.0
    elif name == "triangle":
        v[q:h] = np.arange(h - q, dtype=float)
        v[h : 3 * q] = -np.arange(q, dtype=float) + 1.0
    elif name == "dip":
        v[q:h] = -np.arange(h - q, dtype=float)
        v[h : 3 * q] = np.arange(q, dtype=float) - 1.0
    else:
        raise ValueError(name)
    return v


def _render_pcm(envelope: np.ndarray, sr_hz: int, dur_ms: int, carrier_hz: float,
                rng: np.random.Generator) -> np.ndarray:
    """Envelope (arbitrary scale) -> amplitude-modulated sine carrier.
    A 0.15 amplitude floor keeps every frame's RMS well above the noise
    floor so log-features stay stable under perturbation."""
    n = int(sr_hz * dur_ms / 1000)
    env = np.interp(
        np.linspace(0, len(envelope) - 1, n), np.arange(len(envelope)), envelope
    )
    lo, hi = env.min(), env.max()
    env01 = (env - lo) / (hi - lo) if hi > lo else np.ones_like(env)
    amp = 0.15 + 0.65 * env01
    t = np.arange(n) / sr_hz
    phase = rng.uniform(0, 2 * np.pi)
    return amp * np.sin(2 * np.pi * carrier_hz * t + phase)


def _sentence(rng: np.random.Generator, n_tokens: int) -> list[str]:
    return [_WORDS[i] for i in rng.integers(0, len(_WORDS), n_tokens)]


def _perturb_tokens(tokens: list[str], rng: np.random.Generator, n_edits: int) -> list[str]:
    out = list(tokens)
    for _ in range(n_edits):
        pos = int(rng.integers(0, len(out)))
        out[pos] = _WORDS[int(rng.integers(0, len(_WORDS)))]
    return out


@dataclass
class SynthResult:
    clips: pd.DataFrame       # the input_hint schema
    truth: pd.DataFrame       # clip_id, group_id, family (ground truth)
    substring_pairs: pd.DataFrame  # clip_id_a, clip_id_b sharing a long token run


def synth_clips(
    n_clips: int = 200,
    seed: int = 42,
    mean_group_size: float = 3.0,
    sr_choices: tuple[int, ...] = (8000, 16000),
    dur_range_ms: tuple[int, int] = (500, 2000),
    n_substring_pairs: int = 4,
    transcript_tokens: int = 40,
) -> SynthResult:
    rng = np.random.default_rng(seed)
    rows, truth_rows = [], []
    group_id = 0
    made = 0
    group_tokens: dict[int, list[str]] = {}
    while made < n_clips:
        fam = FAMILIES[group_id % len(FAMILIES)]
        size = min(1 + rng.geometric(1.0 / mean_group_size), n_clips - made)
        sr = int(sr_choices[int(rng.integers(0, len(sr_choices)))])
        dur = int(rng.integers(dur_range_ms[0], dur_range_ms[1] + 1))
        carrier = float(rng.uniform(200.0, 800.0))
        # per-group envelope: half family shape, half group-random -- the
        # log-RMS feature is carrier/phase-invariant, so without the random
        # component every same-family clip would be a legitimate near-dup
        # across groups (cf. the reference's realistic benchmark where all
        # 20k family members match one query, lsh_test.go:697-699)
        fam_env = family_envelope(fam)
        lo, hi = fam_env.min(), fam_env.max()
        fam01 = (fam_env - lo) / (hi - lo) if hi > lo else np.ones_like(fam_env)
        # 1:3 family:random -- the step/spike family shapes have ~3x the
        # variance of U(0,1), so equal weights still leave same-family
        # cross-group Pearson ~0.9 after the log-RMS transform
        group_env = 0.25 * fam01 + 0.75 * rng.uniform(0.0, 1.0, size=len(fam_env))
        base = _render_pcm(group_env, sr, dur, carrier, rng)
        tokens = _sentence(rng, transcript_tokens)
        group_tokens[group_id] = tokens
        for m in range(size):
            gain = 1.0 if m == 0 else float(rng.uniform(0.7, 1.3))
            noise = rng.normal(scale=0.003, size=len(base)) if m > 0 else 0.0
            pcm = np.clip(base * gain + noise, -1.0, 1.0)
            tr_tokens = tokens if m == 0 else _perturb_tokens(tokens, rng, int(rng.integers(0, 3)))
            clip_id = f"clip_{made:06d}"
            rows.append(
                {
                    "clip_id": clip_id,
                    "bytes": encode_wav(pcm, sr),
                    "sr_hz": sr,
                    "dur_ms": dur,
                    "codec": CODEC_WAV,
                    "transcript": " ".join(tr_tokens),
                }
            )
            truth_rows.append({"clip_id": clip_id, "group_id": group_id, "family": fam})
            made += 1
        group_id += 1

    clips = pd.DataFrame(rows)
    truth = pd.DataFrame(truth_rows)

    # substring pairs: splice one group's token run into another group's
    # transcript (long common substring, low overall shingle overlap)
    sub_rows = []
    gids = sorted(group_tokens)
    run_len = max(12, transcript_tokens // 3)
    for i in range(min(n_substring_pairs, len(gids) // 2)):
        ga, gb = gids[2 * i], gids[2 * i + 1]
        a_first = truth[truth.group_id == ga].clip_id.iloc[0]
        b_first = truth[truth.group_id == gb].clip_id.iloc[0]
        run = group_tokens[ga][:run_len]
        b_tokens = list(group_tokens[gb])
        b_tokens[-run_len:] = run
        clips.loc[clips.clip_id == b_first, "transcript"] = " ".join(b_tokens)
        sub_rows.append({"clip_id_a": a_first, "clip_id_b": b_first})
    substring_pairs = pd.DataFrame(sub_rows, columns=["clip_id_a", "clip_id_b"])
    return SynthResult(clips=clips, truth=truth, substring_pairs=substring_pairs)


def synth_clips_distributed(
    spark,
    n_clips: int,
    seed: int = 42,
    mean_group_size: float = 3.0,
    sr_choices: tuple[int, ...] = (8000, 16000),
    dur_range_ms: tuple[int, int] = (2000, 8000),
    transcript_tokens: int = 40,
    partitions: int | None = None,
):
    """Executor-side corpus synthesis for bench scale: the driver builds a
    small spec table (ids, group assignments, per-clip seeds, transcripts --
    a few MB at 100k clips) and WAV rendering happens in mapInPandas on the
    workers. Deterministic: every random quantity derives from (seed,
    clip index) via independent PCG streams, so the corpus is identical at
    any parallelism. Returns (clips_df, truth_df).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    rng = np.random.default_rng(seed)
    specs = []
    group_id, made = 0, 0
    while made < n_clips:
        fam = FAMILIES[group_id % len(FAMILIES)]
        size = min(1 + rng.geometric(1.0 / mean_group_size), n_clips - made)
        sr = int(sr_choices[int(rng.integers(0, len(sr_choices)))])
        dur = int(rng.integers(dur_range_ms[0], dur_range_ms[1] + 1))
        carrier = float(rng.uniform(200.0, 800.0))
        env_seed = int(rng.integers(0, 2**31))
        tokens = _sentence(rng, transcript_tokens)
        for m in range(size):
            gain = 1.0 if m == 0 else float(rng.uniform(0.7, 1.3))
            tr = tokens if m == 0 else _perturb_tokens(tokens, rng, int(rng.integers(0, 3)))
            specs.append(
                {
                    "clip_id": f"clip_{made:06d}",
                    "group_id": group_id,
                    "family": fam,
                    "sr_hz": sr,
                    "dur_ms": dur,
                    "carrier": carrier,
                    "env_seed": env_seed,
                    "member": m,
                    "gain": gain,
                    "noise_seed": int(rng.integers(0, 2**31)),
                    "transcript": " ".join(tr),
                }
            )
            made += 1
        group_id += 1
    spec_pdf = pd.DataFrame(specs)
    # partition count matters beyond CPU: the JVM->Python Arrow stream of
    # the binary column is kernel-pipe-bound PER TASK (~10-20MB/s each), so
    # big-binary UDF stages need many concurrent streams, not just many
    # cores (measured: 60k clips x ~120KB, 64 partitions -> 56s crossing;
    # 256 partitions -> 15s)
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism * 2, 8)
    spec_df = spark.createDataFrame(spec_pdf).repartition(partitions, "clip_id")

    def render(batches):
        for pdf in batches:
            out = []
            for cid, fam, env_seed, sr, dur, carrier, member, gain, noise_seed, tr in zip(
                pdf["clip_id"], pdf["family"], pdf["env_seed"], pdf["sr_hz"],
                pdf["dur_ms"], pdf["carrier"], pdf["member"], pdf["gain"],
                pdf["noise_seed"], pdf["transcript"],
            ):
                erng = np.random.default_rng(int(env_seed))
                fam_env = family_envelope(fam)
                lo, hi = fam_env.min(), fam_env.max()
                fam01 = (fam_env - lo) / (hi - lo) if hi > lo else np.ones_like(fam_env)
                env = 0.25 * fam01 + 0.75 * erng.uniform(0.0, 1.0, size=len(fam_env))
                base = _render_pcm(env, int(sr), int(dur), float(carrier), erng)
                if int(member) > 0:
                    nrng = np.random.default_rng(int(noise_seed))
                    pcm = np.clip(
                        base * float(gain) + nrng.normal(scale=0.003, size=len(base)),
                        -1.0, 1.0,
                    )
                else:
                    pcm = base
                out.append(
                    {
                        "clip_id": cid,
                        "bytes": encode_wav(pcm, int(sr)),
                        "sr_hz": int(sr),
                        "dur_ms": int(dur),
                        "codec": CODEC_WAV,
                        "transcript": tr,
                    }
                )
            yield pd.DataFrame(out)

    clips = spec_df.mapInPandas(
        render,
        schema=(
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string"
        ),
    )
    truth = spec_df.select("clip_id", "group_id", "family")
    return clips, truth


def clips_to_spark(spark, result: SynthResult):
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string"
    )
    df = spark.createDataFrame(result.clips, schema=schema)
    truth = spark.createDataFrame(result.truth)
    return df, truth
