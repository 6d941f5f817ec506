"""Regenerate the sql_audio_signatures VALUES golden (entry_queries.py).

The golden is computed by the INDEPENDENT numpy reference path -- decode ->
envelope features -> centered/normalized sign-hash against the seeded
PlaneSet -- not by the Spark engine, so the driver's DuckDB cross-check is a
genuine independent verification. Rerun this and paste the output whenever
the seeded corpus, the feature kernel, or the dedup config defaults change.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_lsh_spark.config import DedupConfig  # noqa: E402
from go_lsh_spark.functions.audio import decode_wav, envelope_features  # noqa: E402
from go_lsh_spark.hyperplanes import PlaneSet  # noqa: E402
from go_lsh_spark.sources.synth import synth_clips  # noqa: E402


def main() -> None:
    cfg = DedupConfig()
    planes = PlaneSet(cfg.lsh_config())
    res = synth_clips(n_clips=40, seed=42)
    total_bits = cfg.num_bands * cfg.rows_per_band
    weights = 1 << np.arange(63, 63 - total_bits, -1, dtype=np.uint64)
    rows = []
    for _, r in res.clips.iterrows():
        pcm, _ = decode_wav(r["bytes"])
        f = envelope_features(pcm, cfg.feature_dim)
        m = f.copy()
        if cfg.center_features:
            m -= m.mean()
        n = np.linalg.norm(m)
        if n != 0:
            m = m / n
        bits = (m @ planes.stacked.T) > 0.0
        sig = int((bits.astype(np.uint64) * weights).sum().astype(np.int64))
        rows.append((r["clip_id"], sig))
    rows.sort()
    print(",\n".join(f"      ('{cid}', CAST({sig} AS BIGINT))" for cid, sig in rows))


if __name__ == "__main__":
    main()
