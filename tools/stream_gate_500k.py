"""Streaming equality at the batch gate's scale (r5 verdict #4): stream the
IDENTICAL 500k-clip corpus the batch scaling gate uses through the
incremental dedup path in ~25 microbatches at local[8], reconcile, and
require the order-independent assignment fingerprint to equal the batch
gate's recorded one (BENCH/BASELINE.md: 500000 rows, 125347 clusters,
checksum -4501336553975086714 across all 8 gate runs).

One level, one rep: the scaling ratios live in scaling_bench --mode stream;
this tool answers only "does the streaming path land on the batch gate's
exact assignment at the gate's scale".

Usage: python tools/stream_gate_500k.py  (env: SCALING_STREAM_BATCHES=25)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SCALING_N_CLIPS", "500000")

from tools import scaling_bench as SB  # noqa: E402

GATE_FP = (500000, 125347, -4501336553975086714)


def main() -> None:
    SB.ensure_corpus()
    n_files = sum(
        1
        for f in os.listdir(SB.CORPUS)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    batches = int(os.environ.get("SCALING_STREAM_BATCHES", "25"))
    max_files = max(n_files // batches, 1)
    cores = int(os.environ.get("SCALING_STREAM_CORES", "8"))
    t0 = time.time()
    r = SB.run_child(
        SB.STREAM_CHILD.format(
            repo=SB.REPO,
            cores=cores,
            corpus=SB.CORPUS,
            max_files=max_files,
            batches=batches,
        )
    )
    fp = (r["n_rows"], r["n_clusters"], r["checksum"])
    assert fp == GATE_FP, f"streaming fingerprint {fp} != batch gate {GATE_FP}"
    out = {
        "mode": "stream-gate-500k",
        "cores": cores,
        "n_batches": r["n_batches"],
        "secs": round(r["secs"], 1),
        "clips_per_sec": round(r["n_rows"] / r["secs"], 1),
        "n_rows": r["n_rows"],
        "n_clusters": r["n_clusters"],
        "checksum": r["checksum"],
        "gate_checksum_match": True,
        "wall_total": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
