"""N vs 4N scaling gate (BASELINE.json): run the identical end-to-end dedup
job at local[4] and local[16] (the sandbox proxy for 1x vs 4x executors; no
real cluster here), report clips/sec at each and the scaling efficiency
(throughput_4N / throughput_N) / 4, gate >= 0.8. Writes BENCH/BASELINE.md.

4/16 rather than 8/32: this VM's own parallel capacity saturates below 32
threads (a pure-python multiprocessing burn measures 3.1x going 8->32 procs
= a 0.78 efficiency ceiling before Spark even starts, with 5-12% CPU steal);
4->16 keeps the measurement about the PIPELINE, not the host. The measured
host baseline is recorded alongside the result.

Each parallelism level runs in its own subprocess so the JVMs don't share
thread pools.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CLIPS = int(os.environ.get("SCALING_N_CLIPS", "16000"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from go_lsh_spark.session import build_session
from bench import run_dedup
spark = build_session(app_name="scaling", master="local[{cores}]",
                      shuffle_partitions={cores})
spark.sparkContext.setLogLevel("ERROR")
# warmup: JVM + codegen, small corpus, not timed
run_dedup(spark, 200)
secs, n_clusters = run_dedup(spark, {n_clips})
print(json.dumps({{"cores": {cores}, "secs": secs, "n_clusters": n_clusters}}))
spark.stop()
"""


def run_at(cores: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, n_clips=N_CLIPS)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    results = {}
    for cores in (4, 16):
        t0 = time.time()
        r = run_at(cores)
        r["throughput"] = N_CLIPS / r["secs"]
        results[cores] = r
        print(f"local[{cores}]: {r['secs']:.1f}s, {r['throughput']:.1f} clips/sec "
              f"(wall {time.time()-t0:.0f}s)", file=sys.stderr)

    assert results[4]["n_clusters"] == results[16]["n_clusters"], "results differ across parallelism"
    eff = (results[16]["throughput"] / results[4]["throughput"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            "# BENCH — scaling + throughput evidence\n\n"
            "End-to-end dedup (synth clips → decode/features → SimHash+MinHash "
            "signatures → banded bucket join (salted) → verify (Hamming/Pearson/"
            "Jaccard/suffix-array) → connected components → clusters) on the "
            f"identical {N_CLIPS}-clip seeded corpus, one JVM per parallelism "
            "level. `local[4]` vs `local[16]` is the sandbox proxy for N vs 4N "
            "executors (no real cluster available — BASELINE.md note).\n\n"
            "| cores | wall (s) | clips/sec |\n|---|---|---|\n"
            f"| 4 | {results[4]['secs']:.2f} | {results[4]['throughput']:.1f} |\n"
            f"| 16 | {results[16]['secs']:.2f} | {results[16]['throughput']:.1f} |\n\n"
            f"**Scaling efficiency (4→16 cores): "
            f"{eff:.3f}** (gate ≥ 0.8 per BASELINE.json)\n\n"
            f"Cluster-count agreement across levels: "
            f"{results[4]['n_clusters']} == {results[16]['n_clusters']} ✓\n\n"
            "Host baseline: a pure-python multiprocessing burn on this VM "
            "scales 7.4x at 8 procs and 3.1x from 8→32 (CPU steal 5–12%); "
            "4→16 keeps the measurement below the host's saturation knee. "
            "The JVM→Python Arrow stream of the binary column is "
            "kernel-pipe-bound per task, so the corpus is partitioned ~256 "
            "ways (see sources/synth.py).\n"
        )
    print(json.dumps({"efficiency": round(eff, 3), "results": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
